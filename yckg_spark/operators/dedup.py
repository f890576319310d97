"""Deduplication operators for large-scale training-data pipelines.

All of these run over a ``documents(doc_id, text, ...)``-shaped table.

  * exact_dedup          — content-hash groupBy (the 100 TB workhorse)
  * minhash_signatures / minhash_lsh_pairs — shingle → minhash → band →
    bucket join; sub-quadratic near-dup at corpus scale
  * simhash / simhash_pairs — bit-vote fingerprint + chunk-banded
    hamming-neighbor pair generation (pigeonhole-lossless for k < chunks)
  * ngram_jaccard_pairs  — exact set-similarity join on shingles (use after
    LSH candidate generation at scale; exact only at small N)
  * embedding_neardup_pairs — cosine near-dup over an embedding column
  * neardup_clusters / dedup_keep_representatives — connected components
    over the pair graph (min-label propagation + pointer jumping) and
    keep-one-per-component selection
  * dedup_keep_best      — keep the highest-scoring member per component
    (quality-aware variant of the min-id representative)
  * incremental_dedup    — exact-dedup a new ingest batch against an
    existing corpus (the continuous-crawl shape)

Everything is pure Column expressions (whole-stage codegen); no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic mixing constants for the minhash permutation family
# h_i(x) = (a_i * x + b_i) mod p  over xxhash64 shingle values.
# p is the 31-bit Mersenne prime so a*x stays < 2^62: no long overflow under
# ANSI arithmetic (Spark 4 default).
_P = (1 << 31) - 1


def _perm_consts(n: int, seed: int = 17) -> list[tuple[int, int]]:
    # simple deterministic LCG so the family is stable across runs/sessions
    out = []
    state = seed
    for _ in range(n):
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        a = state | 1
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        b = state
        out.append((a % (_P - 1) + 1, b % _P))
    return out


def normalize_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts: (text_hash, n_docs, keep_id).

    sha2 groupBy — partial aggregation map-side; at 100 TB this is the
    standard first dedup pass and shuffles only (hash, id) pairs, never the
    text itself.
    """
    return (
        df.select(F.sha2(normalize_text(F.col(text_col)), 256).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles of the normalized text as an array<string>."""
    toks = F.split(normalize_text(col), " ")
    n = F.size(toks)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )).otherwise(F.array(normalize_text(col)))


def word_kgrams(col: Column, k: int) -> Column:
    """Strict word k-grams of the normalized text as an array<string> —
    unlike :func:`shingles` there is NO whole-text fallback: a document
    shorter than ``k`` tokens has an empty gram array. The span-dedup,
    span-stats, and corpus-ngram operators all share this definition so
    their gram universes can never drift apart."""
    toks = F.split(normalize_text(col), " ")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _md5_32(col: Column) -> Column:
    """First 32 bits of md5 as a bigint — slower than xxhash64 but
    recomputable verbatim in external SQL engines (oracle mode)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = 32, k: int = 3, use_md5: bool = False,
) -> DataFrame:
    """(id, sig array<bigint>): min over shingle hashes per permutation.

    Explode-then-aggregate: one shuffle keyed by doc id; each permutation is
    a JVM-side min aggregate (no Python). ``use_md5`` swaps the shingle
    hash for the oracle-recomputable md5 variant.
    """
    sh = df.select(F.col(id_col), F.explode_outer(shingles(F.col(text_col), k)).alias("sh"))
    h = F.pmod(_md5_32(F.col("sh")) if use_md5 else F.xxhash64("sh"), F.lit(_P))
    aggs = [
        F.min(F.pmod(F.lit(a) * h + F.lit(b), F.lit(_P))).alias(f"h{i}")
        for i, (a, b) in enumerate(_perm_consts(n_hashes))
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = 32, bands: int = 8, k: int = 3, threshold: float = 0.5,
    use_md5: bool = False, persisted_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banding + estimated Jaccard filter.

    band hash join keeps the candidate set sub-quadratic; the self-join is
    on (band_idx, band_hash) — a well-distributed key even for boilerplate-
    heavy corpora because the band hash mixes ``rows_per_band`` minhashes.

    ``persisted_out``: the signature frame is persisted (stage cut before
    the self-join); pass a list to receive it and ``unpersist()`` after
    materializing the result — the same convention as ``parse_records``.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, k, use_md5=use_md5)
    # Stage cut before the self-join: without it both join sides re-run the
    # whole shingle-explode + 32-way min aggregation (2x the dominant cost;
    # at corpus scale signatures would be materialized to a table here).
    from pyspark import StorageLevel

    sig = sig.persist(StorageLevel.DISK_ONLY)
    if persisted_out is not None:
        persisted_out.append(sig)

    def band_hash(b: int) -> Column:
        joined = F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band))
        return _md5_32(joined) if use_md5 else F.xxhash64(joined)

    # ids-only through the band self-join: the 32-element sig array must NOT
    # ride the banded explode (it would be replicated `bands`x into the
    # exchange and carried on both join sides). Only (id, band, bh) flows
    # through the join; signatures are joined back exactly once per side
    # after the pair dedup — the same shape as similarity.lsh_topk.
    banded = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    pair_ids = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = pair_ids.join(
        sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(
        sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")), "id_b"
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(len(_perm_consts(n_hashes))))
    )
    return cand.select("id_a", "id_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32,
    use_md5: bool = False,
) -> DataFrame:
    """(id, simhash bigint): per-bit majority vote over token hashes.

    ``use_md5=True`` derives the 32-bit token hash from the first 8 hex
    digits of md5 instead of xxhash64 — slower, but recomputable verbatim
    in external SQL engines, which is how the driver oracle checks this
    fingerprint end-to-end. Production default stays xxhash64 (JVM,
    codegen'd, no string hex round-trip).
    """
    if use_md5:
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
    else:
        h = F.xxhash64("tok")
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    ).withColumn("h", h)
    votes = [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(id_col, sim.cast("bigint").alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32,
    chunks: int = 4, max_hamming: int = 3, use_md5: bool = False,
    persisted_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Near-dup pairs from simhash fingerprints: (id_a, id_b, hamming).

    Bit-chunk banding (pigeonhole): any pair with hamming ≤ max_hamming <
    chunks must agree on at least one of the ``chunks`` equal-width bit
    slices, so a self-join on (chunk_idx, chunk_bits) generates a candidate
    superset that LOSES NO true pair; candidates are then verified exactly
    with bit_count(xor) — sub-quadratic where the all-pairs check is O(N²).

    100 TB shape: the join key space is chunks × 2^(bits/chunks) buckets;
    expected bucket size N/2^(bits/chunks) keeps the within-bucket product
    bounded (for 64-bit fingerprints use chunks = max_hamming+1 wide slices
    — the same math). Fingerprints are persisted before the self-join so
    the vote aggregation runs once, not once per side.
    """
    if max_hamming >= chunks:
        raise ValueError("pigeonhole needs max_hamming < chunks")
    width = bits // chunks
    from pyspark import StorageLevel

    sim = simhash(df, text_col, id_col, bits, use_md5=use_md5).persist(StorageLevel.DISK_ONLY)
    if persisted_out is not None:
        persisted_out.append(sim)
    mask = (1 << width) - 1
    chunked = sim.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("cbits"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.cbits")
    a, b = chunked.alias("a"), chunked.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cbits") == F.col("b.cbits"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), hamming.alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _candidate_intersections(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """(id_a, id_b, common): shingle-intersection sizes for exactly the
    candidate pairs — shingles joined onto the pair frame once per side,
    then an equi-join on (id_b, sh). Row volume through the second join is
    exactly Σ_pairs |A∩B| (each row IS one common shingle of one pair), so
    a k-document near-dup cluster costs Σ its candidate pairs' overlaps,
    never k² as a within-cluster self-join would. Exposed for the row-count
    test in tests/test_dedup.py."""
    sh_a = sh.select(F.col("id").alias("id_a"), "sh")
    sh_b = sh.select(F.col("id").alias("id_b"), "sh")
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 3, threshold: float = 0.3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard via a shingle-equality join:
    |A∩B| from the join, |A|,|B| from per-doc distinct counts.

    ``candidates``: optional (id_a, id_b) frame (e.g. ``minhash_lsh_pairs``
    output) — the verify-LSH-candidates composition for corpus scale.
    Intersections are computed PER CANDIDATE PAIR: shingles are equi-joined
    onto the pair frame once per side (``_candidate_intersections``), so
    cost is Σ_pairs |A∩B| — NOT a shingle self-join within the candidate id
    set, which would pay Σ_buckets k² inside a k-document dup cluster (the
    exact case LSH surfaces). Without ``candidates`` the full (exact,
    quadratic-in-bucket) self-join runs — the join key (shingle) is
    Zipf-skewed, AQE skew-join splits the hot shingles.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k)).alias("sh")
    ).distinct()
    if candidates is not None:
        # normalize pair orientation to the id_a < id_b output contract and
        # drop degenerate (x, x) pairs an untrusted candidate frame may
        # carry — brute force can never emit a self-pair
        cand = (
            candidates.select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct()
        )
        ids = (
            cand.select(F.col("id_a").alias("id"))
            .unionByName(cand.select(F.col("id_b").alias("id")))
            .distinct()
        )
        sh = sh.join(ids, "id", "left_semi")
        inter = _candidate_intersections(sh, cand)
    else:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("common"))
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs, exact.

    ``candidates``: optional (id_a, id_b) frame (e.g.
    ``similarity.lsh_candidate_pairs`` output) — the corpus-scale
    composition: vectors are hash-joined onto the candidate pairs once per
    side, so cost is candidate volume × one cosine each instead of the
    brute quadratic theta-join. Without it the exact all-pairs comparison
    runs (the intentional small-corpus / verification baseline)."""
    from yckg_spark.operators.similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if candidates is not None:
        # normalize orientation to the id_a < id_b contract — and drop
        # degenerate (x, x) pairs an untrusted candidate frame may carry,
        # which would emit a cosine-1.0 self-pair the brute id_a < id_b
        # path can never produce — then pick the vectors up via two
        # equi-joins, ids-only until the cosine
        pairs = (
            candidates.select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct()
            .join(a, "id_a")
            .join(b, "id_b")
        )
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs
        .select("id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def neardup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph: (doc_id, cluster_id)
    with cluster_id = the smallest doc id in the component.

    Near-dup pairs (from minhash/simhash/embedding banding) are transitive
    in intent — A~B and B~C means one document should survive of the three —
    so the keep-one-per-group decision needs components, not pairs.

    Distributed shape: min-label propagation with pointer jumping
    (label <- label(label) each round), the standard Spark CC recipe.
    Labels are monotonically non-increasing, so the jump is always valid;
    propagation alone needs O(diameter) rounds, the jump cuts that to
    O(log diameter) — near-dup components are tiny (dup clusters), so this
    is 2-3 rounds in practice. Each round shuffles only (node, label)
    pairs bounded by the edge count. Only nodes that appear in some pair
    are returned (singletons are trivially their own cluster).

    Lineage is cut every round so plans do not grow across rounds:
    ``localCheckpoint`` (executor memory, fast) by default — fine locally,
    but on a real cluster an executor loss mid-loop is unrecoverable
    (blocks are neither replicated nor on reliable storage). Pass
    ``checkpoint_dir`` to use reliable ``checkpoint()`` against that
    HDFS/object-store path instead; the loop then survives executor loss
    at the cost of a write per round.

    CALLERS OWN ``checkpoint_dir`` CLEANUP: ``setCheckpointDir`` is a
    global SparkContext mutation that persists past this call, and Spark
    does not reap checkpoint data by default
    (``spark.cleaner.referenceTracking.cleanCheckpoints`` is false), so
    each round leaves one RDD checkpoint in the dir. Delete the dir once
    the downstream write has committed — ``cmd_dedup`` in the CLI does
    exactly that (cli.py).
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
    )
    labels = _cut(
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    while True:
        nbr_min = (
            edges.join(labels.withColumnRenamed("node", "vn"), F.col("v") == F.col("vn"))
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = labels.join(nbr_min, labels["node"] == nbr_min["u"], "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                "label"
            ),
        )
        ptr = prop.select(F.col("node").alias("pn"), F.col("label").alias("plabel"))
        jumped = _cut(
            prop.join(ptr, prop["label"] == ptr["pn"], "left")
            .select("node", F.coalesce("plabel", "label").alias("label"))
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
        )
        labels = jumped
        if changed.isEmpty():
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_keep_best(
    docs: DataFrame, pairs: DataFrame, score_col: str, id_col: str = "doc_id",
    id_a: str = "id_a", id_b: str = "id_b", checkpoint_dir: str | None = None,
) -> DataFrame:
    """Keep the highest-scoring member of each near-dup component (ties →
    smallest id); documents in no pair pass through untouched.

    The min-id policy of ``dedup_keep_representatives`` is arbitrary; a
    curation pipeline usually wants to keep the *best* duplicate — longest,
    highest quality score, most recent crawl. ``score_col`` is any numeric
    column already on ``docs``.

    Distributed shape: components are computed on ids only, then the score
    is hash-joined onto the membership table — (id, cluster_id, score) is
    all that ever shuffles, never the text. The per-component argmax is a
    single ``max_by`` over a (score, -id) struct, so ordering is total and
    the result deterministic. The final keep is a left-anti join of ``docs``
    against the loser id set, same as the min-id path.
    """
    clusters = neardup_clusters(pairs, id_a, id_b, checkpoint_dir=checkpoint_dir)
    members = clusters.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(score_col).alias("_score")),
        "doc_id",
    )
    keep = members.groupBy("cluster_id").agg(
        F.max_by("doc_id", F.struct(F.col("_score"), -F.col("doc_id"))).alias("keep_id")
    )
    losers = (
        members.join(keep, "cluster_id")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")


def incremental_dedup(
    batch: DataFrame, corpus: DataFrame, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-dedup a new ingest batch against an existing corpus: keep the
    batch rows whose normalized text does not already exist in the corpus,
    and within the batch keep one row (min id) per distinct text.

    This is the continuous-crawl shape at 100 TB: the corpus is never
    re-deduped — it reduces to its distinct content hashes (in production
    you would persist that hash index once and reuse it per batch), the
    batch anti-joins against them, and only (hash, id) pairs ride any
    shuffle. The batch text itself is touched exactly once, by the final
    id semi-join that restores the full rows.
    """
    h = F.sha2(normalize_text(F.col(text_col)), 256)
    seen = corpus.select(h.alias("text_hash")).distinct()
    fresh = (
        batch.select(h.alias("text_hash"), F.col(id_col))
        .join(seen, "text_hash", "left_anti")
    )
    keep = fresh.groupBy("text_hash").agg(F.min(id_col).alias(id_col))
    return batch.join(keep.select(id_col), id_col, "left_semi")


def dedup_keep_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    id_a: str = "id_a", id_b: str = "id_b", checkpoint_dir: str | None = None,
) -> DataFrame:
    """Keep exactly one document per near-dup component (the min-id member);
    documents in no pair pass through untouched. Anti-join on the non-
    representative member set — the big table is never shuffled on text.
    ``checkpoint_dir``: reliable-checkpoint path for the components loop
    (see ``neardup_clusters``)."""
    dupes = (
        neardup_clusters(pairs, id_a, id_b, checkpoint_dir=checkpoint_dir)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(dupes, id_col, "left_anti")


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Cross-source duplicate-overlap matrix: for every pair of sources,
    how many distinct (normalized-text) fingerprints they share and the
    Jaccard overlap of their fingerprint sets — the audit table a corpus
    curator reads before mixing crawls ("is source B just a re-crawl of
    A?"). Emits ALL source pairs (source_a < source_b), zero-overlap
    ones included, so the matrix shape is data-independent:
    (source_a, source_b, n_a, n_b, n_common, jaccard).

    Distributed shape: documents collapse to distinct (source, md5) —
    one map-side-partial exchange on the 16-byte hash, text never
    shuffled. The intersection self-join keys on the fingerprint, whose
    uniformity makes skew impossible; per-source set sizes are a tiny
    aggregate, and the all-pairs scaffold is a crossJoin of that
    source-count-sized frame (hundreds of rows at web scale, broadcast
    by AQE), never of documents.
    """
    fp = df.select(
        F.col(group_col).alias("g"),
        F.md5(normalize_text(F.col(text_col))).alias("h"),
    ).distinct()
    sizes = fp.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    sa = sizes.select(F.col("g").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("g").alias("source_b"), F.col("n").alias("n_b"))
    scaffold = sa.crossJoin(sb).filter(F.col("source_a") < F.col("source_b"))
    n_common = F.coalesce(F.col("nc"), F.lit(0)).cast("long")
    return (
        scaffold.join(
            inter,
            (F.col("ga") == F.col("source_a")) & (F.col("gb") == F.col("source_b")),
            "left",
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            n_common.alias("n_common"),
            F.round(
                n_common.cast("double")
                / (F.col("n_a") + F.col("n_b") - n_common),
                6,
            ).alias("jaccard"),
        )
    )
