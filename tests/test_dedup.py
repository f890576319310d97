"""Dedup operator family: exact, minhash-LSH, simhash, n-gram Jaccard,
embedding cosine — on a tiny corpus with planted duplicates."""

import pytest


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                                   # exact dup of 1
        (3, "The  Quick  brown fox jumps over the lazy dog while the cat watches "
            "from the warm windowsill and the birds sing in the garden outside"),
        # ^ same after normalization (case + whitespace)
        (4, BASE.replace("garden", "meadow")),       # near-dup: one word changed
        (5, "completely different text about spark query engines and "
            "distributed shuffle partitioning strategies at petabyte scale"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups_normalized_texts(spark, docs):
    from yckg_spark.operators.dedup import exact_dedup

    groups = {r["keep_id"]: r["n_docs"] for r in exact_dedup(docs).collect()}
    assert groups[1] == 3          # docs 1, 2, 3 collapse
    assert groups[4] == 1
    assert groups[5] == 1


def test_minhash_lsh_finds_near_dups_not_distinct(spark, docs):
    from yckg_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert (1, 4) in pairs          # near-dup caught
    assert pairs[(1, 4)] < 1.0
    assert not any(5 in p for p in pairs)   # distinct doc pairs with nothing


def test_minhash_deterministic(spark, docs):
    from yckg_spark.operators.dedup import minhash_signatures

    a = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    b = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert a == b
    assert a[1] == a[2]             # identical text -> identical signature


def test_simhash_close_for_near_dups(spark, docs):
    from pyspark.sql import functions as F

    from yckg_spark.operators.dedup import simhash

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[1] == sh[2] == sh[3]

    def hamming(x, y):
        return bin((x ^ y) & 0xFFFFFFFF).count("1")

    assert hamming(sh[1], sh[4]) < hamming(sh[1], sh[5])


def test_simhash_pairs_equal_brute_force(spark, docs):
    """Chunk-banded pair generation finds exactly the brute-force
    hamming<=k set (pigeonhole losslessness), and the fingerprint-identical
    planted dups (1,2,3) always pair at hamming 0."""
    from yckg_spark.operators.dedup import simhash, simhash_pairs

    k = 3
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, chunks=4, max_hamming=k).collect()
    }
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sh)
    want = {
        (a, b): bin((sh[a] ^ sh[b]) & 0xFFFFFFFF).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sh[a] ^ sh[b]) & 0xFFFFFFFF).count("1") <= k
    }
    assert got == want
    assert got[(1, 2)] == 0 and got[(1, 3)] == 0 and got[(2, 3)] == 0


def test_simhash_pairs_rejects_bad_pigeonhole(spark, docs):
    import pytest as _pytest

    from yckg_spark.operators.dedup import simhash_pairs

    with _pytest.raises(ValueError):
        simhash_pairs(docs, chunks=4, max_hamming=4)


def test_ngram_jaccard_exact_scores(spark, docs):
    from yckg_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 4)] < 1.0   # one word changed -> most 3-grams shared
    assert (1, 5) not in pairs


def test_embedding_neardup(spark):
    from yckg_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.createDataFrame(
        [
            ("a", [1.0, 0.0, 0.0]),
            ("b", [0.999, 0.01, 0.0]),   # nearly parallel to a
            ("c", [0.0, 1.0, 0.0]),      # orthogonal
        ],
        ["vec_id", "embedding"],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(emb, threshold=0.95).collect()}
    assert pairs == {("a", "b")}


def test_neardup_clusters_components(spark):
    from yckg_spark.operators.dedup import neardup_clusters

    # two components {1,2,3} and {10,11}, plus a long chain 20..27 that
    # forces multiple propagation rounds (diameter 7, log-rounds w/ jumping)
    pairs = [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(20, 27)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        (r["doc_id"], r["cluster_id"]) for r in neardup_clusters(df).collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)} | {
        (i, 20) for i in range(20, 28)
    }
    assert got == want


def test_neardup_clusters_edge_order_invariant(spark):
    from yckg_spark.operators.dedup import neardup_clusters

    # same graph with reversed/unordered endpoints and duplicate pairs
    pairs = [(3, 2), (1, 2), (2, 3), (27, 26)] + [(i + 1, i) for i in range(20, 27)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        (r["doc_id"], r["cluster_id"]) for r in neardup_clusters(df).collect()
    }
    want = {(1, 1), (2, 1), (3, 1)} | {(i, 20) for i in range(20, 28)}
    assert got == want


def test_dedup_keep_representatives(spark):
    from yckg_spark.operators.dedup import dedup_keep_representatives

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_representatives(docs, pairs).collect()
    )
    # 2,3 fold into 1; 6 folds into 5; 0,4,7 untouched singletons
    assert kept == [0, 1, 4, 5, 7]


def test_dedup_keep_best_prefers_high_score(spark):
    """Per component, the max-score member survives (ties -> min id), not
    the min-id member; singletons pass through untouched."""
    from yckg_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(i, f"text {i}", score) for i, score in
         [(0, 10), (1, 5), (2, 9), (3, 9), (5, 1), (6, 1), (7, 3)]],
        ["doc_id", "text", "quality"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_best(docs, pairs, "quality").collect()
    )
    # {1,2,3}: max quality 9 tied between 2 and 3 -> keep 2 (min id).
    # {5,6}: tied at 1 -> keep 5. 0 and 7 are singletons.
    assert kept == [0, 2, 5, 7]


def test_incremental_dedup_batch_vs_corpus(spark):
    """Batch rows already in the corpus are dropped; within-batch dupes
    keep the min id; genuinely new rows pass through with all columns."""
    from yckg_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "ALPHA   beta"),      # dup of corpus 1 after normalization
            (11, "epsilon zeta"),      # new
            (12, "epsilon  ZETA"),     # in-batch dup of 11 -> dropped
            (13, "eta theta"),         # new
        ],
        ["doc_id", "text"],
    )
    out = incremental_dedup(batch, corpus).collect()
    assert sorted(r["doc_id"] for r in out) == [11, 13]
    assert {r["text"] for r in out} == {"epsilon zeta", "eta theta"}


def test_neardup_clusters_reliable_checkpoint_matches_local(spark, tmp_path):
    from yckg_spark.operators.dedup import neardup_clusters

    pairs = [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(20, 27)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    local = {(r["doc_id"], r["cluster_id"]) for r in neardup_clusters(df).collect()}
    ckpt_dir = str(tmp_path / "cc_ckpt")
    reliable = {
        (r["doc_id"], r["cluster_id"])
        for r in neardup_clusters(df, checkpoint_dir=ckpt_dir).collect()
    }
    assert reliable == local
    # the reliable path actually wrote checkpoint data to the given dir
    import os

    assert any(files for _, _, files in os.walk(ckpt_dir)), "no checkpoint written"


def test_ngram_jaccard_verifies_lsh_candidates(spark, docs):
    """The scale composition: minhash-LSH candidates -> exact n-gram
    Jaccard verification. Scores for candidate pairs are identical to the
    full self-join's; pairs outside the candidate set are not scored."""
    from pyspark.sql import functions as F  # noqa: F401

    from yckg_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    cands = minhash_lsh_pairs(docs, threshold=0.2).select("id_a", "id_b")
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    verified = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(docs, threshold=0.0, candidates=cands).collect()}
    cand_set = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert cand_set, "LSH produced no candidates"
    assert set(verified) <= cand_set
    for pair, j in verified.items():
        assert j == full[pair]
    # the near-dup pair (1, 4) survives LSH and verifies above 0.5
    assert verified.get((1, 4), 0.0) > 0.5


def test_ngram_jaccard_candidates_orientation_normalized(spark, docs):
    """Reversed (id_b, id_a) candidate pairs score identically."""
    from pyspark.sql import functions as F

    from yckg_spark.operators.dedup import ngram_jaccard_pairs

    fwd = spark.createDataFrame([(1, 4)], ["id_a", "id_b"])
    rev = fwd.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    a = ngram_jaccard_pairs(docs, threshold=0.0, candidates=fwd).collect()
    b = ngram_jaccard_pairs(docs, threshold=0.0, candidates=rev).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) == 1


def test_ngram_candidate_intersections_are_per_pair(spark):
    """Inside a k-document dup cluster (the exact case LSH surfaces) the
    candidates path must pay per candidate PAIR, not k² per hot shingle:
    `_candidate_intersections` joins shingles onto the pair frame per side,
    so the pre-aggregation row volume is exactly Σ_pairs |A∩B| — here one
    candidate pair over a 6-doc identical cluster ⇒ |shingles| rows, where
    a within-cluster self-join would emit 15 pairs × |shingles|."""
    from pyspark.sql import functions as F

    from yckg_spark.operators.dedup import _candidate_intersections, shingles

    docs6 = spark.createDataFrame([(i, BASE) for i in range(1, 7)], ["doc_id", "text"])
    sh = docs6.select(
        F.col("doc_id").alias("id"), F.explode(shingles(F.col("text"), 3)).alias("sh")
    ).distinct()
    n_shingles = sh.filter("id = 1").count()
    cand = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])

    rows = _candidate_intersections(sh, cand).collect()
    assert len(rows) == 1
    assert (rows[0]["id_a"], rows[0]["id_b"], rows[0]["common"]) == (1, 2, n_shingles)
    # pre-agg volume: each row of the second join IS one common shingle of
    # one candidate pair
    sh_a = sh.select(F.col("id").alias("id_a"), "sh")
    sh_b = sh.select(F.col("id").alias("id_b"), "sh")
    pre = cand.join(sh_a, "id_a").join(sh_b, ["id_b", "sh"]).count()
    assert pre == n_shingles  # NOT 15 * n_shingles


def test_ngram_candidates_equal_brute_within_cluster(spark):
    """The per-pair candidates path scores exactly like the full self-join,
    restricted to the candidate set."""
    from yckg_spark.operators.dedup import ngram_jaccard_pairs

    docs6 = spark.createDataFrame(
        [(i, BASE) for i in range(1, 4)] + [(4, BASE.replace("garden", "meadow"))],
        ["doc_id", "text"],
    )
    cand = spark.createDataFrame([(1, 2), (2, 4)], ["id_a", "id_b"])
    brute = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs6, threshold=0.0).collect()}
    via = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs6, threshold=0.0, candidates=cand).collect()}
    assert via == {(1, 2): brute[(1, 2)], (2, 4): brute[(2, 4)]}


def test_degenerate_self_candidates_dropped(spark, docs):
    """An untrusted candidate frame carrying (x, x) pairs must not emit
    self-pairs the brute id_a < id_b path can never produce — both the
    ngram and embedding verifiers filter them after orientation
    normalization."""
    from yckg_spark.operators.dedup import embedding_neardup_pairs, ngram_jaccard_pairs

    cand = spark.createDataFrame([(1, 1), (2, 1)], ["id_a", "id_b"])
    out = ngram_jaccard_pairs(docs, threshold=0.0, candidates=cand).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01])], ["vec_id", "embedding"]
    )
    ecand = spark.createDataFrame([(1, 1), (2, 2), (2, 1)], ["id_a", "id_b"])
    eout = embedding_neardup_pairs(emb, threshold=0.0, candidates=ecand).collect()
    assert {(r["id_a"], r["id_b"]) for r in eout} == {(1, 2)}


# ---------------------------------------------------------------------------
# source_overlap
# ---------------------------------------------------------------------------


def test_source_overlap_counts_and_jaccard(spark):
    from yckg_spark.operators.dedup import source_overlap

    df = spark.createDataFrame(
        [
            (1, "alpha beta", "A"),
            (2, "gamma", "A"),
            (3, "ALPHA   beta", "B"),  # normalizes equal to doc 1
            (4, "delta", "B"),
            (5, "epsilon", "C"),
            (6, "alpha beta", "C"),
            (7, "gamma", "C"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r["source_a"], r["source_b"]): (r["n_a"], r["n_b"], r["n_common"], r["jaccard"])
        for r in source_overlap(df).collect()
    }
    # all 3 pairs present, including the zero-overlap scaffold rows
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")] == (2, 2, 1, round(1 / 3, 6))
    assert out[("A", "C")] == (2, 3, 2, round(2 / 3, 6))
    assert out[("B", "C")] == (2, 3, 1, 0.25)


def test_source_overlap_single_source_is_empty(spark):
    from yckg_spark.operators.dedup import source_overlap

    df = spark.createDataFrame([(1, "x", "only")], ["doc_id", "text", "source"])
    assert source_overlap(df).count() == 0
