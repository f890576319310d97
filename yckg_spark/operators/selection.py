"""Data selection, mixing, and packing operators — the stage between
curation (quality/dedup/decontamination) and the training run itself:
deterministic stratified sampling for corpus mixing, per-source caps
(the RefinedWeb/C4 anti-domination rule), token-budget shard packing,
and C4-style line-level cleaning.

Reference parity note: the reference pipeline (single-node pandas +
rdflib, Code/create_yelp_nt_files.py) stops at triple emission and has
no selection stage; these are the large-scale-pipeline extensions
mandated by the build brief, expressed Spark-first.

100-TB design notes (details per docstring):
- ``stratified_sample`` is a pure narrow filter on a recomputable hash —
  zero shuffle, and the same draw replays on any engine with md5.
- ``source_cap`` shuffles only (source, rank-key, id) slivers; document
  text rides at most one hash exchange (or none with broadcast_keep).
- ``pack_shards`` replaces the classic single-partition global-window
  cumsum with a two-phase distributed prefix sum: per-range partial
  sums (tiny), driver-side prefix over <= n_buckets rows, then
  within-range windows that never see more than corpus/n_buckets rows.
- ``line_filter`` is a narrow per-row array pipeline, no shuffle.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yckg_spark.operators.dedup import normalize_text

# ---------------------------------------------------------------------------
# stratified sampling / corpus mixing
# ---------------------------------------------------------------------------


def _rate_threshold(rate: float) -> str:
    """Hex threshold such that P(md5-prefix < threshold) == rate.

    The first 8 hex chars of md5 are uniform on [0, 2^32); a lowercase
    lexicographic compare of fixed-width hex strings is an unsigned
    integer compare, so it replays identically in any SQL engine.
    rate >= 1.0 maps to 'g', which every hex string sorts below.
    """
    if rate >= 1.0:
        return "g"
    return format(max(0, int(rate * 2**32)), "08x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the corpus-mixing
    primitive ("keep 50% of en, 10% of de, drop the rest"). A document is
    kept iff the first 8 hex chars of md5(id ":" salt) fall below its
    stratum's rate threshold; strata absent from ``rates`` are dropped.

    Scale shape: a pure narrow filter inside whole-stage codegen — no
    shuffle, no sort, no driver state. The draw is a function of
    (id, salt) alone, so it is stable under repartitioning, resumable
    across job restarts, and a different ``salt`` yields an independent
    re-draw (e.g. for a second epoch's fresh subsample). Unlike
    df.sample(), the decision is row-deterministic: the same document is
    kept or dropped no matter how the scan splits 100 TB into tasks.
    """
    if not rates:
        raise ValueError("rates must map at least one stratum to a rate")
    key = F.substring(F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    thr = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], F.lit(_rate_threshold(kv[1]))),
        rates.items(),
        F.when(F.lit(False), F.lit("")),
    )
    return df.filter(key < thr)


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Token-budget corpus mixing: downsample each stratum so the surviving
    corpus matches the ``targets`` proportions (by ``weight_col`` mass —
    token counts in a real pipeline — or by document count when None),
    keeping as much data as the targets allow. The scale factor is
    ``λ = min_s(w_s / target_s)``: the most-over-targeted stratum keeps
    everything (rate exactly 1) and every other stratum keeps
    ``λ·target_s / w_s`` of its mass in expectation; nothing is ever
    upsampled. Strata absent from ``targets`` are dropped. This is the
    mixture-reweighting step (the DoReMi/Pile recipe's sampling stage)
    that follows curation and precedes packing.

    The draw itself is ``stratified_sample``'s deterministic md5-prefix
    Bernoulli — row-deterministic, restart-stable, re-drawable via
    ``salt``. Unlike ``stratified_sample`` the rates are COMPUTED from
    the data, entirely in-plan: per-stratum mass is one two-phase agg
    (stratum-count rows), λ one broadcast scalar, and the thresholds join
    back as a broadcast — no driver collect, so the same plan serves 100
    TB. Weights are summed as doubles; integer-valued weights below 2^53
    sum exactly, so the rate arithmetic replays bit-for-bit on any
    IEEE-double engine (the DuckDB oracle replays it literally).
    """
    if not targets:
        raise ValueError("targets must map at least one stratum to a weight")
    if any(t <= 0 for t in targets.values()):
        raise ValueError("target weights must be positive")
    tgt = df.sparkSession.createDataFrame(
        [(s, float(t)) for s, t in targets.items()], f"{strata_col} string, target double"
    )
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("double")
    sums = df.groupBy(strata_col).agg(F.sum(w).alias("w"))
    j = sums.join(F.broadcast(tgt), strata_col)
    lam = j.agg(F.min(F.col("w") / F.col("target")).alias("lam"))
    rate = F.col("lam") * F.col("target") / F.col("w")
    # rate >= 1 (the binding stratum, up to float round-trip) keeps all;
    # else the md5-prefix threshold — same uniform draw as stratified_sample.
    thr = F.when(rate >= 1.0, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(F.floor(rate * F.lit(2.0**32)).cast("long")), 8, "0"))
    )
    rates = j.join(F.broadcast(lam)).select(strata_col, thr.alias("_thr"))
    key = F.substring(F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    return df.join(F.broadcast(rates), strata_col).filter(key < F.col("_thr")).drop("_thr")


# ---------------------------------------------------------------------------
# per-source cap (anti-domination)
# ---------------------------------------------------------------------------


def source_cap(
    df: DataFrame,
    cap: int,
    partition_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    broadcast_keep: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` documents per source/domain, preferring the
    highest ``order_col`` (ties broken by ascending id for a total,
    replayable order) — the C4/RefinedWeb rule that stops one crawl
    domain from dominating the corpus. Returns the surviving rows of
    ``df`` plus their 1-based ``rank`` within the source.

    Scale shape: the window runs on an ids-only sliver
    (source, rank-key, id) — document text neither rides the rank
    exchange nor sits in its sort buffers. Survivor ids then rejoin the
    corpus by id: one hash exchange of the big table, or none at all
    with ``broadcast_keep=True`` (right whenever cap x #sources fits an
    executor — the usual case: 1e6 domains x cap 100 is ~1 GB of ids).
    A pathologically hot source is one window partition of ids only;
    sorting ids of even a 1e8-page domain is MBs per task, not the
    text's TBs.
    """
    w = Window.partitionBy(partition_col).orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    keep = (
        df.select(partition_col, order_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
        .select(id_col, "rank")
    )
    if broadcast_keep:
        keep = F.broadcast(keep)
    return df.join(keep, on=id_col, how="inner")


# ---------------------------------------------------------------------------
# token-budget shard packing
# ---------------------------------------------------------------------------


def word_count(col: Column) -> Column:
    """Whitespace word count of the normalized text (0 for empty/null) —
    regexp_count so the empty string counts 0 on every engine, coalesced
    so a null document cannot poison a packing sum."""
    return F.coalesce(F.regexp_count(normalize_text(col), F.lit(r"[^ ]+")), F.lit(0))


def pack_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign documents, in ascending-id order, to consecutive training
    shards of at most ``budget`` tokens each (a document lands in the
    shard its cumulative start offset falls in — the greedy sequential
    packing a tokenizer/writer pipeline consumes). Returns
    (id, n_tokens, shard). Token counts come from ``tokens_col`` if
    given, else a whitespace word count of ``text_col``.

    Scale shape: the textbook formulation — a global cumulative sum via
    ``Window.orderBy(id)`` with no partitionBy — funnels 100 TB through
    ONE task. This implementation is the two-phase distributed prefix
    sum instead: ids are range-bucketed (bounds from one min/max agg),
    per-bucket token sums are aggregated map-side and collected
    (<= n_buckets rows), the driver prefix-sums them into per-bucket
    start offsets, and a broadcast joins the offsets back so each
    bucket's window cumsum runs over only corpus/n_buckets rows in
    parallel. Driver state is O(n_buckets); no stage sees a global sort.
    Dense ids pack evenly; for skewed id spaces raise ``n_buckets`` or
    pre-map ids — the output is invariant to bucketing either way, since
    the offsets make the per-bucket sums exact.
    """
    n_tokens = (F.col(tokens_col) if tokens_col else word_count(F.col(text_col))).cast("long")
    slim = df.select(F.col(id_col), n_tokens.alias("n_tokens"))
    lo, hi = slim.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return slim.withColumn("shard", F.lit(0).cast("long"))
    width = max(1, math.ceil((hi - lo + 1) / n_buckets))
    slim = slim.withColumn("bucket", ((F.col(id_col) - lo) / width).cast("long"))
    sums = {b: s for b, s in slim.groupBy("bucket").agg(F.sum("n_tokens")).collect()}
    offsets, acc = [], 0
    for b in sorted(sums):
        offsets.append((b, acc))
        acc += sums[b]
    off = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "bucket long, bucket_offset long")
    )
    w = Window.partitionBy("bucket").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.col("bucket_offset") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        slim.join(off, on="bucket")
        .withColumn("shard", F.floor(start / budget).cast("long"))
        .select(id_col, "n_tokens", "shard")
    )


# ---------------------------------------------------------------------------
# C4-style line-level cleaning
# ---------------------------------------------------------------------------


def line_filter(
    df: DataFrame,
    min_words: int = 3,
    banned: tuple[str, ...] = ("javascript", "lorem ipsum", "{"),
    text_col: str = "text",
    line_sep: str = "\n",
) -> DataFrame:
    """C4-style line-level cleaning: drop lines with fewer than
    ``min_words`` whitespace words or containing any ``banned``
    substring (case-insensitive), keep the document with the survivors
    rejoined. Returns the input columns plus (n_lines, n_kept,
    text_clean) — column-preserving so a pipeline can swap the cleaned
    text in without a join back by id.

    Scale shape: a narrow per-row split -> filter -> rejoin of array
    expressions — no shuffle, no Python. The higher-order filter opts
    its expression out of whole-stage codegen (the measured HOF cost is
    documented in BENCH/BASELINE.md's repetition A/B), but here there is
    no codegen-friendly alternative that preserves line order, and the
    per-row work is O(len(text)) either way.
    """
    lines = F.split(F.col(text_col), line_sep)

    def keep(line: Column) -> Column:
        wc = F.regexp_count(line, F.lit(r"[^ ]+"))
        bad = reduce(
            lambda acc, b: acc | F.lower(line).contains(b.lower()), banned, F.lit(False)
        )
        return (wc >= min_words) & ~bad

    kept = F.filter(lines, keep)
    return df.withColumns(
        {
            "n_lines": F.size(lines).cast("long"),
            "n_kept": F.size(kept).cast("long"),
            "text_clean": F.array_join(kept, line_sep),
        }
    )


# ---------------------------------------------------------------------------
# fixed-window document chunking
# ---------------------------------------------------------------------------


def chunk_docs(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's whitespace token sequence into fixed windows
    of ``chunk_tokens`` tokens that slide by ``chunk_tokens - overlap``
    (the context-window chunking a training tokenizer consumes: every
    token appears in at least one chunk, consecutive chunks share
    ``overlap`` tokens so no training example starts cold at a window
    boundary). Returns one row per chunk: (id, chunk_id, n_tokens,
    chunk_text), ``chunk_id`` 0-based in document order; a document
    shorter than one window yields exactly one (possibly short) chunk,
    and the last chunk is the natural remainder. Start offsets run only
    to ``n_tokens - 1 - overlap``: a window starting past that would
    contain no token the previous window lacks (a pure-suffix duplicate
    training example), while the bound still guarantees every token
    appears — the last start always exceeds ``n_tokens - chunk_tokens``.
    Tokens are the normalized whitespace split — swap in a real
    tokenizer upstream by passing pre-tokenized text.

    Scale shape: a narrow per-row sequence -> posexplode -> slice of
    array expressions — NO shuffle and no Python; output order within a
    document is carried by ``chunk_id``, not a sort. The explode fans
    each row out ~len/step times, so at 100 TB this pairs with a
    partitioned write (the chunker itself adds no exchange) and AQE
    coalesces the post-explode partitions.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1 - overlap, F.lit(0)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            n.alias("_n"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long"),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start"))
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
            ).alias("chunk_text"),
        )
    )


def quality_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    by: str = "rank",
) -> DataFrame:
    """CCNet-style per-source quality bucketing: score every document,
    then split each source into equal-size quality tiers (head = best) —
    the table a mixing stage reads to upsample head and drop tail
    (Wenzek et al. 2020 bucket their corpus by per-language LM
    perplexity thirds; the score here is the engine's deterministic
    quality_score).

    Returns (id, group, quality, bucket).

    Two strategies, same output contract:

    - ``by="rank"`` (default, exactly equal tiers): ntile(len(labels))
      over a per-group window ordered (quality desc, id asc) — a total
      order, so ties are deterministic. One exchange + per-group sort;
      scales like any range-partitioned sort unless a single group is
      corpus-sized.
    - ``by="threshold"``: per-group approximate quantile cut points
      (percentile_approx, bounded-memory t-digest) broadcast back and
      compared — no per-group sort at all, the scale path for
      billion-document single sources, at declared boundary fuzziness.
    """
    from yckg_spark.operators.text_analysis import quality_score

    if len(labels) < 2:
        raise ValueError("labels must name at least two tiers")
    n = len(labels)
    label_arr = F.array(*[F.lit(x) for x in labels])
    scored = quality_score(df, text_col).select(id_col, group_col, "quality")
    if by == "rank":
        w = Window.partitionBy(group_col).orderBy(
            F.col("quality").desc(), F.col(id_col).asc()
        )
        return scored.select(
            id_col,
            group_col,
            "quality",
            F.element_at(label_arr, F.ntile(n).over(w)).alias("bucket"),
        )
    if by == "threshold":
        cuts = scored.groupBy(group_col).agg(
            F.percentile_approx(
                "quality", [1 - i / n for i in range(1, n)], 10_000
            ).alias("cuts")
        )
        joined = scored.join(F.broadcast(cuts), group_col)
        # bucket i (1-based) iff quality >= cuts[i-1], falling through to
        # the last label; aggregate counts how many cut points it clears.
        tier = F.lit(n) - F.aggregate(
            F.col("cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("quality") >= c, 1).otherwise(0),
        )
        return joined.select(
            id_col,
            group_col,
            "quality",
            F.element_at(label_arr, tier.cast("int")).alias("bucket"),
        )
    raise ValueError(f"unknown strategy {by!r} (expected 'rank' or 'threshold')")
