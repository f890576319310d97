"""Training-data curation operators beyond per-doc quality scoring:
Gopher-style repetition signals, benchmark decontamination, and PII
scrubbing. All built from JVM-side Column expressions and two-phase
aggregations — no Python in the hot path.

Reference parity note: the reference pipeline (single-node pandas +
rdflib, Code/create_yelp_nt_files.py) has no curation stage at all;
these operators are the large-scale-pipeline extensions mandated by the
build brief, expressed Spark-first.

100-TB design notes per operator live in the docstrings below; the
common theme is that nothing ever shuffles document text — repetition
signals shuffle (id, gram-hash) pairs with map-side combine,
decontamination broadcasts the (small) benchmark gram set, and PII
scrubbing is a narrow map with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yckg_spark.operators.dedup import normalize_text, shingles, word_kgrams

# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------


def dup_word_fraction(col: Column) -> Column:
    """Fraction of word occurrences that repeat an earlier word —
    1 - distinct/total. Pure array expressions, no shuffle."""
    toks = F.split(normalize_text(col), " ")
    n = F.size(toks)
    return F.when(n > 0, 1.0 - F.size(F.array_distinct(toks)) / n).otherwise(0.0)


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Per-document repetition signals in the spirit of the Gopher /
    MassiveText quality rules: ``dup_word_frac`` plus, for each n in
    ``grams``, ``top{n}gram_frac`` — the fraction of the document's word
    n-grams taken up by its single most frequent n-gram. High values mark
    boilerplate and degenerate repetition; filter with e.g.
    ``.filter('top2gram_frac < 0.2')``.

    Scale shape: ONE corpus scan and ONE explode for all gram widths —
    each document's gram arrays are tagged with their width and exploded
    together, then groupBy (id, n, gram) count → groupBy (id, n) mode
    fraction → groupBy id widen. All three aggregations are map-side
    partial; only (id, width, gram) rows ride the exchange, never the
    text, and a single hot document cannot skew a partition because its
    grams combine map-side first. The expression-only alternative
    (aggregate over array_distinct) would be O(distinct²) per row and
    was rejected for long documents.
    """
    c = F.col(text_col)

    def _tag(n: int):
        # NB: the tagging lambda must stay single-parameter — a second
        # parameter (even defaulted) makes F.transform pass the element
        # INDEX into it
        return F.transform(
            shingles(c, n), lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
        )

    tagged = F.concat(*[_tag(n) for n in grams])
    # grams are 64-bit-hashed before the exchange (the minhash path's
    # trick): the mode fraction only needs gram identity, and an 8-byte
    # key shuffles ~5x fewer bytes than the gram string
    per_gram = (
        df.select(F.col(id_col), F.explode(tagged).alias("t"))
        .select(id_col, F.col("t.n").alias("n"), F.xxhash64("t.g").alias("gh"))
        .groupBy(id_col, "n", "gh")
        .agg(F.count("*").alias("c"))
    )
    per_n = per_gram.groupBy(id_col, "n").agg((F.max("c") / F.sum("c")).alias("frac"))
    wide = per_n.groupBy(id_col).agg(
        *[
            F.round(
                F.coalesce(F.max(F.when(F.col("n") == n, F.col("frac"))), F.lit(0.0)), 4
            ).alias(f"top{n}gram_frac")
            for n in grams
        ]
    )
    base = df.select(
        id_col, F.round(dup_word_fraction(c), 4).alias("dup_word_frac")
    )
    out = base.join(wide, on=id_col, how="left")
    return out.select(
        id_col,
        "dup_word_frac",
        *[
            F.coalesce(f"top{n}gram_frac", F.lit(0.0)).alias(f"top{n}gram_frac")
            for n in grams
        ],
    )


# ---------------------------------------------------------------------------
# cross-document line deduplication (CCNet-style boilerplate removal)
# ---------------------------------------------------------------------------


def line_dedup(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    broadcast_freq: bool = True,
) -> DataFrame:
    """Drop every line that appears verbatim in at least ``min_docs``
    distinct documents — the CCNet/RefinedWeb cross-document paragraph
    dedup that removes navigation bars, cookie banners, and footer
    boilerplate an in-document filter can never see. Returns one row per
    input document: (id, n_lines, n_kept, text_deduped), line order
    preserved; a document whose every line was boilerplate survives with
    ``n_kept = 0`` and empty text. A line repeated only *within* one
    document counts that document once and is kept.

    Scale shape, in three exchanges none of which carries document text:
    (1) frequency counting shuffles (64-bit line-hash, id) pairs with
    map-side combine — never the line string; (2) the hash-frequent
    *superset* is exact-verified by string, but only the candidate lines
    (semi-joined through the broadcast hash set) ride that recount, so a
    hash collision can inflate the candidate set yet never mis-drop a
    line; (3) the rebuild regroups (pos, kept-line) slivers by document
    id — the only exchange that moves text, and it moves each surviving
    line exactly once (CCNet itself pays the same paragraph shuffle).
    The exploded ``lines`` frame is deliberately recomputed on each
    branch rather than persisted: it is wider than the corpus and each
    recompute is a narrow scan+split.

    Note: blank lines are lines — if ≥ ``min_docs`` documents contain an
    empty line it is dropped everywhere, which matches the CCNet
    behavior of collapsing shared empties.

    ``broadcast_freq`` (default True) broadcasts the candidate-hash and
    frequent-line sets — right whenever the boilerplate vocabulary fits
    an executor (it usually does: even 10M frequent lines × ~100 B is
    ~1 GB). On a corpus whose frequent set outgrows that, pass False and
    both joins fall back to shuffle joins keyed on the 8-byte hash /
    line string — same answer, one extra exchange of the exploded ids.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), line_sep)
        ).alias("pos", "line"),
    ).withColumn("lh", F.xxhash64("line"))
    # phase 1: candidate hashes — equal strings hash equal, so every truly
    # frequent line's hash-class reaches min_docs (superset, never misses)
    cand = (
        lines.select("lh", id_col)
        .groupBy("lh")
        .agg(F.count_distinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("lh")
    )
    if broadcast_freq:
        cand = F.broadcast(cand)
    # phase 2: exact recount by string among the candidates only
    freq = (
        lines.join(cand, on="lh", how="left_semi")
        .groupBy("line")
        .agg(F.count_distinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("line", F.lit(True).alias("_freq"))
    )
    if broadcast_freq:
        freq = F.broadcast(freq)
    flagged = lines.join(freq, on="line", how="left")
    kept = F.array_sort(
        F.collect_list(F.when(F.col("_freq").isNull(), F.struct("pos", "line")))
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("_freq").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.array_join(
            F.transform(kept, lambda s: s["line"]), line_sep
        ).alias("text_deduped"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with a
    benchmark/eval set (the standard 13-gram-overlap decontamination,
    parameterized). Returns (id, n_hit_grams) for contaminated docs —
    anti-join it back to drop them.

    Only documents with at least ``n`` tokens participate on either
    side (shorter texts have no n-gram to leak).

    Scale shape: benchmark suites are MB-scale next to a 100-TB corpus,
    so the distinct benchmark gram set is **broadcast** and the corpus
    side is filtered to matching grams BEFORE anything shuffles: narrow
    explode → broadcast-hash join → count_distinct per id. Both sides
    join on the 64-bit gram hash, not the gram string — the broadcast
    table and the probe keys shrink ~6× (collision odds at corpus×bench
    gram counts are ~1e-8, the same accepted tradeoff as the minhash
    path). The only exchange carries the (id, matched-gram-hash) hits —
    near-zero volume on a clean corpus — and corpus text never leaves
    its partition.
    """
    bcol = bench_text_col or text_col

    def gram_side(df: DataFrame, col: str):
        toks = F.split(normalize_text(F.col(col)), " ")
        base = df.filter(F.size(toks) >= n)
        gh = F.explode(
            F.transform(shingles(F.col(col), n), lambda g: F.xxhash64(g))
        ).alias("gh")
        return base, gh

    bbase, bgrams = gram_side(benchmark, bcol)
    bench_grams = F.broadcast(bbase.select(bgrams).distinct())
    dbase, dgrams = gram_side(docs, text_col)
    doc_grams = dbase.select(F.col(id_col), dgrams)
    return (
        doc_grams.join(bench_grams, on="gh", how="inner")
        .groupBy(id_col)
        .agg(F.count_distinct("gh").alias("n_hit_grams"))
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns kept within the common subset of Java regex (Spark) and RE2
# (DuckDB oracle): no backreferences, no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails, IPv4 addresses, and +CC-NNN-NNNN phone numbers,
    replacing each with a typed token; adds per-type match counts and
    ``text_scrubbed``. Patterns are applied in PII_PATTERNS order (emails
    first, so an address's host part is consumed before the IP pass).

    Scale shape: a narrow per-row map of JVM regexp expressions inside
    whole-stage codegen — no shuffle, no Python. At 100 TB this runs at
    scan speed and pairs with a partitioned overwrite sink.
    """
    c = F.col(text_col)
    counts = {f"n_{name}": F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS}
    scrubbed = c
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.withColumns({**counts, "text_scrubbed": scrubbed})


# ---------------------------------------------------------------------------
# duplicated-span statistics (exact-substring dedup signal)
# ---------------------------------------------------------------------------


def _frequent_grams(
    grams: DataFrame, min_docs: int, id_col: str, broadcast_cand: bool = True
) -> DataFrame:
    """Shared two-phase frequent-gram verification for the span stats and
    span removal operators: (1) hash-only frequency count — the exchange
    carries (64-bit gh, id) with map-side combine, never the gram string;
    (2) exact recount by string among the hash-candidate superset only
    (a collision can inflate the candidates, never the result). ``grams``
    must carry (id_col, g, gh); returns the one-column ('g') frequent
    set, unbroadcast — callers add their own hint once the frame has its
    final shape."""
    cand = (
        grams.filter(F.col("g").isNotNull())
        .groupBy("gh")
        .agg(F.count_distinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("gh")
    )
    if broadcast_cand:
        cand = F.broadcast(cand)
    return (
        grams.join(cand, on="gh", how="left_semi")
        .groupBy("g")
        .agg(F.count_distinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("g")
    )


def dup_span_stats(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_freq: bool = True,
) -> DataFrame:
    """Per document, how much of it is made of word ``k``-grams that also
    appear verbatim in at least ``min_docs`` distinct documents — the
    span-level exact-duplication signal behind suffix-array substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): whole-doc hashes miss a copied paragraph inside an
    otherwise-unique page, and this catches exactly that. Returns one row
    per input document: (id, n_grams, n_dup_grams, dup_span_frac), where
    ``n_grams`` is the number of word k-grams (0 for docs shorter than
    ``k`` tokens, which then score 0.0), ``n_dup_grams`` counts gram
    *positions* whose gram is corpus-frequent, and ``dup_span_frac`` is
    their ratio. Filter on the fraction (curate-style) or feed the flagged
    docs to a span-removal pass.

    Same three-exchange scale shape as :func:`line_dedup`, and like it
    nothing here shuffles document text: (1) frequency counting moves
    (64-bit gram-hash, id) pairs with map-side combine; (2) the
    hash-frequent *superset* is exact-verified by gram string, but only
    candidate grams (semi-joined through the hash set) ride that recount,
    so a hash collision can inflate the candidate set yet never mis-count;
    (3) the per-doc flag join carries candidate gram strings only. The
    exploded gram frame is recomputed per branch rather than persisted —
    it is k× wider than the corpus and each recompute is a narrow
    scan+split. ``broadcast_freq`` as in :func:`line_dedup`: the frequent
    set is boilerplate-sized, broadcast it unless it outgrows an executor.
    """
    grams = df.select(
        F.col(id_col), F.explode_outer(word_kgrams(F.col(text_col), k)).alias("g")
    ).withColumn("gh", F.xxhash64("g"))
    freq = _frequent_grams(grams, min_docs, id_col, broadcast_freq).withColumn(
        "_freq", F.lit(True)
    )
    if broadcast_freq:
        freq = F.broadcast(freq)
    flagged = grams.join(freq, on="g", how="left")
    n_grams = F.count(F.col("g")).cast("long")
    n_dup = F.sum(F.when(F.col("_freq"), 1).otherwise(0)).cast("long")
    return flagged.groupBy(id_col).agg(
        n_grams.alias("n_grams"),
        n_dup.alias("n_dup_grams"),
        F.when(n_grams > 0, n_dup / n_grams)
        .otherwise(F.lit(0.0))
        .alias("dup_span_frac"),
    )


def span_dedup(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_freq: bool = True,
) -> DataFrame:
    """Remove cross-document duplicated spans from every document — the
    removal counterpart of :func:`dup_span_stats` and the distributed
    rendering of suffix-array substring dedup (Lee et al.): a token is
    dropped iff it lies inside ANY word ``k``-gram that appears verbatim
    in at least ``min_docs`` distinct documents, so overlapping duplicated
    grams merge into one removed span and the unique remainder survives
    in order. Returns one row per input document: (id, n_tokens, n_kept,
    text_deduped); documents shorter than ``k`` tokens pass through
    whole. Like the line variant, a span repeated only *within* one
    document counts that document once and is kept.

    Scale shape — the same discipline as :func:`line_dedup`, one more
    bounded explode: phases (1) and (2) are dup_span_stats' hash-only
    frequency count and candidate-only string verification (nothing
    carries text); (3) each *flagged* gram start expands to its k covered
    token positions — k× the flagged volume, which on a real corpus is a
    sliver of the gram count (the 100-replica stretch is the deliberate
    worst case) — and distinct (id, position) pairs anti-join the token
    explode; (4) the rebuild regroups surviving (position, token) slivers
    by document id, the single exchange that moves text, each kept token
    exactly once.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(toks)
    grams = df.select(
        F.col(id_col),
        F.posexplode(word_kgrams(F.col(text_col), k)).alias("pos", "g"),
    ).withColumn("gh", F.xxhash64("g"))
    freq = _frequent_grams(grams, min_docs, id_col, broadcast_freq)
    if broadcast_freq:
        freq = F.broadcast(freq)
    # merge flagged starts into disjoint covered intervals per doc BEFORE
    # expanding: all flagged grams cover [pos, pos+k-1] and pos is unique
    # per doc, so a new interval starts exactly when pos > prev_pos + k
    # (sessionize-style lag + running break sum). Expanding intervals
    # instead of grams shrinks the explode from k x flagged-gram count to
    # the exact covered-token count — inside a long duplicated run
    # (overlapping grams, the common case) that is a ~k x reduction, and
    # the per-doc window replaces a distinct() over the k-expanded rows.
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(w)
    brk = F.when(prev.isNull() | (F.col("pos") > prev + k), 1).otherwise(0)
    intervals = (
        grams.join(freq, on="g", how="left_semi")
        .select(F.col(id_col), F.col("pos"), brk.alias("brk"))
        .withColumn(
            "grp",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + (k - 1)).alias("e"))
    )
    covered = intervals.select(
        F.col(id_col), F.explode(F.sequence(F.col("s"), F.col("e"))).alias("tpos")
    )
    tokens = df.select(
        F.col(id_col), F.posexplode(toks).alias("tpos", "tok")
    )
    kept = tokens.join(covered, on=[id_col, "tpos"], how="left_anti")
    surv = F.array_sort(F.collect_list(F.struct("tpos", "tok")))
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(F.transform(surv, lambda s: s["tok"]), " ").alias("text_deduped"),
    )
    # left join from the full doc set: a doc whose every token was inside
    # a duplicated span has no surviving rows but must still come back
    base = df.select(F.col(id_col), n.cast("long").alias("n_tokens"))
    return base.join(rebuilt, on=id_col, how="left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text_deduped"), F.lit("")).alias("text_deduped"),
    )
