"""Text analysis for training-data curation: language ID, quality scoring,
token counting, document fingerprinting. All pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yckg_spark.operators.dedup import normalize_text, word_kgrams

# small per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "para", "que"],
}

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored proxy: alpha runs + digit runs + punctuation marks each
    count as one token (regexp_count — JVM-side)."""
    return F.regexp_count(col, F.lit(_TOKEN_RE))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(n > 0, (n - F.length(F.regexp_replace(col, r"[^\w\s]", ""))) / n).otherwise(0.0)


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(n > 0, (n - F.length(F.regexp_replace(col, r"[0-9]", ""))) / n).otherwise(0.0)


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard curation features per document."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_m": F.length(c),
            "n_tokens": token_count(c),
            "mean_token_len": mean_token_len(c),
            "punct_ratio": punct_ratio(c),
            "digit_ratio": digit_ratio(c),
            "stopword_ratio_en": stopword_ratio(c, "en"),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A simple, monotone quality score in [0,1] from the features —
    filter-ready (``df.filter('quality >= 0.5')``)."""
    f = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio_en") * 4, F.lit(1.0)) * 0.3
        + (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
        + (1 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.1
    )
    return f.withColumn("quality", F.round(score, 6))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit ratios,
    'und' (undetermined) when nothing scores > 0. Pure expressions — the
    argmax is array_max over (score, lang) structs."""
    c = F.col(text_col)
    scored = F.array(
        *[
            F.struct(stopword_ratio(c, lang).alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(
        "lang_pred", F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    ).withColumn("lang_score", F.round(best["score"], 6))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of normalized text plus a rolling min-hash
    over word 4-shingles (robust to boilerplate insertion at the edges)."""
    from yckg_spark.operators.dedup import shingles

    return df.select(
        id_col,
        F.md5(normalize_text(F.col(text_col))).alias("md5_fp"),
        F.array_min(
            F.transform(shingles(F.col(text_col), 4), lambda s: F.xxhash64(s))
        ).alias("rolling_min_fp"),
    )


def _doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) rows — one per token occurrence, empty tokens dropped."""
    return df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, term, tfidf, rank).

    tfidf = tf * ln(n_docs / df) with raw term frequency and unsmoothed idf;
    rank is deterministic (score desc, then term asc). Documents whose every
    token is corpus-universal (idf = 0) still emit k rows, ordered by term.

    Distributed shape: the token explode shuffles only (id, term); document
    frequency is a map-side-partial count over the already-distinct (id,
    term) pairs; n_docs rides a broadcast one-row cross join so the plan
    stays lazy; the per-document top-k is a window partitioned by id — no
    global sort. At web scale the idf table is vocabulary-sized: broadcast
    it when it fits, else it is an ordinary shuffle join on term (hash the
    term to 64 bits first if the strings dominate the exchange, as the
    repetition-signal operator does).
    """
    terms = _doc_terms(df, text_col, id_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def lm_train_unigram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train a unigram LM over the corpus: (term, n) token counts.

    One explode + one map-side-partial count — the standard CCNet-style
    LM-filter training pass. At 100 TB the count table is vocabulary-sized
    and lives as a persisted artifact reused across scoring batches.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def lm_score(
    df: DataFrame, counts: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score documents under a unigram LM with add-one smoothing:
    (id, n_tokens, avg_logprob, ppl).

    p(t) = (count(t) + 1) / (total_tokens + vocab_size); unseen terms get
    the count-0 mass. avg_logprob is the token-mean natural log-prob and
    ppl = exp(-avg_logprob) — the CCNet quality-filter statistic (filter
    docs whose perplexity under a clean-corpus LM is extreme). Documents
    with zero tokens are dropped (nothing to score).

    Distributed shape: the model rides two broadcasts — the one-row
    (total, vocab) normalizer and the per-term counts (vocabulary-sized;
    falls back to a shuffle join on term when it outgrows the broadcast
    threshold). The scoring pass is explode → join → per-doc mean: the
    only wide exchange keyed on the document id.
    """
    norm = counts.agg(
        F.sum("n").alias("lm_total"), F.count(F.lit(1)).alias("lm_vocab")
    )
    terms = _doc_terms(df, text_col, id_col)
    logp = F.log(
        (F.coalesce(F.col("n"), F.lit(0)) + 1)
        / (F.col("lm_total") + F.col("lm_vocab")).cast("double")
    )
    return (
        terms.join(F.broadcast(counts), "term", "left")
        .join(F.broadcast(norm))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
            F.round(F.exp(-F.avg(logp)), 4).alias("ppl"),
        )
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams by total occurrence count
    (ties broken by gram ascending, so the result is deterministic) —
    the heavy-hitter table a curation pass reads to pick boilerplate /
    repetition thresholds, and the vocabulary seed for the LM filter.
    Returns (gram, n_occurrences) with ``n_occurrences >= min_count``,
    at most ``k`` rows, sorted (count desc, gram asc). Documents shorter
    than ``n`` tokens contribute nothing.

    Scale shape: explode -> two-phase count (map-side partial agg on the
    gram string) -> global top-k. The top-k is NOT a global sort: Spark
    plans ``orderBy().limit(k)`` as TakeOrderedAndProject — each
    partition keeps a k-row heap and only k rows per partition reach the
    driver-side merge, so the wide exchange is the count's hash
    repartition and nothing else. ``min_count`` prunes the singleton
    long tail (the overwhelming bulk of grams at web scale) before the
    heap pass ever sees it.
    """
    return (
        df.select(F.explode(word_kgrams(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("gram"))
        .limit(k)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 against a bag of query terms —
    the retrieval scorer a curation pipeline uses to pull topic-focused
    subsets out of a web corpus (and the sharper cousin of the
    decontamination gram-match). Returns (id, n_terms_matched, bm25),
    at most ``k`` rows, ordered (bm25 desc, id asc); ``bm25`` is rounded
    to 6 decimals BEFORE the ordering so the cut at rank k is total and
    replayable. idf uses the standard +1-smoothed log form
    ln((N - df + 0.5) / (df + 0.5) + 1), which is never negative.

    Scale shape: the corpus is scanned twice, both narrowly — once for
    per-document lengths (a codegen'd regexp count, no explode) and once
    for the term explode, which is filtered to the query vocabulary
    BEFORE any exchange, so only matching (id, term) pairs shuffle.
    Document frequency and the (N, avgdl) normalizer are tiny aggregates
    that ride broadcasts; the only wide exchange on matched pairs is the
    per-document sum. The final top-k plans as TakeOrderedAndProject —
    a k-row heap per partition, never a global sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    c = F.col(text_col)
    dl = df.select(
        F.col(id_col),
        F.regexp_count(normalize_text(c), F.lit(r"[^ ]+")).cast("long").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        _doc_terms(df, text_col, id_col)
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("doc_freq"))
    idf = F.log((F.col("n_docs") - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5) + 1)
    norm = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    weight = idf * F.col("tf") * (k1 + 1) / norm
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.round(F.sum(weight), 6).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def length_stats(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group length/size distribution table — the calibration input a
    curation pass reads to set its quality and truncation thresholds:
    (group, n_docs, mean, p<pct>...) with exact linear-interpolated
    percentiles.

    Scale shape: ``percentile`` is Spark's exact aggregate — it buffers
    the group's values, which is fine for calibration tables (groups are
    sources/languages, values are scalars) but NOT for billion-row
    single groups; swap in ``percentile_approx`` (t-digest, bounded
    memory) when a group outgrows an executor, at declared accuracy
    loss. One two-phase exchange keyed on the group."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(value_col), 4).alias("mean"),
    ]
    for p in percentiles:
        # conventional names: 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
        name = "p" + f"{p * 100:g}".replace(".", "_")
        aggs.append(F.round(F.percentile(value_col, F.lit(p)), 4).alias(name))
    return df.groupBy(group_col).agg(*aggs)


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    vocab_size: int = 200,
    min_pair: int = 2,
) -> DataFrame:
    """Pointwise mutual information over token co-occurrence within
    documents: (t_a, t_b, n_ab, pmi) for every vocabulary pair that
    co-occurs in >= ``min_pair`` documents, with
    ``pmi = ln(n_ab * N / (n_a * n_b))`` over document counts.

    The classic collocation/association table (Church & Hanks 1990) a
    corpus-analysis pass derives before phrase mining or embedding
    evaluation. The reference pipeline has no corpus-statistics stage;
    this is a large-scale-pipeline extension per the build brief.

    Distributed shape — the naive per-document token self-join is
    quadratic in document length, so the vocabulary is pruned FIRST:
    document frequencies are a map-side-partial count over distinct
    (doc, token) pairs, the top-``vocab_size`` (df desc, token asc —
    deterministic under ties) survivors with df >= ``min_df`` form a
    broadcast vocabulary, and only vocabulary tokens enter the
    pair-generation self-join on doc_id. That bounds per-document
    fanout at vocab_size^2/2 and keeps the only wide exchange the
    final count keyed on the (t_a, t_b) pair — document text never
    rides a shuffle. N rides a broadcast one-row cross join so the
    plan stays lazy end-to-end.
    """
    dt = _doc_terms(df, text_col, id_col).distinct()
    vocab = (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .filter(F.col("df_t") >= min_df)
        .orderBy(F.col("df_t").desc(), F.col("term").asc())
        .limit(vocab_size)
    )
    pruned = dt.join(F.broadcast(vocab), "term").select(id_col, "term", "df_t")
    a = pruned.select(
        F.col(id_col),
        F.col("term").alias("t_a"),
        F.col("df_t").alias("n_a"),
    )
    b = pruned.select(
        F.col(id_col),
        F.col("term").alias("t_b"),
        F.col("df_t").alias("n_b"),
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        a.join(b, id_col)
        .filter(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg(
            F.count(F.lit(1)).alias("n_ab"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .filter(F.col("n_ab") >= min_pair)
        .join(F.broadcast(n_docs))
        .select(
            "t_a",
            "t_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("n_docs").cast("double")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 1000,
) -> DataFrame:
    """Inverted index over the corpus: one row per term with its document
    frequency and a canonical posting string "doc:tf,doc:tf,..." ordered
    by doc id — the retrieval-serving artifact a BM25/boolean layer loads
    (the DataFrame shape of Lucene's term dictionary + postings).

    Heavy-hitter safety at 100 TB: a stopword's posting list is
    corpus-sized, so postings are truncated to the ``max_postings`` most
    relevant entries (tf desc, doc asc — deterministic) BEFORE any
    collect_list materializes, via a per-term window on the (id, term,
    tf) sliver; ``df_t`` still reports the full pre-truncation document
    frequency from its own map-side-partial count. The exchanges carry
    only (id, term, tf) triples — never text — and the per-term list is
    bounded by construction, so no single reducer can be blown up by a
    hot term.
    """
    tf = (
        _doc_terms(df, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_t"))
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col(id_col).asc())
    kept = tf.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_postings
    )
    postings = kept.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col(id_col).alias("d"), F.col("tf")))
                ),
                lambda x: F.concat_ws(":", x["d"], x["tf"]),
            ),
            ",",
        ).alias("postings")
    )
    return postings.join(dfreq, "term").select("term", "df_t", "postings")
