"""Direct unit coverage for the text-analysis curation operators (they are
also oracle-checked end-to-end via __spark_entry__), including a regression
for ``fingerprint``: passing ``F.xxhash64`` itself as the higher-order
lambda crashed with UNSUPPORTED_PARAM_TYPE_FOR_HIGHER_ORDER_FUNCTION
(*cols-signature builtins cannot be introspected as lambdas) — it must be
wrapped as ``lambda s: F.xxhash64(s)``."""

from yckg_spark.operators.text_analysis import fingerprint, lang_id, quality_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_fingerprint_schema_and_whitespace_invariance(spark):
    df = _docs(
        spark,
        [
            (1, "Hello  World foo bar baz qux"),
            (2, "hello world foo bar baz qux"),  # same after normalization
            (3, "entirely different words about other topics here"),
            (4, "shorty"),  # < 4 tokens -> whole-text shingle fallback
        ],
    )
    out = fingerprint(df)
    assert out.columns == ["doc_id", "md5_fp", "rolling_min_fp"]
    rows = {r["doc_id"]: r for r in out.collect()}
    # normalization: case/whitespace variants share both fingerprints
    assert rows[1]["md5_fp"] == rows[2]["md5_fp"]
    assert rows[1]["rolling_min_fp"] == rows[2]["rolling_min_fp"]
    assert rows[3]["md5_fp"] != rows[1]["md5_fp"]
    assert all(r["rolling_min_fp"] is not None for r in rows.values())


def test_fingerprint_deterministic_across_runs(spark):
    df = _docs(spark, [(i, f"some stable text number {i} with words") for i in range(8)])
    a = sorted(map(tuple, fingerprint(df).collect()))
    b = sorted(map(tuple, fingerprint(df).collect()))
    assert a == b


def test_quality_then_lang_id_composes(spark):
    df = _docs(
        spark,
        [(1, "The quick brown fox and the lazy dog were in the garden of a house.")],
    )
    out = lang_id(quality_score(df)).collect()[0]
    assert out["lang_pred"] == "en"
    assert out["n_tokens"] == 15
    assert out["quality"] is not None


def test_tfidf_top_terms_hand_checked(spark):
    """4-doc corpus with a hand-computable answer: the corpus-universal
    term gets idf 0 and never outranks a distinctive term."""
    import math

    from yckg_spark.operators.text_analysis import tfidf_top_terms

    df = _docs(
        spark,
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "cherry cherry cherry common"),
            (3, "date common"),
        ],
    )
    out = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in tfidf_top_terms(df, k=2).collect()
    }
    # doc 0: apple tf=2 df=1 -> 2*ln(4); banana tf=1 df=2 -> ln(2); common idf=0
    assert out[(0, 1)] == ("apple", round(2 * math.log(4), 6))
    assert out[(0, 2)] == ("banana", round(math.log(2), 6))
    # doc 3: date tf=1 df=1 -> ln(4) beats common (0); rank-2 is common
    assert out[(3, 1)] == ("date", round(math.log(4), 6))
    assert out[(3, 2)] == ("common", 0.0)
    # every doc emits exactly k rows when it has >= k distinct terms
    assert len(out) == 8


def test_tfidf_rank_deterministic_on_ties(spark):
    """Equal tfidf -> rank by term ascending, stable across runs."""
    from yckg_spark.operators.text_analysis import tfidf_top_terms

    # zebra and apple both tf=1 df=1 in doc 0 -> tie broken alphabetically
    df = _docs(spark, [(0, "zebra apple"), (1, "filler words")])
    rows = {r["rank"]: r["term"]
            for r in tfidf_top_terms(df, k=2).filter("doc_id = 0").collect()}
    assert rows == {1: "apple", 2: "zebra"}


def test_lm_score_hand_checked(spark):
    """Add-one smoothed unigram log-probs match a by-hand computation,
    including an unseen term at scoring time."""
    import math

    from yckg_spark.operators.text_analysis import lm_score, lm_train_unigram

    train = _docs(spark, [(0, "a a b"), (1, "b c")])
    counts = lm_train_unigram(train)  # a:2 b:2 c:1, total=5, vocab=3
    assert {(r["term"], r["n"]) for r in counts.collect()} == {
        ("a", 2), ("b", 2), ("c", 1)
    }
    target = _docs(spark, [(7, "a zzz")])  # zzz unseen -> count 0
    row = lm_score(target, counts).collect()[0]
    expect = (math.log(3 / 8) + math.log(1 / 8)) / 2
    assert row["n_tokens"] == 2
    assert row["avg_logprob"] == round(expect, 6)
    assert row["ppl"] == round(math.exp(-expect), 4)


def test_lm_score_drops_tokenless_docs(spark):
    from yckg_spark.operators.text_analysis import lm_score, lm_train_unigram

    train = _docs(spark, [(0, "x y")])
    target = _docs(spark, [(1, "x"), (2, "   "), (3, "")])
    out = lm_score(target, lm_train_unigram(train))
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_top_ngrams_counts_and_ordering(spark):
    """Occurrence-counted (not doc-counted), min_count pruned, ties by
    gram ascending, k-capped."""
    from yckg_spark.operators.text_analysis import top_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c d"), (3, "x")],
        "doc_id long, text string",
    )
    rows = top_ngrams(df, n=2, k=10).collect()
    # "a b": 3x in doc1 + 1x in doc2 = 4; "b a": 2x; everything else 1x
    assert [(r["gram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 4), ("b a", 2),
    ]
    capped = top_ngrams(df, n=2, k=1, min_count=1).collect()
    assert len(capped) == 1 and capped[0]["gram"] == "a b"


def test_length_stats_exact_percentiles(spark):
    """Hand-computed interpolated percentiles over a tiny group."""
    from yckg_spark.operators.text_analysis import length_stats

    df = spark.createDataFrame(
        [("a", v) for v in [10, 20, 30, 40]] + [("b", 7)],
        "source string, n_chars long",
    )
    rows = {r["source"]: r for r in
            length_stats(df, percentiles=(0.5, 0.9)).collect()}
    assert rows["a"]["n_docs"] == 4 and rows["a"]["mean"] == 25.0
    # linear interpolation: p50 of [10,20,30,40] = 25, p90 = 37
    assert rows["a"]["p50"] == 25.0 and rows["a"]["p90"] == 37.0
    assert rows["b"]["p50"] == rows["b"]["p90"] == 7.0


def _bm25_py(texts, query, k1=1.2, b=0.75):
    """Pure-Python BM25 mirror (same formula shape as the operator)."""
    from math import log

    toks = {i: t.lower().split() for i, t in texts}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = float(len(texts))
    avgdl = sum(dl.values()) / n
    dfreq = {q: sum(1 for ts in toks.values() if q in ts) for q in query}
    out = {}
    for i, ts in toks.items():
        score, matched = 0.0, 0
        for q in query:
            tf = float(ts.count(q))
            if not tf:
                continue
            matched += 1
            idf = log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1)
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
        if matched:
            out[i] = (matched, round(score, 6))
    return out


def test_bm25_matches_python_mirror(spark):
    from yckg_spark.operators.text_analysis import bm25_topk

    texts = [
        (1, "spark merge spark join"),
        (2, "merge merge merge sort sort sort sort sort"),
        (3, "vector spark"),
        (4, "table scan only"),
        (5, "spark spark spark spark"),
    ]
    query = ["spark", "merge", "vector"]
    got = {
        r.doc_id: (r.n_terms_matched, r.bm25)
        for r in bm25_topk(_docs(spark, texts), query, k=10).collect()
    }
    assert got == _bm25_py(texts, query)
    assert 4 not in got  # no query term -> no row


def test_bm25_topk_cut_and_validation(spark):
    import pytest as _pytest

    from yckg_spark.operators.text_analysis import bm25_topk

    # identical docs tie on score; the k-cut must be by ascending id
    texts = [(i, "spark alpha beta") for i in range(6)]
    rows = bm25_topk(_docs(spark, texts), ["spark"], k=3).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]
    with _pytest.raises(ValueError):
        bm25_topk(_docs(spark, texts), [])


def test_bm25_plans_take_ordered(spark):
    from yckg_spark.operators.text_analysis import bm25_topk

    plan = bm25_topk(
        _docs(spark, [(1, "spark")]), ["spark"], k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# -- pmi_pairs ----------------------------------------------------------------


def test_pmi_pairs_hand_computed(spark):
    from math import log

    from yckg_spark.operators.text_analysis import pmi_pairs

    # 4 docs; "red blue" co-occur twice, "red green" once (below min_pair)
    df = spark.createDataFrame(
        [
            (1, "red blue car"),
            (2, "red blue sky"),
            (3, "red green"),
            (4, "blue green"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["t_a"], r["t_b"]): (r["n_ab"], r["pmi"])
        for r in pmi_pairs(df, min_df=2, min_pair=2).collect()
    }
    # df: red=3 blue=3 green=2; car/sky have df 1 -> pruned from vocab
    assert ("blue", "red") in out
    n_ab, pmi = out[("blue", "red")]
    assert n_ab == 2
    assert pmi == round(log(2 * 4 / (3 * 3)), 6)
    # green co-occurs once with each of red/blue -> below min_pair
    assert ("green", "red") not in out and ("blue", "green") not in out


def test_pmi_pairs_vocab_cap_is_deterministic(spark):
    from yckg_spark.operators.text_analysis import pmi_pairs

    # every token has identical df -> the cap must cut lexicographically
    df = spark.createDataFrame(
        [(i, " ".join(f"t{j:02d}" for j in range(10))) for i in range(3)],
        ["doc_id", "text"],
    )
    out = pmi_pairs(df, min_df=2, vocab_size=4, min_pair=2).collect()
    toks = {r["t_a"] for r in out} | {r["t_b"] for r in out}
    assert toks == {"t00", "t01", "t02", "t03"}
    # all pairs co-occur in all 3 docs of 3 total -> pmi = ln(3*3/(3*3)) = 0
    assert all(r["pmi"] == 0.0 and r["n_ab"] == 3 for r in out)
    assert len(out) == 6  # C(4,2)


# -- inverted_index -----------------------------------------------------------


def test_inverted_index_postings_and_truncation(spark):
    from yckg_spark.operators.text_analysis import inverted_index

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "apple banana banana"),
        ],
        ["doc_id", "text"],
    )
    out = {r["term"]: (r["df_t"], r["postings"]) for r in inverted_index(df).collect()}
    # postings ordered by doc id, tf counted per doc
    assert out["apple"] == (3, "1:2,2:1,3:1")
    assert out["banana"] == (2, "1:1,3:2")
    assert out["cherry"] == (1, "2:1")
    # truncation: keep the max_postings highest-tf docs (ties -> low id),
    # df_t still reports the FULL document frequency
    trunc = {
        r["term"]: (r["df_t"], r["postings"])
        for r in inverted_index(df, max_postings=1).collect()
    }
    assert trunc["apple"] == (3, "1:2")   # tf 2 beats the tf-1 docs
    assert trunc["banana"] == (2, "3:2")  # doc 3 has tf 2
    assert trunc["cherry"] == (1, "2:1")
