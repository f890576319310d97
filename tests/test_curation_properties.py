"""Property-based tests (hypothesis) for the curation operators: the Spark
implementations must agree with plain-Python mirrors on arbitrary texts,
and scrubbed output must never retain a PII match. Derandomized so CI runs
are reproducible; one Spark job per example keeps the suite fast."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from yckg_spark.operators.curation import (
    PII_PATTERNS,
    decontaminate,
    pii_scrub,
    repetition_signals,
)

SETTINGS = dict(max_examples=12, deadline=None, derandomize=True)

# alphabet chosen to exercise normalization (multi-space), repetition
# (tiny word pool), and the PII character classes
TEXT = st.lists(
    st.sampled_from(["aa", "bb", "cc", "a1", "x@y.co", "1.2.3.4", "+1-222-3333", " "]),
    min_size=0,
    max_size=30,
).map(" ".join)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _toks(s: str) -> list[str]:
    return _norm(s).split(" ")


def _shingles(s: str, k: int) -> list[str]:
    t = _toks(s)
    if len(t) >= k:
        return [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]
    return [_norm(s)]


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_repetition_signals_match_python_mirror(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert len(rows) == len(texts)
    for i, s in enumerate(texts):
        t = _toks(s)
        dup = 1.0 - len(set(t)) / len(t)
        # tolerance covers HALF_UP (Spark) vs banker's rounding at 1e-4
        assert rows[i]["dup_word_frac"] == pytest.approx(dup, abs=6e-5)
        for n in (2, 3):
            gs = _shingles(s, n)
            frac = Counter(gs).most_common(1)[0][1] / len(gs)
            assert rows[i][f"top{n}gram_frac"] == pytest.approx(frac, abs=6e-5), (s, n)
        assert 0.0 <= rows[i]["dup_word_frac"] <= 1.0
        assert rows[i]["top2gram_frac"] >= rows[i]["top3gram_frac"] - 1.0  # both bounded


@given(texts=st.lists(TEXT, min_size=1, max_size=6), bench=st.lists(TEXT, min_size=1, max_size=3))
@settings(**SETTINGS)
def test_decontaminate_matches_python_mirror(spark, texts, bench):
    n = 3
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_hit_grams"] for r in decontaminate(docs, bdf, n=n).collect()}
    bgrams = set()
    for b in bench:
        if len(_toks(b)) >= n:
            bgrams |= set(_shingles(b, n))
    want = {}
    for i, s in enumerate(texts):
        if len(_toks(s)) < n:
            continue
        hits = len(set(_shingles(s, n)) & bgrams)
        if hits:
            want[i] = hits
    assert got == want


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_pii_scrub_leaves_no_residual_match(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = pii_scrub(df).collect()
    for r in rows:
        for name, pat, _tok in PII_PATTERNS:
            assert re.search(pat, r["text_scrubbed"]) is None, (name, r["text_scrubbed"])
            # counts mirror Python's regex engine on the raw text
        assert r["n_email"] == len(re.findall(PII_PATTERNS[0][1], r["text"]))


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_dup_span_stats_match_python_mirror(spark, texts):
    from collections import defaultdict

    from yckg_spark.operators.curation import dup_span_stats

    k = 2
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dup_span_stats(df, k=k).collect()}
    assert len(rows) == len(texts)
    # python mirror: strict k-grams (no short-doc fallback), dup iff the
    # gram string occurs in >= 2 distinct docs, positions counted
    carriers = defaultdict(set)
    grams_of = {}
    for i, s in enumerate(texts):
        t = _toks(s)
        gs = [" ".join(t[j:j + k]) for j in range(len(t) - k + 1)] if len(t) >= k else []
        grams_of[i] = gs
        for g in set(gs):
            carriers[g].add(i)
    for i in rows:
        gs = grams_of[i]
        dup = sum(1 for g in gs if len(carriers[g]) >= 2)
        assert rows[i]["n_grams"] == len(gs)
        assert rows[i]["n_dup_grams"] == dup
        want_frac = dup / len(gs) if gs else 0.0
        assert rows[i]["dup_span_frac"] == pytest.approx(want_frac)


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_span_dedup_matches_python_mirror(spark, texts):
    from collections import defaultdict

    from yckg_spark.operators.curation import span_dedup

    k = 2
    rows = {
        r["doc_id"]: r
        for r in span_dedup(
            spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string"),
            k=k,
        ).collect()
    }
    carriers = defaultdict(set)
    toks_of = {i: _toks(s) for i, s in enumerate(texts)}
    for i, t in toks_of.items():
        for j in range(len(t) - k + 1):
            carriers[" ".join(t[j:j + k])].add(i)
    for i, t in toks_of.items():
        covered = set()
        for j in range(len(t) - k + 1):
            if len(carriers[" ".join(t[j:j + k])]) >= 2:
                covered.update(range(j, j + k))
        kept = [tok for j, tok in enumerate(t) if j not in covered]
        assert rows[i]["n_tokens"] == len(t)
        assert rows[i]["n_kept"] == len(kept)
        assert rows[i]["text_deduped"] == " ".join(kept)
