"""Property-based tests (hypothesis) for the selection operators: the
Spark implementations must agree with plain-Python mirrors on arbitrary
inputs, and the sampling/packing invariants must hold for any corpus
shape. Derandomized so CI runs are reproducible."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from yckg_spark.operators.selection import (
    _rate_threshold,
    line_filter,
    pack_shards,
    source_cap,
    stratified_sample,
)

SETTINGS = dict(max_examples=12, deadline=None, derandomize=True)

WORD = st.sampled_from(["aa", "bb", "cc", "dd", "javascript", "{x}", ""])
LINE = st.lists(WORD, min_size=0, max_size=6).map(" ".join)
TEXT = st.lists(LINE, min_size=1, max_size=6).map("\n".join)


def _keep_decision(doc_id: int, salt: str, rate: float) -> bool:
    key = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8]
    return key < _rate_threshold(rate)


@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=25, unique=True),
    rate=st.floats(0.0, 1.0),
    salt=st.sampled_from(["", "e2"]),
)
@settings(**SETTINGS)
def test_stratified_sample_matches_python_md5_mirror(spark, ids, rate, salt):
    df = spark.createDataFrame([(i, "en") for i in ids], "doc_id long, lang string")
    got = {r.doc_id for r in stratified_sample(df, {"en": rate}, salt=salt).collect()}
    want = {i for i in ids if _keep_decision(i, salt, rate)}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 3)),  # (order_val, source)
        min_size=1,
        max_size=20,
    ),
    cap=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_source_cap_matches_python_mirror(spark, rows, cap):
    data = [(i, f"s{src}", val) for i, (val, src) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, n_chars long")
    got = sorted(r.doc_id for r in source_cap(df, cap=cap).collect())
    want = []
    for src in {d[1] for d in data}:
        grp = sorted(
            (d for d in data if d[1] == src), key=lambda d: (-d[2], d[0])
        )[:cap]
        want += [d[0] for d in grp]
    assert got == sorted(want)


@given(
    toks=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    budget=st.integers(1, 60),
    n_buckets=st.integers(1, 9),
)
@settings(**SETTINGS)
def test_pack_shards_matches_sequential_mirror(spark, toks, budget, n_buckets):
    # sparse, shuffled ids: bucketing must not depend on density or order
    data = [(i * 13 + 7, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(data, "doc_id long, toks long")
    got = {
        r.doc_id: r.shard
        for r in pack_shards(
            df, budget=budget, tokens_col="toks", n_buckets=n_buckets
        ).collect()
    }
    acc, want = 0, {}
    for doc_id, n in sorted(data):
        want[doc_id] = acc // budget
        acc += n
    assert got == want


@given(text=TEXT, min_words=st.integers(0, 4))
@settings(**SETTINGS)
def test_line_filter_matches_python_mirror_and_is_idempotent(spark, text, min_words):
    banned = ("javascript", "{")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = line_filter(df, min_words=min_words, banned=banned).collect()[0]
    lines = text.split("\n")
    kept = [
        ln
        for ln in lines
        if len(re.findall(r"[^ ]+", ln)) >= min_words
        and not any(b in ln.lower() for b in banned)
    ]
    assert (r.n_lines, r.n_kept, r.text_clean) == (len(lines), len(kept), "\n".join(kept))
    # filtering already-clean text must keep every line (unless the clean
    # text is empty, which splits back to one empty line)
    df2 = spark.createDataFrame([(1, r.text_clean)], "doc_id long, text string")
    r2 = line_filter(df2, min_words=min_words, banned=banned).collect()[0]
    if r.text_clean:
        assert r2.n_kept == r2.n_lines == r.n_kept
        assert r2.text_clean == r.text_clean


@given(
    texts=st.lists(TEXT, min_size=1, max_size=6),
    chunk=st.integers(min_value=2, max_value=8),
    overlap=st.integers(min_value=0, max_value=3),
)
@settings(**SETTINGS)
def test_chunk_docs_matches_python_mirror(spark, texts, chunk, overlap):
    from yckg_spark.operators.selection import chunk_docs

    overlap = min(overlap, chunk - 1)
    step = chunk - overlap
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
         for r in chunk_docs(df, chunk, overlap=overlap).collect())
    )
    want = []
    for i, s in enumerate(texts):
        t = re.sub(r"\s+", " ", s.lower()).strip().split(" ")
        for ci, start in enumerate(
            range(0, max(len(t) - 1 - overlap, 0) + 1, step)
        ):
            w = t[start:start + chunk]
            want.append((i, ci, len(w), " ".join(w)))
    assert got == sorted(want)
