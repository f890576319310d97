"""Property-based tests (hypothesis) for the round-5 operators: the Spark
implementations must agree with plain-Python mirrors on arbitrary inputs.
Derandomized so CI runs are reproducible."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

SETTINGS = dict(max_examples=10, deadline=None, derandomize=True)

T0 = datetime(2024, 1, 1)


# ---------------------------------------------------------------------------
# interval_join == naive theta join, any point/interval layout
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(st.integers(0, 400), min_size=1, max_size=25),
    ivs=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 90)),  # (start_min, len_min)
        min_size=1,
        max_size=10,
    ),
    bin_width=st.sampled_from([60, 600, 3600]),
)
@settings(**SETTINGS)
def test_interval_join_matches_python_mirror(spark, pts, ivs, bin_width):
    from yckg_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(i, T0 + timedelta(minutes=m)) for i, m in enumerate(pts)],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (100 + j, T0 + timedelta(minutes=s), T0 + timedelta(minutes=s + ln))
            for j, (s, ln) in enumerate(ivs)
        ],
        ["iid", "start", "end"],
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, bin_width=bin_width).collect()
    }
    want = {
        (i, 100 + j)
        for i, m in enumerate(pts)
        for j, (s, ln) in enumerate(ivs)
        if s <= m < s + ln
    }
    assert got == want


# ---------------------------------------------------------------------------
# pmi_pairs == plain-Python mirror (df counts, vocab cut, pair counts, ln)
# ---------------------------------------------------------------------------


def _pmi_mirror(texts, min_df, vocab_size, min_pair):
    docs = [set(t.split()) - {""} for t in texts]
    df_t = Counter(t for d in docs for t in d)
    # NB: the operator filters df >= min_df BEFORE the top-V cut
    eligible = sorted(
        ((t, n) for t, n in df_t.items() if n >= min_df),
        key=lambda kv: (-kv[1], kv[0]),
    )[:vocab_size]
    vocab = dict(eligible)
    pair_n = Counter()
    for d in docs:
        kept = sorted(t for t in d if t in vocab)
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                pair_n[(kept[i], kept[j])] += 1
    n_docs = len(texts)
    return {
        p: (n, round(math.log(n * float(n_docs) / (vocab[p[0]] * vocab[p[1]])), 6))
        for p, n in pair_n.items()
        if n >= min_pair
    }


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "green", "sky", "car", "sun"]),
            min_size=0,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=15,
    ),
    min_df=st.integers(1, 3),
    vocab_size=st.integers(1, 6),
    min_pair=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_pmi_pairs_matches_python_mirror(spark, texts, min_df, vocab_size, min_pair):
    from yckg_spark.operators.text_analysis import pmi_pairs

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["t_a"], r["t_b"]): (r["n_ab"], r["pmi"])
        for r in pmi_pairs(
            df, min_df=min_df, vocab_size=vocab_size, min_pair=min_pair
        ).collect()
    }
    assert got == _pmi_mirror(texts, min_df, vocab_size, min_pair)


# ---------------------------------------------------------------------------
# source_overlap == plain-Python set mirror
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 6)),  # (source, text idx)
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_source_overlap_matches_python_mirror(spark, rows):
    from yckg_spark.operators.dedup import source_overlap

    data = [(i, f"text {t}", f"s{s}") for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(data, ["doc_id", "text", "source"])
    got = {
        (r["source_a"], r["source_b"]): (r["n_a"], r["n_b"], r["n_common"], r["jaccard"])
        for r in source_overlap(df).collect()
    }
    sets: dict[str, set] = {}
    for _, (s, t) in enumerate(rows):
        sets.setdefault(f"s{s}", set()).add(t)
    want = {}
    srcs = sorted(sets)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            want[(a, b)] = (len(sets[a]), len(sets[b]), inter, round(inter / union, 6))
    assert got == want


# ---------------------------------------------------------------------------
# inverted_index == plain-Python mirror (tf, df, truncation rule)
# ---------------------------------------------------------------------------


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    cap=st.integers(1, 4),
)
@settings(**SETTINGS)
def test_inverted_index_matches_python_mirror(spark, texts, cap):
    from yckg_spark.operators.text_analysis import inverted_index

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["term"]: (r["df_t"], r["postings"])
        for r in inverted_index(df, max_postings=cap).collect()
    }
    tf: dict[str, Counter] = {}
    for i, t in enumerate(texts):
        for w in t.split():
            if w:
                tf.setdefault(w, Counter())[i] += 1
    want = {}
    for term, counts in tf.items():
        kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
        postings = ",".join(f"{d}:{n}" for d, n in sorted(kept))
        want[term] = (len(counts), postings)
    assert got == want
