"""Tests for the selection/mixing/packing operators (selection.py)."""

import pytest
from pyspark.sql import functions as F

from yckg_spark.operators.selection import (
    line_filter,
    pack_shards,
    source_cap,
    stratified_sample,
    word_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 9)),
         "en" if i % 3 else "de", f"src{i % 4}", 10 + (i * 37) % 90)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).cache()


# -- stratified_sample -------------------------------------------------------


def test_stratified_sample_rates_and_determinism(docs):
    out = stratified_sample(docs, {"en": 0.5, "de": 0.1})
    again = stratified_sample(docs, {"en": 0.5, "de": 0.1})
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert ids == sorted(r.doc_id for r in again.select("doc_id").collect())
    by_lang = dict(out.groupBy("lang").count().collect())
    n_en = docs.filter("lang = 'en'").count()
    # Bernoulli(0.5) over ~133 docs: 3-sigma band
    assert abs(by_lang.get("en", 0) - 0.5 * n_en) < 3 * (0.25 * n_en) ** 0.5 + 1


def test_stratified_sample_drops_unlisted_and_rate_edges(docs):
    assert stratified_sample(docs, {"en": 1.0}).filter("lang = 'de'").count() == 0
    assert stratified_sample(docs, {"en": 1.0}).count() == docs.filter("lang='en'").count()
    assert stratified_sample(docs, {"en": 0.0}).count() == 0


def test_stratified_sample_salt_redraws_independently(docs):
    a = {r.doc_id for r in stratified_sample(docs, {"en": 0.5}).collect()}
    b = {r.doc_id for r in stratified_sample(docs, {"en": 0.5}, salt="epoch2").collect()}
    assert a != b  # independent draw
    with pytest.raises(ValueError):
        stratified_sample(docs, {})


def test_stratified_sample_is_partitioning_invariant(docs):
    a = {r.doc_id for r in stratified_sample(docs, {"en": 0.3, "de": 0.7}).collect()}
    b = {
        r.doc_id
        for r in stratified_sample(docs.repartition(17), {"en": 0.3, "de": 0.7}).collect()
    }
    assert a == b


# -- source_cap ---------------------------------------------------------------


def test_source_cap_keeps_top_k_per_source(docs):
    out = source_cap(docs, cap=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    all_rows = docs.collect()
    for src, rows in by_src.items():
        assert len(rows) == 5
        want = sorted(
            (r for r in all_rows if r.source == src),
            key=lambda r: (-r.n_chars, r.doc_id),
        )[:5]
        assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in want)
        assert sorted(r.rank for r in rows) == [1, 2, 3, 4, 5]


def test_source_cap_broadcast_keep_matches(docs):
    a = sorted(r.doc_id for r in source_cap(docs, cap=3).collect())
    b = sorted(r.doc_id for r in source_cap(docs, cap=3, broadcast_keep=True).collect())
    assert a == b


# -- pack_shards --------------------------------------------------------------


def _expected_shards(rows, budget):
    acc, out = 0, {}
    for doc_id, n in sorted(rows):
        out[doc_id] = acc // budget
        acc += n
    return out


def test_pack_shards_matches_sequential_oracle(docs):
    out = pack_shards(docs, budget=100, n_buckets=7).collect()
    toks = [(r.doc_id, r.n_tokens) for r in out]
    want = _expected_shards(toks, 100)
    assert {r.doc_id: r.shard for r in out} == want
    # shards are contiguous from 0
    shards = sorted({r.shard for r in out})
    assert shards == list(range(len(shards)))


def test_pack_shards_invariant_to_bucketing_and_partitioning(docs):
    a = {(r.doc_id, r.shard) for r in pack_shards(docs, budget=64, n_buckets=3).collect()}
    b = {
        (r.doc_id, r.shard)
        for r in pack_shards(docs.repartition(13), budget=64, n_buckets=29).collect()
    }
    assert a == b


def test_pack_shards_tokens_col_and_sparse_ids(spark):
    df = spark.createDataFrame(
        [(10, 5), (1000, 5), (1000000, 5), (1000003, 5)], "doc_id long, toks long"
    )
    out = {r.doc_id: (r.n_tokens, r.shard) for r in
           pack_shards(df, budget=10, tokens_col="toks", n_buckets=4).collect()}
    assert out == {10: (5, 0), 1000: (5, 0), 1000000: (5, 1), 1000003: (5, 1)}


def test_pack_shards_empty_and_oversized(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_shards(empty, budget=10).count() == 0
    big = spark.createDataFrame(
        [(0, "a " * 50), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    out = {r.doc_id: r.shard for r in pack_shards(big, budget=10).collect()}
    # doc0 starts shard 0 (50 tokens), doc1 starts at offset 50 -> shard 5
    assert out == {0: 0, 1: 5, 2: 5}


def test_word_count_edges(spark):
    df = spark.createDataFrame([("",), ("  ",), ("a  b",), (None,)], "t string")
    got = [r[0] for r in df.select(word_count(F.col("t"))).collect()]
    assert got == [0, 0, 2, 0]


# -- line_filter --------------------------------------------------------------


def test_line_filter_rules(spark):
    text = "keep this line here\nno\nthis has JavaScript inside yes\nanother good line\n{ bad }"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = line_filter(df, min_words=3).collect()[0]
    assert (r.n_lines, r.n_kept) == (5, 2)
    assert r.text_clean == "keep this line here\nanother good line"


def test_line_filter_all_dropped_and_empty(spark):
    df = spark.createDataFrame([(1, "no\nway"), (2, "")], "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_kept, r.text_clean) for r in line_filter(df).collect()}
    assert got == {1: (2, 0, ""), 2: (1, 0, "")}


def test_chunk_docs_windows_and_overlap(spark):
    """10 tokens, chunk 4, overlap 1 (step 3): starts bounded at
    n-1-overlap = 8, so [0, 3, 6] — every token appears, consecutive
    chunks share exactly one token, and no trailing window repeats
    tokens the previous chunk already covered (a start at 9 would emit
    the pure-suffix duplicate 't9')."""
    from yckg_spark.operators.selection import chunk_docs

    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    rows = sorted(chunk_docs(df, 4, overlap=1).collect(),
                  key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in rows] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4]
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]


def test_chunk_docs_short_doc_and_validation(spark):
    import pytest

    from yckg_spark.operators.selection import chunk_docs

    df = spark.createDataFrame([(1, "just two")], "doc_id long, text string")
    rows = chunk_docs(df, 8, overlap=2).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "just two" and rows[0]["n_tokens"] == 2
    with pytest.raises(ValueError):
        chunk_docs(df, 4, overlap=4)


def test_chunk_docs_no_overlap_partitions_exactly(spark):
    """overlap=0 tiles the doc: concatenating chunks reconstructs the
    normalized text and token counts sum to the doc length."""
    from yckg_spark.operators.selection import chunk_docs

    text = " ".join(f"w{i}" for i in range(11))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted(chunk_docs(df, 4).collect(), key=lambda r: r["chunk_id"])
    assert " ".join(r["chunk_text"] for r in rows) == text
    assert sum(r["n_tokens"] for r in rows) == 11


# -- mixture_sample ----------------------------------------------------------


def _mixture_py(rows, targets, weight_idx=4):
    """Pure-Python mirror of mixture_sample's rate arithmetic + md5 draw."""
    import hashlib

    sums = {}
    for r in rows:
        if r[3] in targets:
            sums[r[3]] = sums.get(r[3], 0.0) + float(r[weight_idx])
    lam = min(sums[s] / targets[s] for s in sums)
    kept = set()
    for r in rows:
        s = r[3]
        if s not in sums:
            continue
        rate = lam * targets[s] / sums[s]
        thr = "g" if rate >= 1.0 else format(int(rate * 2**32), "08x")
        if hashlib.md5(f"{r[0]}:".encode()).hexdigest()[:8] < thr:
            kept.add(r[0])
    return kept


def test_mixture_sample_matches_python_mirror(docs):
    from yckg_spark.operators.selection import mixture_sample

    targets = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = mixture_sample(docs, targets, weight_col="n_chars")
    kept = {r.doc_id for r in out.collect()}
    assert kept == _mixture_py(docs.collect(), targets)
    assert kept  # non-degenerate draw
    # unlisted strata are dropped entirely
    assert out.filter(F.col("source") == "src3").count() == 0
    # row-deterministic: invariant under repartitioning
    kept2 = {r.doc_id for r in mixture_sample(docs.repartition(7), targets, weight_col="n_chars").collect()}
    assert kept2 == kept


def test_mixture_sample_binding_stratum_keeps_all(docs):
    from yckg_spark.operators.selection import mixture_sample

    out = mixture_sample(docs, {"src0": 1.0})
    assert out.count() == docs.filter(F.col("source") == "src0").count()


def test_mixture_sample_doc_count_weights_and_validation(docs):
    import pytest as _pytest

    from yckg_spark.operators.selection import mixture_sample

    # weight_col=None weighs by document count
    kept = {r.doc_id for r in mixture_sample(docs, {"src0": 0.6, "src1": 0.4}).collect()}
    rows = [(r.doc_id, None, None, r.source, 1) for r in docs.collect()]
    assert kept == _mixture_py(rows, {"src0": 0.6, "src1": 0.4})
    with _pytest.raises(ValueError):
        mixture_sample(docs, {})
    with _pytest.raises(ValueError):
        mixture_sample(docs, {"src0": 0.0})


# -- quality_buckets ---------------------------------------------------------


def test_quality_buckets_rank_equal_tiers_and_monotone(docs):
    from yckg_spark.operators.selection import quality_buckets

    out = quality_buckets(docs).collect()
    assert len(out) == docs.count()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rows:
            sizes[r["bucket"]] += 1
        # ntile: tier sizes differ by at most one, earlier tiers larger
        assert max(sizes.values()) - min(sizes.values()) <= 1
        assert sizes["head"] >= sizes["middle"] >= sizes["tail"]
        # quality ordering: every head doc >= every middle >= every tail
        qs = {b: [r["quality"] for r in rows if r["bucket"] == b] for b in sizes}
        if qs["head"] and qs["middle"]:
            assert min(qs["head"]) >= max(qs["middle"])
        if qs["middle"] and qs["tail"]:
            assert min(qs["middle"]) >= max(qs["tail"])


def test_quality_buckets_threshold_monotone_and_total(docs):
    from yckg_spark.operators.selection import quality_buckets

    out = quality_buckets(docs, by="threshold").collect()
    assert len(out) == docs.count()
    assert {r["bucket"] for r in out} <= {"head", "middle", "tail"}
    rank = {"head": 0, "middle": 1, "tail": 2}
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        # threshold cuts preserve the quality order: a higher-quality doc
        # never lands in a strictly worse bucket than a lower-quality one
        rows = sorted(rows, key=lambda r: (-r["quality"], r["doc_id"]))
        tiers = [rank[r["bucket"]] for r in rows]
        assert tiers == sorted(tiers)


def test_quality_buckets_rejects_unknown_strategy(docs):
    import pytest as _pytest

    from yckg_spark.operators.selection import quality_buckets

    with _pytest.raises(ValueError):
        quality_buckets(docs, by="nope")


def test_quality_buckets_requires_two_labels(docs):
    import pytest as _pytest

    from yckg_spark.operators.selection import quality_buckets

    with _pytest.raises(ValueError):
        quality_buckets(docs, labels=("only",))
