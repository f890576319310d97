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
