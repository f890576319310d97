"""CLI subcommand coverage that pytest can drive in-process (no
spark-submit): the ``dedup`` end-to-end path. The heavier build/query/
export subcommands are covered by the materialize/streaming tests and the
spark-submit verification recipe."""

import json

from yckg_spark.cli import main


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode("overwrite").parquet(path)


def test_cli_dedup_exact(spark, tmp_path, capsys):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "kept")
    _write_docs(
        spark,
        inp,
        [(1, "alpha beta"), (2, "alpha  beta"), (3, "gamma delta"), (4, "unique text")],
    )
    assert main(["dedup", "--input", inp, "--output", out, "--method", "exact"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 1 and 2 normalize to the same text -> one survives
    assert rep["docs_in"] == 4 and rep["docs_kept"] == 3 and rep["removed"] == 1
    assert spark.read.parquet(out).count() == 3


def test_cli_dedup_simhash(spark, tmp_path, capsys):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "kept")
    base = "the quick brown fox jumps over the lazy dog again and again"
    _write_docs(
        spark,
        inp,
        [
            (1, base),
            (2, base + " extra"),  # near-dup of 1
            (3, "completely different words about spark dataframes and shuffles"),
        ],
    )
    assert (
        main(["dedup", "--input", inp, "--output", out, "--method", "simhash",
              "--max-hamming", "3"]) == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # doc 2 folds into the min-id representative 1; doc 3 survives
    assert kept == {1, 3}
    assert rep["neardup_pairs"] >= 1 and rep["docs_kept"] == 2
