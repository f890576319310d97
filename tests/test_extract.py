"""Extraction invariant tests: byte-identical text per url, across runs and
parallelism levels (the north-star per-row invariant)."""

from fixtures.generate import default_fixture
from yckg_spark.operators.extract import extract_text_py, with_extracted_text


def test_extract_pure_function_golden():
    html = (
        b'<html><head><script src="x.js"></script></head><body><nav>n</nav>'
        b'<script type="application/ld+json">{"a": 1}</script>'
        b"<footer>f</footer></body></html>"
    )
    assert extract_text_py(html) == '{"a": 1}'
    assert extract_text_py(html) == extract_text_py(html)


def test_extract_boilerplate_fallback():
    html = b"<html><body><nav>Menu</nav><p>Hello   <b>world</b> &amp; co</p><footer>x</footer></body></html>"
    assert extract_text_py(html) == "Hello world & co"


def test_extract_matches_golden_text_column(spark, smoke_fixture_dir):
    """Every fixture page: extracted text == the stored golden `text`."""
    from pyspark.sql import functions as F

    from yckg_spark.sources.web_pages import read_web_pages

    pages = read_web_pages(spark, f"{smoke_fixture_dir}/web_pages.parquet")
    mismatches = (
        with_extracted_text(pages)
        .filter(~F.col("extracted_text").eqNullSafe(F.col("text")))
        .count()
    )
    assert mismatches == 0


def test_extract_identical_across_parallelism(spark, smoke_fixture_dir):
    """Same outputs at 1 partition and at 16 partitions."""
    from yckg_spark.sources.web_pages import read_web_pages

    pages = read_web_pages(spark, f"{smoke_fixture_dir}/web_pages.parquet")
    a = {
        (r["url"], r["extracted_text"])
        for r in with_extracted_text(pages.repartition(1)).select("url", "extracted_text").collect()
    }
    b = {
        (r["url"], r["extracted_text"])
        for r in with_extracted_text(pages.repartition(16)).select("url", "extracted_text").collect()
    }
    assert a == b
