"""The primary source: a table of Common-Crawl-style web pages
(url, warc_ts, html, text, lang) → five typed record DataFrames.

Production target is an Iceberg table (``spark.read.table``); the sandbox has
no Iceberg runtime jar, so the reader falls back to parquet with the same
schema — the pipeline above this function is identical either way. Column
pruning matters enormously here: the ``html`` binary column is only read when
extraction actually runs; every downstream stage selects away from it
immediately so the scan's ReadSchema stays narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yckg_spark import schemas
from yckg_spark.operators.extract import classify_domain, with_extracted_text

DOMAINS = ("business", "user", "review", "tip", "checkin")

_RECORD_SCHEMAS = {
    "business": schemas.BUSINESS,
    "user": schemas.USER,
    "review": schemas.REVIEW,
    "tip": schemas.TIP,
    "checkin": schemas.CHECKIN,
}


def read_web_pages(spark: SparkSession, source: str) -> DataFrame:
    """``source`` is a table name (Iceberg catalog) or a parquet path."""
    if "/" in source or source.endswith(".parquet"):
        return spark.read.schema(schemas.WEB_PAGES).parquet(source)
    return spark.read.table(source)


def parse_records(
    pages: DataFrame,
    *,
    lang: str = "en",
    use_extraction: bool = True,
    cache: bool = True,
) -> dict[str, DataFrame]:
    """pages → {domain: typed record DataFrame (+ url, warc_ts)}.

    ``use_extraction=True`` runs the HTML→text pandas UDF; with False the
    pre-extracted ``text`` column is trusted (both paths are byte-identical
    on well-formed corpora — asserted by tests/test_extract.py).

    ``cache=True`` persists the post-extraction classified frame: the triple
    emission downstream is a union of ~12 projection branches over these
    records, and without a stage cut each branch would re-run the extraction
    UDF. At cluster scale the same role is played by materializing the
    extracted records to a table between the two stages; MEMORY_AND_DISK is
    the local[32] equivalent.
    """
    pages = pages.filter(F.col("lang") == lang)
    if use_extraction:
        pages = with_extracted_text(pages).drop("html")
        text_col = F.col("extracted_text")
    else:
        pages = pages.drop("html")
        text_col = F.col("text")

    classified = pages.select(
        "url",
        "warc_ts",
        text_col.alias("record_text"),
        classify_domain(text_col).alias("domain"),
    )
    if cache:
        from pyspark import StorageLevel

        classified = classified.persist(StorageLevel.MEMORY_AND_DISK)

    out: dict[str, DataFrame] = {}
    for domain in DOMAINS:
        out[domain] = (
            classified.filter(F.col("domain") == domain)
            .select(
                "url",
                "warc_ts",
                F.from_json(F.col("record_text"), _RECORD_SCHEMAS[domain]).alias("r"),
            )
            .select("url", "warc_ts", "r.*")
        )
    return out
