"""Snapshot lookup-table loaders.

Every remote API the reference calls per-row (Wikidata SPARQL, the
wbsearchentities REST endpoint, Nominatim reverse geocoding — reference
S4-S6: wikidata_functions.py:5-21, location_from_wikidata.py:15-64,
reverse_coordinate_search.py:40-49) is replaced by a pre-materialized
snapshot table joined in-plan. All of them are broadcast-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_NAMES = (
    "category_schema_mappings",
    "manually_split_categories",
    "schemaorg_types",
    "wd_schema_links",
    "wd_labels",
    "wd_entities",
    "wd_admin",
    "wd_population",
    "geocode",
    "ground_truth_category_mappings",
)


def load_snapshots(spark: SparkSession, fixture_dir: str) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{fixture_dir}/{n}.parquet") for n in SNAPSHOT_NAMES}


def exploded_category_mappings(mappings: DataFrame) -> DataFrame:
    """category_schema_mappings with the stringified-list SchemaType column
    parsed and exploded → (YelpCategory, SchemaType) one pair per row.

    The reference runs eval() on the column (create_schema_nt_files.py:51);
    we parse it as JSON after quote normalization (SURVEY §7 known-hard #6).
    """
    return mappings.select(
        "YelpCategory",
        F.explode(
            F.from_json(F.regexp_replace(F.col("SchemaType"), "'", '"'), "array<string>")
        ).alias("SchemaType"),
    )
