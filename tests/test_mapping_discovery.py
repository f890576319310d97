"""Offline mapping-discovery job (reference §3.3): singularization rules,
deterministic embedding stand-in, top-1 similarity join with threshold."""

import pytest

from yckg_spark.operators.mapping_discovery import (
    discover_category_mappings,
    grouped_mappings,
    singularize_phrase,
    singularize_word,
)


@pytest.mark.parametrize(
    ("plural", "singular"),
    [
        ("Restaurants", "Restaurant"),
        ("Bakeries", "Bakery"),
        ("Churches", "Church"),
        ("Businesses", "Business"),
        ("Classes", "Class"),        # -sses rule (inflect parity)
        ("Doctors", "Doctor"),
        ("Children", "Child"),
        ("Series", "Series"),        # uncountable
        ("Electronics", "Electronics"),
        ("Bus", "Bus"),              # -us guard
        ("Glass", "Glass"),          # -ss guard
        ("Tea", "Tea"),              # not plural
    ],
)
def test_singularize_word(plural, singular):
    assert singularize_word(plural) == singular


def test_singularize_phrase_head_nouns():
    assert singularize_phrase("Coffee & Teas") == "Coffee & Tea"
    assert singularize_phrase("Department Stores") == "Department Store"
    assert singularize_phrase(None) is None


def test_discovery_end_to_end(spark):
    cats = spark.createDataFrame(
        [("Restaurants",), ("Furniture Stores",), ("Zzqx Qxzz",)], ["category"]
    )
    types = spark.createDataFrame(
        [("Restaurant",), ("FurnitureStore",), ("LocalBusiness",)], ["label"]
    )
    m = discover_category_mappings(cats, types, threshold=0.4)
    got = {r["category"]: (r["schema_type"], r["similarity"]) for r in m.collect()}
    assert got["Restaurants"][0] == "Restaurant"
    assert got["Restaurants"][1] > 0.9          # near-exact lexical match
    assert got["Furniture Stores"][0] == "FurnitureStore"
    assert "Zzqx Qxzz" not in got               # below threshold -> dropped

    g = {r["category"]: r["schema_types"] for r in grouped_mappings(m).collect()}
    assert g["Restaurants"] == ["Restaurant"]


def test_discovery_deterministic_across_runs(spark):
    cats = spark.createDataFrame([("Restaurants",), ("Bars",)], ["category"])
    types = spark.createDataFrame([("Restaurant",), ("BarOrPub",)], ["label"])
    a = sorted(map(tuple, discover_category_mappings(cats, types).collect()))
    b = sorted(map(tuple, discover_category_mappings(cats, types).collect()))
    assert a == b


def test_manual_split_overlay(spark):
    cats = spark.createDataFrame([("Food & Restaurants",)], ["category"])
    splits = spark.createDataFrame(
        [("Food & Restaurants", "Food"), ("Food & Restaurants", "Restaurants")],
        ["original", "split"],
    )
    from yckg_spark.operators.mapping_discovery import candidate_categories

    out = {r["category"] for r in candidate_categories(cats, splits).collect()}
    assert out == {"Food", "Restaurants"}
