"""Offline mapping-discovery job (reference §3.3): singularization rules,
deterministic embedding stand-in, top-1 similarity join with threshold."""

import pytest

from yckg_spark.operators.mapping_discovery import (
    discover_category_mappings,
    evaluate_mappings,
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


def test_evaluate_mappings_math(spark):
    """P/R arithmetic on hand-built frames: precision counts only
    predictions for categories the ground truth audits; recall is over all
    ground-truth pairs (multi-type truths charge a top-1 predictor)."""
    gt = spark.createDataFrame(
        [("A", "X"), ("B", "Y"), ("B", "Z"), ("C", "W")],
        ["category", "schema_type"],
    )
    pred = spark.createDataFrame(
        # A correct, B one-of-two, C wrong, D outside the audited universe
        [("A", "X"), ("B", "Y"), ("C", "Q"), ("D", "R")],
        ["category", "schema_type"],
    )
    row = evaluate_mappings(pred, gt).collect()[0]
    assert (row["n_gt"], row["n_pred"], row["tp"]) == (4, 3, 2)
    assert row["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["recall"] == pytest.approx(2 / 4, abs=1e-6)


def test_discovery_pr_vs_frozen_ground_truth(spark, smoke_fixture_dir):
    """End-to-end discovery scored against the frozen ground-truth fixture —
    mirrors the reference's evaluation against its 200 manually-verified
    pairs (README.md:57-58). The lexical stand-in encoder resolves every
    lexically-related pair; the misses are exactly the non-lexical ones
    (Doctors→Physician, Fashion→ClothingStore) a real sentence encoder
    contributes. Deterministic, so the values are frozen, with bands as the
    contract."""
    from yckg_spark.sources.snapshots import load_snapshots

    snaps = load_snapshots(spark, smoke_fixture_dir)
    gt = snaps["ground_truth_category_mappings"]
    m = discover_category_mappings(
        gt.select("category").distinct(), snaps["schemaorg_types"], threshold=0.4
    )
    row = evaluate_mappings(m, gt).collect()[0]
    assert row["precision"] >= 0.9
    assert row["recall"] >= 0.65
    assert row["precision"] == pytest.approx(11 / 12, abs=1e-6)
    assert row["recall"] == pytest.approx(11 / 16, abs=1e-6)


def test_manual_split_overlay(spark):
    cats = spark.createDataFrame([("Food & Restaurants",)], ["category"])
    splits = spark.createDataFrame(
        [("Food & Restaurants", "Food"), ("Food & Restaurants", "Restaurants")],
        ["original", "split"],
    )
    from yckg_spark.operators.mapping_discovery import candidate_categories

    out = {r["category"] for r in candidate_categories(cats, splits).collect()}
    assert out == {"Food", "Restaurants"}
