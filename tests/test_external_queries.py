"""External-KG competency questions (externalKG_CQ.md) over the snapshot
tables; expected values derived independently from the fixture constants."""

import pytest

from fixtures.generate import CITIES
from yckg_spark.plans.external_queries import (
    ekg_cq1_latest_population,
    ekg_cq2_city_state_resolution,
    ekg_cq3_cities_per_state,
    ekg_cq4_subclass_counts,
)
from yckg_spark.sources.snapshots import load_snapshots


@pytest.fixture(scope="module")
def snaps(spark, smoke_fixture_dir):
    return load_snapshots(spark, smoke_fixture_dir)


def test_ekg_cq1_latest_population(spark, snaps):
    qids = [f"Q{1000 + i}" for i in range(len(CITIES))]
    rows = {
        r["qid"]: r
        for r in ekg_cq1_latest_population(
            snaps["wd_population"], snaps["wd_entities"], qids
        ).collect()
    }
    assert set(rows) == set(qids)
    for i, (city, *_rest) in enumerate(CITIES):
        r = rows[f"Q{1000 + i}"]
        # the FILTER NOT EXISTS semantics: the 2020 statement wins over 2018
        assert r["as_of"] == "2020-01-01"
        assert r["population"] == 110000 + i * 13577
        assert r["city_label"] == city


def test_ekg_cq2_resolution_and_population_flag(spark, snaps):
    pairs = spark.createDataFrame(
        [("Philadelphia", "Pennsylvania"), ("Edmonton", "Alberta"),
         ("Nowhere", "Pennsylvania")],
        ["city_name", "state_name"],
    )
    got = {
        r["city_name"]: r
        for r in ekg_cq2_city_state_resolution(
            pairs, snaps["wd_labels"], snaps["wd_entities"],
            snaps["wd_admin"], snaps["wd_population"],
        ).collect()
    }
    assert got["Philadelphia"]["qid"] == "Q1000"  # the settlement, not the album decoy
    assert got["Philadelphia"]["has_population"] is True
    assert got["Edmonton"]["qid"] == f"Q{1000 + [c[0] for c in CITIES].index('Edmonton')}"
    assert "Nowhere" not in got  # unresolvable pair drops out, like the reference


def test_ekg_cq2_empty_city_name_dropped(spark, snaps):
    """A degenerate empty city_name must be dropped, not resolved: the raw
    containment predicate LIKE '%%' would match every label, which is never
    the intended answer."""
    pairs = spark.createDataFrame(
        [("", "Pennsylvania"), ("Philadelphia", "Pennsylvania")],
        ["city_name", "state_name"],
    )
    got = {
        r["city_name"]
        for r in ekg_cq2_city_state_resolution(
            pairs, snaps["wd_labels"], snaps["wd_entities"],
            snaps["wd_admin"], snaps["wd_population"],
        ).collect()
    }
    assert got == {"Philadelphia"}


def test_ekg_cq2_containment_join_is_hash_not_nested_loop(spark, snaps):
    """The label-containment join is blocked on a leading-slice equi-key
    (LIKE verified as a residual), so the physical plan is a
    BroadcastHashJoin — no nested-loop scan of the label dim per pair."""
    pairs = spark.createDataFrame(
        [("Philadelphia", "Pennsylvania")], ["city_name", "state_name"]
    )
    plan = (
        ekg_cq2_city_state_resolution(
            pairs, snaps["wd_labels"], snaps["wd_entities"],
            snaps["wd_admin"], snaps["wd_population"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ekg_cq3_cities_per_state(spark, snaps):
    got = {
        r["state_label"]: r["num_cities"]
        for r in ekg_cq3_cities_per_state(snaps["wd_entities"], snaps["wd_admin"]).collect()
    }
    # every fixture state has exactly one settlement (plus the Reno (Texas)
    # decoy which has no admin edge and must not be counted)
    for _city, _code, state_name, _lat, _lon in CITIES:
        assert got[state_name] == 1


def test_ekg_cq4_subclass_counts(spark, snaps):
    S = "https://schema.org/"
    got = {
        r["concept"]: r["n_subclasses"]
        for r in ekg_cq4_subclass_counts(
            snaps["schemaorg_types"], [S + "LocalBusiness", S + "Thing"]
        ).collect()
    }
    # independent golden: walk the snapshot hierarchy transitively in Python
    import collections

    rows = {
        r["id"]: (r["subTypeOf"].split(", ") if r["subTypeOf"] else [])
        for r in snaps["schemaorg_types"].collect()
    }
    anc_count = collections.Counter()
    for node in rows:
        seen, stack = set(), list(rows[node])
        while stack:
            a = stack.pop()
            if a in seen:
                continue
            seen.add(a)
            stack.extend(rows.get(a, []))
        for a in seen:
            anc_count[a] += 1
    assert got[S + "LocalBusiness"] == anc_count[S + "LocalBusiness"]
    assert got[S + "Thing"] == anc_count[S + "Thing"]
    assert got[S + "Thing"] > got[S + "LocalBusiness"]
