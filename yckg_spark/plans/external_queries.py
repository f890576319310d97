"""The four external-KG competency questions (reference:
Code/CompetencyQuestions/externalKG_CQ.md:9-369) re-expressed over the
pre-materialized Wikidata/schema.org snapshot tables.

The reference fires these as remote SPARQL against query.wikidata.org /
dbpedia.org — per-question REST round-trips. Here each becomes a DataFrame
plan over the same snapshot tables the enrichment path joins (S4/S5), so
they run distributed, offline, and at corpus scale:

  EKG-CQ1  latest population per listed city     (p:P1082 + max pq:P585)
  EKG-CQ2  (city, state) name pairs resolved to QIDs via label containment
           + admin-chain membership, with a has-population flag
  EKG-CQ3  city count per state through the admin hierarchy
  EKG-CQ4  transitive-subclass counts under chosen concepts (wdt:P279+,
           re-expressed over the schema.org hierarchy snapshot)

All joins are broadcast-size (snapshot dims); CQ4's closure reuses the
enrichment fixpoint, bounded by the ontology depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ekg_cq1_latest_population(
    population: DataFrame, entities: DataFrame, city_qids: list[str]
) -> DataFrame:
    """Latest population statement per listed city (externalKG_CQ.md:9-46:
    the FILTER NOT EXISTS picks the max point-in-time) → (qid, city_label,
    population, as_of)."""
    w = Window.partitionBy("qid").orderBy(F.desc("as_of"))
    latest = (
        population.filter(F.col("qid").isin(city_qids))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    labels = entities.select("qid", F.col("label").alias("city_label"))
    return latest.join(F.broadcast(labels), "qid").select(
        "qid", "city_label", "population", "as_of"
    )


def ekg_cq2_city_state_resolution(
    pairs: DataFrame, labels: DataFrame, entities: DataFrame,
    admin: DataFrame, population: DataFrame,
) -> DataFrame:
    """(city_name, state_name) rows → best QID whose label contains the
    city name AND whose admin chain (P131 or P131/P131) reaches the state,
    restricted to settlements, LIMIT 1 per pair by label rank then qid —
    plus a has_population flag (externalKG_CQ.md:80-180)."""
    cities = entities.filter(F.col("kind") == "settlement").select(
        "qid", F.col("label").alias("city_label")
    )
    states = entities.filter(F.col("kind").isin("state", "province")).select(
        F.col("qid").alias("state_qid"), F.col("label").alias("state_label")
    )
    # one- and two-hop admin membership (wdt:P131 | wdt:P131/wdt:P131)
    hop1 = admin.select("child_qid", "parent_qid")
    hop2 = (
        admin.alias("x")
        .join(admin.alias("y"), F.col("x.parent_qid") == F.col("y.child_qid"))
        .select(F.col("x.child_qid").alias("child_qid"), F.col("y.parent_qid").alias("parent_qid"))
    )
    member = hop1.unionByName(hop2).distinct()

    # Label containment as a HASH join, not a nested loop: any substring
    # match implies the city name's leading slice (up to 3 chars) occurs
    # among the label's 1/2/3-char slices, so equi-joining on that blocking
    # key and verifying the LIKE as a residual is exactly equivalent to the
    # raw containment join — but stays a BroadcastHashJoin if the label dim
    # ever outgrows the broadcast threshold, instead of degrading to a
    # nested-loop scan per pair. Slices are distinct per label, so each
    # (pair, label) combination joins at most once — no dedup needed.
    lower_label = F.lower(F.col("search_label"))

    def _slices_of_len(n: int):
        # NB: the transform lambda must take exactly one arg — a second
        # parameter would be bound to the array index by PySpark
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(lower_label) - n + 1, F.lit(1))),
            lambda i: lower_label.substr(i, F.lit(n)),
        )

    slices = F.array_distinct(
        F.flatten(F.array(*[_slices_of_len(n) for n in (1, 2, 3)]))
    )
    labels_sliced = labels.withColumn("__slice", F.explode(slices))
    # Degenerate empty city names are dropped explicitly: under the raw
    # containment join LIKE '%%' they'd match EVERY label (a useless
    # all-pairs answer); the blocking key makes that intent explicit
    # instead of silently key-matching ''.
    keyed_pairs = pairs.filter(F.length("city_name") > 0).withColumn(
        "__k", F.substring(F.lower(F.col("city_name")), 1, 3)
    )
    cand = (
        keyed_pairs.join(
            F.broadcast(labels_sliced),
            (F.col("__k") == F.col("__slice"))
            & F.expr("lower(search_label) LIKE concat('%', lower(city_name), '%')"),
        )
        .drop("__k", "__slice")
        .join(F.broadcast(cities), "qid")
        .join(member, F.col("qid") == F.col("child_qid"))
        .join(F.broadcast(states), F.col("parent_qid") == F.col("state_qid"))
        .filter(F.col("state_label") == F.col("state_name"))
    )
    w = Window.partitionBy("city_name", "state_name").orderBy("rank", "qid")
    top1 = (
        cand.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("city_name", "state_name", "qid", "city_label", "state_qid")
    )
    haspop = population.select("qid").distinct().withColumn("has_population", F.lit(True))
    return top1.join(F.broadcast(haspop), "qid", "left").select(
        "city_name",
        "state_name",
        "qid",
        "city_label",
        "state_qid",
        F.coalesce("has_population", F.lit(False)).alias("has_population"),
    )


def ekg_cq3_cities_per_state(entities: DataFrame, admin: DataFrame) -> DataFrame:
    """DISTINCT settlement count per state/province through the admin
    hierarchy (externalKG_CQ.md:224-265) → (state_label, num_cities)."""
    cities = entities.filter(F.col("kind") == "settlement").select(
        F.col("qid").alias("city_qid")
    )
    states = entities.filter(F.col("kind").isin("state", "province")).select(
        F.col("qid").alias("state_qid"), F.col("label").alias("state_label")
    )
    return (
        cities.join(admin, F.col("city_qid") == F.col("child_qid"))
        .join(F.broadcast(states), F.col("parent_qid") == F.col("state_qid"))
        .groupBy("state_label")
        .agg(F.count_distinct("city_qid").alias("num_cities"))
    )


def ekg_cq4_subclass_counts(schemaorg_types: DataFrame, concepts: list[str]) -> DataFrame:
    """Transitive subclass count under each chosen concept (wdt:P279+,
    externalKG_CQ.md:320-369), over the schema.org hierarchy snapshot →
    (concept, n_subclasses). Semi-naive fixpoint, bounded by ontology
    depth (~10 iterations; the frontier shrinks every round)."""
    edges = schemaorg_types.select(
        F.col("id").alias("node"),
        F.explode(F.split(F.col("subTypeOf"), ", ")).alias("anc"),
    ).filter(F.col("anc").isNotNull())
    closure = edges
    frontier = edges
    while True:
        step = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.anc") == F.col("e.node"))
            .select(F.col("f.node").alias("node"), F.col("e.anc").alias("anc"))
            .distinct()
        )
        frontier = step.join(closure, ["node", "anc"], "left_anti")
        if frontier.isEmpty():
            break
        closure = closure.unionByName(frontier).distinct()
    return (
        closure.filter(F.col("anc").isin(concepts))
        .groupBy(F.col("anc").alias("concept"))
        .agg(F.count_distinct("node").alias("n_subclasses"))
    )
