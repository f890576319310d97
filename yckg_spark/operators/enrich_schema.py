"""Schema.org enrichment: type-hierarchy closure + skos category mappings
+ Wikidata sameAs category links.

Re-realizes create_schema_nt_files.py (hierarchy + skos mappings) and
KnowledgeGraphEnrichment/create_schema_wiki_mapping.py as DataFrame plans
over snapshot tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yckg_spark.namespaces import (
    RDF_TYPE,
    RDFS_LABEL,
    RDFS_SUBCLASSOF,
    SCHEMA,
    SKOS,
    XSD_STRING,
    YELPCAT,
    YELPVOC,
)
from yckg_spark.sources.snapshots import exploded_category_mappings

_NULL = "cast(null as string)"


def _triples(df: DataFrame, domain: str) -> DataFrame:
    return df.select(
        "subject",
        "predicate",
        "object",
        "is_literal",
        "datatype",
        F.lit(domain).alias("source_domain"),
    )


# ---------------------------------------------------------------------------
# G1 — type-hierarchy closure
# ---------------------------------------------------------------------------


def dfs_tree_edges(edges: list[tuple[str, str]], sources: list[str]) -> set[tuple[str, str]]:
    """Exact-parity closure: union over sources of *DFS-tree* edges
    (reference schema_functions.py:124-132 uses networkx dfs_tree, whose tree
    omits the second in-edge of any node reachable by two paths — e.g. with
    LocalBusiness → {Organization, Place} and both → Thing, the edge
    Place→Thing is skipped when Thing was already visited via Organization).
    We reproduce that order-dependent behavior: adjacency in first-seen edge
    order, iterative DFS.

    The type table is ~2k rows — a fixed vocabulary that does not grow with
    corpus size — so this runs driver-side on broadcast-scale data by design.
    """
    adj: dict[str, list[str]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)

    out: set[tuple[str, str]] = set()
    for src in sources:
        # textbook iterative DFS with descend-before-sibling order (the
        # stack holds child iterators so a subtree is fully explored before
        # the next sibling is examined — same discovery order as a recursive
        # DFS over adjacency lists in first-seen edge order)
        visited = {src}
        stack = [(src, iter(adj.get(src, ())))]
        while stack:
            parent, children = stack[-1]
            for child in children:
                if child not in visited:
                    visited.add(child)
                    out.add((parent, child))
                    stack.append((child, iter(adj.get(child, ()))))
                    break
            else:
                stack.pop()
    return out


def reachable_edges_fixpoint(edges_df: DataFrame, sources_df: DataFrame) -> DataFrame:
    """Scale path: ALL edges (u,v) with u reachable from any source —
    iterative small-table self-join to fixpoint with localCheckpoint to cut
    lineage. Superset of the DFS-tree variant (differs only on multi-parent
    diamonds); offered for ontologies too large for the driver.

    edges_df: (src, dst); sources_df: (node).
    """
    reach = sources_df.select(F.col("node")).distinct().localCheckpoint()
    while True:
        step = (
            reach.join(edges_df, reach["node"] == edges_df["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = step.join(reach, "node", "left_anti").localCheckpoint()
        if new.isEmpty():
            break
        reach = reach.unionByName(new).localCheckpoint()
    return edges_df.join(reach, edges_df["src"] == reach["node"]).select("src", "dst")


def hierarchy_triples(schemaorg_types: DataFrame, category_mappings: DataFrame) -> DataFrame:
    """rdfs:subClassOf triples for the hierarchy above every mapped type
    (create_schema_nt_files.py:14-34 + schema_functions.py:105-138)."""
    # explode multi-parent rows (", "-separated) exactly like the reference
    edges_rows = (
        schemaorg_types.select(
            "id", F.explode(F.split(F.col("subTypeOf"), ", ")).alias("parent")
        )
        .filter(F.col("parent").isNotNull())
        .collect()
    )
    edges = [(r["id"], r["parent"]) for r in edges_rows]
    mapped = [
        SCHEMA + r["SchemaType"]
        for r in exploded_category_mappings(category_mappings).select("SchemaType").collect()
    ]
    closure = sorted(dfs_tree_edges(edges, mapped))
    spark = schemaorg_types.sparkSession
    df = spark.createDataFrame(closure, ["subject", "object"])
    return _triples(
        df.select(
            "subject",
            F.lit(RDFS_SUBCLASSOF).alias("predicate"),
            "object",
            F.lit(False).alias("is_literal"),
            F.expr(_NULL).alias("datatype"),
        ),
        "schema_hierarchy",
    )


# ---------------------------------------------------------------------------
# skos category → schema.org mapping triples
# ---------------------------------------------------------------------------


def skos_mapping_triples(category_mappings: DataFrame) -> DataFrame:
    """yelpcat:X skos:relatedMatch schema:Y (+ one skos:Member per distinct
    schema type) — create_schema_nt_files.py:37-77. NOTE: this path replaces
    only spaces in the category IRI (:54), unlike the full sanitize chain."""
    m = exploded_category_mappings(category_mappings).select(
        F.concat(F.lit(YELPCAT), F.regexp_replace("YelpCategory", " ", "_")).alias("cat_iri"),
        F.concat(F.lit(SCHEMA), F.col("SchemaType")).alias("schema_iri"),
    )
    related = m.select(
        F.col("cat_iri").alias("subject"),
        F.lit(SKOS + "relatedMatch").alias("predicate"),
        F.col("schema_iri").alias("object"),
        F.lit(False).alias("is_literal"),
        F.expr(_NULL).alias("datatype"),
    )
    members = (
        m.select("schema_iri")
        .distinct()  # category_mappings_cache first-seen set ≡ global dedup
        .select(
            F.lit(YELPVOC + "SchemaCategory").alias("subject"),
            F.lit(SKOS + "Member").alias("predicate"),
            F.col("schema_iri").alias("object"),
            F.lit(False).alias("is_literal"),
            F.expr(_NULL).alias("datatype"),
        )
    )
    return _triples(related.unionByName(members), "schema_mappings")


# ---------------------------------------------------------------------------
# Wikidata sameAs category links (create_schema_wiki_mapping.py:16-84)
# ---------------------------------------------------------------------------


def wiki_category_triples(category_mappings: DataFrame, wd_schema_links: DataFrame) -> DataFrame:
    """Join category→schema mapping with the wdt:P1709 snapshot and emit
    relatedMatch / label / Member triples. The wiki path sanitizes the
    category IRI with only ' ', '&', '/' (create_schema_wiki_mapping.py:64)."""
    m = exploded_category_mappings(category_mappings).select(
        "YelpCategory",
        F.concat(F.lit(SCHEMA), F.col("SchemaType")).alias("schema_iri"),
    )
    joined = (
        wd_schema_links.join(F.broadcast(m), "schema_iri", "left")
        .filter(F.col("YelpCategory").isNotNull())
        .select(
            F.concat(
                F.lit(YELPCAT),
                F.translate(F.col("YelpCategory"), " &/", "___"),
            ).alias("cat_iri"),
            "qid",
            "label",
        )
    )
    related = joined.select(
        F.col("cat_iri").alias("subject"),
        F.lit(SKOS + "relatedMatch").alias("predicate"),
        F.col("qid").alias("object"),
        F.lit(False).alias("is_literal"),
        F.expr(_NULL).alias("datatype"),
    )
    labels = joined.select(
        F.col("qid").alias("subject"),
        F.lit(RDFS_LABEL).alias("predicate"),
        F.col("label").alias("object"),
        F.lit(True).alias("is_literal"),
        F.lit(XSD_STRING).alias("datatype"),
    )
    members = joined.select(
        F.lit(YELPVOC + "WikidataCategory").alias("subject"),
        F.lit(SKOS + "Member").alias("predicate"),
        F.col("qid").alias("object"),
        F.lit(False).alias("is_literal"),
        F.expr(_NULL).alias("datatype"),
    )
    # one rdflib Graph per run → set semantics
    return _triples(related.unionByName(labels).unionByName(members).distinct(), "wiki_mappings")
