"""Offline category→schema.org mapping discovery (reference §3.3:
Code/UtilityFunctions/category_mappings.py:65-103).

The reference pipeline: unique Yelp categories → manual-split overlay →
singularize (inflect engine) → schema.org labels de-camelCased →
SentenceTransformer MiniLM embeddings → dense cosine matrix → per-category
argmax + threshold → category→[SchemaType] list. Its verified output ships
as a 310-row CSV that the hot path consumes as a static input — this module
re-realizes the *discovery* job itself, Spark-first:

  * singularization: deterministic rule table covering the inflect behavior
    on category nouns (category_mappings.py:30 via string_functions.py:17-38)
  * embeddings: the MiniLM torch model is not in this container, so the
    embedding step is a clearly-marked deterministic stand-in — hashed
    bag-of-character-3-grams (cosine ≈ lexical similarity). The Spark-side
    plumbing (schema, vectorized UDF, join shape) is exactly what a real
    sentence-encoder pandas_udf would use; swap `embed_text_udf` for a model
    call in production.
  * argmax: broadcast cross join + window top-1 (J5 in SURVEY §2.4) instead
    of a driver-side dense matrix — both sides stay DataFrames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType, StringType

from yckg_spark.functions.strings import space_words_lower

# ---------------------------------------------------------------------------
# Singularization (F6): deterministic rule table.
# Order matters — first match wins, mirroring inflect's classical behavior
# on the noun shapes that occur in Yelp categories.
# ---------------------------------------------------------------------------

_IRREGULAR = {
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "people": "person",
    "knives": "knife", "wives": "wife", "loaves": "loaf", "leaves": "leaf",
    "shelves": "shelf", "wolves": "wolf",
}
# words that look plural but are not (inflect returns False / identity)
_UNCOUNTABLE = {
    "series", "species", "news", "analysis", "basis", "diagnosis",
    "electronics", "fitness", "express", "access", "gas", "bus", "plus",
}


def singularize_word(w: str) -> str:
    lw = w.lower()
    if lw in _IRREGULAR:
        out = _IRREGULAR[lw]
    elif lw in _UNCOUNTABLE or len(lw) <= 3:
        return w
    elif lw.endswith("ies") and len(lw) > 4:
        out = lw[:-3] + "y"
    elif lw.endswith(("sses", "shes", "ches", "xes", "zes")):
        out = lw[:-2]
    elif lw.endswith("oes") and len(lw) > 4:
        out = lw[:-2]
    elif lw.endswith("s") and not lw.endswith(("ss", "us", "is")):
        out = lw[:-1]
    else:
        return w
    # restore capitalization shape of the source word
    return out.capitalize() if w[:1].isupper() else out


def singularize_phrase(s: str | None) -> str | None:
    """Singularize the final word of each '&'-joined phrase segment — the
    reference singularizes category phrases word-wise; the head noun is what
    matters for matching ('Coffee & Tea' stays, 'Restaurants'→'Restaurant')."""
    if s is None:
        return None
    words = s.split(" ")
    return " ".join(
        singularize_word(w) if i == len(words) - 1 or words[min(i + 1, len(words) - 1)] == "&"
        else w
        for i, w in enumerate(words)
    )


# DataType object, not DDL string: parsing "string" needs an active session
# at import time (see extract.py)
@pandas_udf(StringType())
def singularize_udf(s: pd.Series) -> pd.Series:
    return s.map(singularize_phrase)


# ---------------------------------------------------------------------------
# Deterministic embedding stand-in (STUB for the sentence encoder)
# ---------------------------------------------------------------------------

EMBED_DIM = 256


def _embed_one(text: str, dim: int) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float32)
    t = f"##{text.lower()}##"
    for i in range(len(t) - 2):
        g = t[i : i + 3]
        # fixed-width byte hash (Python's builtin hash() is salted per process)
        h = int.from_bytes(g.encode("utf-8", "ignore").ljust(4, b"\0")[:4], "little")
        # fmix-style avalanche: a bare multiplicative hash mod a power-of-two
        # dim keeps only the low bits, which depend only on the gram's first
        # byte-and-a-half — grams sharing a first letter all collided, so
        # cosine measured initials, not lexical overlap
        h = (h * 2654435761) & 0xFFFFFFFF
        h ^= h >> 15
        h = (h * 2246822519) & 0xFFFFFFFF
        h ^= h >> 13
        v[h % dim] += 1.0
    n = np.linalg.norm(v)
    return v / n if n else v


@pandas_udf(returnType=ArrayType(FloatType()))
def embed_text_udf(s: pd.Series) -> pd.Series:
    """Hashed char-3-gram unit vectors — a deterministic, dependency-free
    stand-in for the MiniLM encoder (NOT a semantic model; swap for a real
    sentence-encoder pandas_udf in production). Never uses Python's
    randomized hash()."""
    return s.map(lambda x: _embed_one(x or "", EMBED_DIM).tolist())


# ---------------------------------------------------------------------------
# The discovery job
# ---------------------------------------------------------------------------


def candidate_categories(
    business_categories: DataFrame, manual_splits: DataFrame | None = None
) -> DataFrame:
    """distinct category strings (+ manual multi-category splits applied),
    singularized — the left side of the similarity join.

    ``business_categories``: one column ``category``.
    ``manual_splits``: (original, split) pairs — a category that the manual
    table splits is replaced by its split parts (category_mappings.py:25-28).
    """
    cats = business_categories.select("category").distinct()
    if manual_splits is not None:
        ms = F.broadcast(manual_splits)
        cats = (
            cats.join(ms, cats.category == ms.original, "left")
            .select(F.coalesce(ms.split, cats.category).alias("category"))
            .distinct()
        )
    return cats.withColumn("singular", singularize_udf(F.col("category")))


def discover_category_mappings(
    business_categories: DataFrame,
    schemaorg_types: DataFrame,
    manual_splits: DataFrame | None = None,
    threshold: float = 0.4,
) -> DataFrame:
    """category → best-matching schema.org type by embedding cosine, top-1
    per category with threshold (J5 + T1; category_mappings.py:84-98).

    ``schemaorg_types`` needs a ``label`` column (camelCase schema.org id).
    Returns (category, schema_type, similarity).
    """
    cats = candidate_categories(business_categories, manual_splits).withColumn(
        "cat_vec", embed_text_udf(F.col("singular"))
    )
    types = schemaorg_types.select(
        F.col("label").alias("schema_type"),
        space_words_lower(F.col("label")).alias("spaced"),
    ).withColumn("type_vec", embed_text_udf(F.col("spaced")))

    from yckg_spark.operators.similarity import cosine_expr

    # schema.org's ~1.9k types broadcast; every category scores all types,
    # window keeps the argmax — Catalyst plans BroadcastNestedLoopJoin for
    # the cross join, which is the right physical plan for a <2k-row side.
    from pyspark.sql import Window

    scored = cats.crossJoin(F.broadcast(types)).select(
        "category",
        "schema_type",
        cosine_expr(F.col("cat_vec"), F.col("type_vec")).alias("similarity"),
    )
    w = Window.partitionBy("category").orderBy(F.desc("similarity"), "schema_type")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") == 1) & (F.col("similarity") >= threshold))
        .select("category", "schema_type", F.round("similarity", 6).alias("similarity"))
    )


def grouped_mappings(mappings: DataFrame) -> DataFrame:
    """category → [schema types] list (A3; category_mappings.py:101)."""
    return mappings.groupBy("category").agg(
        F.sort_array(F.collect_list("schema_type")).alias("schema_types")
    )


def evaluate_mappings(pred: DataFrame, ground_truth: DataFrame) -> DataFrame:
    """Precision/recall of discovered (category, schema_type) pairs against
    a manually-verified ground-truth table — the reference's evaluation
    method (README.md:57-58: 200 verified pairs scored for precision and
    recall; the CSV itself isn't shipped, so the fixture freezes its own).

    Precision is measured over predictions for categories the ground truth
    covers: a mapping for a category outside the audited universe is
    unknowable, not wrong. Recall is over all ground-truth pairs (a
    multi-type truth like 'Beauty & Spas' → {BeautySalon, DaySpa} charges
    the top-1 discovery for the types it cannot emit — honest, like the
    reference). One row: (n_gt, n_pred, tp, precision, recall).
    """
    gt = ground_truth.select("category", "schema_type").distinct()
    gt_cats = gt.select("category").distinct()
    p = pred.select("category", "schema_type").join(F.broadcast(gt_cats), "category")
    tp = p.join(F.broadcast(gt), ["category", "schema_type"])
    counts = (
        gt.agg(F.count(F.lit(1)).alias("n_gt"))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_pred")))
        .crossJoin(tp.agg(F.count(F.lit(1)).alias("tp")))
    )
    return counts.select(
        "n_gt",
        "n_pred",
        "tp",
        F.round(
            F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0), 6
        ).alias("precision"),
        F.round(
            F.when(F.col("n_gt") > 0, F.col("tp") / F.col("n_gt")).otherwise(0.0), 6
        ).alias("recall"),
    )
