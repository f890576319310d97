"""Reverse-geocode enrichment (reference S6/J3/F9).

The reference's ``reverse_coordinate_search.py:31-79`` rounds each
business's (latitude, longitude) to 2 decimals, string-concatenates them
into a ``coordinate_set`` key, reverse-geocodes each UNIQUE key once via
Nominatim, then left-merges the address fields back onto the businesses.
Here the per-key Nominatim responses are a pre-materialized snapshot table
(``geocode``: coord_set → neighbourhood/postcode/city/county/state/country)
and the merge is a broadcast left join on the same rounded-coordinate key.

Rounding parity: Python's ``round`` is round-half-even on the decimal
shortest-repr, which is ``F.bround``; the ``str()`` of the rounded float
strips trailing zeros (``-119.7``, not ``-119.70``), which double→string
CAST reproduces (both use shortest-repr formatting).

100-TB shape: the snapshot's cardinality is bounded by the number of
distinct 0.01°×0.01° cells with businesses (≤ a few million worldwide) —
broadcastable at 64 MB-ish; if a deployment ever exceeds the broadcast
threshold the same join degrades gracefully to a shuffle hash join on an
evenly-distributed key (rounded coords are not skewed the way head
entities are).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDRESS_LEVELS = ("neighbourhood", "postcode", "city", "county", "state", "country")


def coord_set_col(lat=None, lon=None):
    """``f"{round(lat,2)},{round(lon,2)}"`` as a Column — LAT FIRST, the
    reference's key convention (reverse_coordinate_search.py:33-35 builds
    ``round_lat + ',' + round_lon``, the "lat,lon" order Nominatim reverse
    expects), so a reference-format geocode snapshot joins without
    remapping. Defaults resolve lazily — Column construction needs an
    active SparkContext, so no Columns at import."""
    lat = F.col("latitude") if lat is None else lat
    lon = F.col("longitude") if lon is None else lon
    return F.concat_ws(
        ",",
        F.bround(lat, 2).cast("string"),
        F.bround(lon, 2).cast("string"),
    )


def enrich_reverse_geocode(business: DataFrame, geocode: DataFrame) -> DataFrame:
    """business (business_id, latitude, longitude, ...) × geocode snapshot
    → (business_id, neighbourhood, postcode, city, county, state, country).

    Mirrors the reference merge exactly: the input's own city/state columns
    are dropped first (:31), the join is left (unmatched cells keep null
    address fields, like coordinates Nominatim had no answer for :47-49),
    and only business_id + the six address levels survive (:78).
    """
    keyed = business.drop("city", "state").withColumn(
        "coordinate_set", coord_set_col()
    )
    out = keyed.join(
        F.broadcast(geocode.withColumnRenamed("coord_set", "coordinate_set")),
        "coordinate_set",
        "left",
    )
    return out.select("business_id", *ADDRESS_LEVELS)
