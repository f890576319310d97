"""The predicate / type / IRI mapping core — the heart of the recipe.

Re-realizes, as *data* plus Column expressions:
  * ``get_schema_predicate`` (reference: Code/UtilityFunctions/
    schema_functions.py:12-76) — 14 hand-mapped schema.org predicates plus a
    ``yelpvoc:{key}`` fallback with runtime datatype inference;
  * ``get_schema_type``   (schema_functions.py:79-102) — entity → class;
  * ``get_iri``           (Code/UtilityFunctions/get_iri.py:5-18) — per-domain
    URI minting roots.

The reference dispatches these per row with ``match`` statements; here the
known-key table is a plain dict used at *plan construction time* (the schema
is fixed per domain, so the lookup is resolved while building the DataFrame
plan — zero runtime cost), and the fallback datatype inference is a native
Column expression (see functions/strings.py) running JVM-side.
"""

from __future__ import annotations

from yckg_spark.namespaces import (
    SCHEMA,
    XSD_ANYURI,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_INTEGER,
    XSD_STRING,
    YELPENT,
    YELPVOC,
)

# Keys whose (string) values are stringified nested attribute dicts; they get
# blank-node treatment (reference: create_yelp_nt_files.py:116).
NESTED_ATTRIBUTE_KEYS = frozenset(
    {
        "BusinessParking",
        "GoodForMeal",
        "Ambience",
        "Music",
        "BestNights",
        "HairSpecializesIn",
        "DietaryRestrictions",
    }
)

# Values the reference treats as missing and routes to the none-list
# (create_yelp_nt_files.py:112).
NONE_SENTINELS = ("None", "none", "null", "Null", "NULL", "")

# key -> (predicate IRI, datatype IRI or None meaning "infer from value").
# Mirrors schema_functions.py:22-54 exactly, including the quirk that only
# "hours" is capitalized in its hasX predicate (:54).
PREDICATE_MAP: dict[str, tuple[str, str]] = {
    "name": (SCHEMA + "legalName", XSD_STRING),
    "address": (SCHEMA + "address", XSD_STRING),
    "postal_code": (SCHEMA + "postalCode", XSD_STRING),
    "latitude": (SCHEMA + "latitude", XSD_DECIMAL),
    "longitude": (SCHEMA + "longitude", XSD_DECIMAL),
    "stars": (SCHEMA + "aggregateRating", XSD_DECIMAL),
    "review_count": (SCHEMA + "reviewCount", XSD_INTEGER),
    "is_open": (SCHEMA + "publicAccess", XSD_STRING),
    "date": (SCHEMA + "dateCreated", XSD_DATETIME),
    "friends": (SCHEMA + "knows", XSD_ANYURI),
    "yelping_since": (SCHEMA + "dateCreated", XSD_DATETIME),
    "business_id": (SCHEMA + "about", XSD_ANYURI),
    "text": (SCHEMA + "description", XSD_STRING),
    "city": (YELPVOC + "locatedInCity", XSD_STRING),
    "state": (YELPVOC + "locatedInState", XSD_STRING),
    "BusinessParking": (YELPVOC + "hasBusinessParking", XSD_STRING),
    "GoodForMeal": (YELPVOC + "hasGoodForMeal", XSD_STRING),
    "Ambience": (YELPVOC + "hasAmbience", XSD_STRING),
    "Music": (YELPVOC + "hasMusic", XSD_STRING),
    "BestNights": (YELPVOC + "hasBestNights", XSD_STRING),
    "HairSpecializesIn": (YELPVOC + "hasHairSpecializesIn", XSD_STRING),
    "DietaryRestrictions": (YELPVOC + "hasDietaryRestrictions", XSD_STRING),
    "hours": (YELPVOC + "hasHours", XSD_STRING),
}


def predicate_for(key: str) -> str:
    """Predicate IRI for a known key, else the yelpvoc fallback."""
    if key in PREDICATE_MAP:
        return PREDICATE_MAP[key][0]
    return YELPVOC + key


def datatype_for(key: str) -> str | None:
    """Datatype IRI for a known key; None means 'infer from the value'."""
    if key in PREDICATE_MAP:
        return PREDICATE_MAP[key][1]
    return None


# entity/key -> class IRI (schema_functions.py:79-102)
TYPE_MAP: dict[str, str] = {
    "user": SCHEMA + "Person",
    "business": SCHEMA + "LocalBusiness",
    "review": SCHEMA + "UserReview",
    "BusinessParking": SCHEMA + "ParkingFacility",
    "GoodForMeal": SCHEMA + "FoodService",
    "Ambience": SCHEMA + "LocationFeatureSpecification",
    "Music": SCHEMA + "LocationFeatureSpecification",
    "BestNights": SCHEMA + "LocationFeatureSpecification",
    "HairSpecializesIn": SCHEMA + "LocationFeatureSpecification",
    "DietaryRestrictions": SCHEMA + "LocationFeatureSpecification",
    "hours": SCHEMA + "OpeningHoursSpecification",
}


def schema_type_for(entity: str) -> str | None:
    return TYPE_MAP.get(entity)


# domain -> entity-IRI minting root (get_iri.py:5-18). Note checkin mints
# under business_id/ — it describes the business, not a checkin entity.
IRI_ROOTS: dict[str, str] = {
    "business": YELPENT + "business_id/",
    "user": YELPENT + "user_id/",
    "review": YELPENT + "review_id/",
    "tip": YELPENT + "tip_id/",
    "checkin": YELPENT + "business_id/",
}


def iri_root(domain: str) -> str:
    return IRI_ROOTS[domain]
