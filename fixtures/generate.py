"""Deterministic synthetic fixture corpus (FIXTURES.md).

Pure functions of (seed, n_business): a Common-Crawl-style ``web_pages``
table whose HTML embeds Yelp-shaped JSON-LD records, plus the snapshot lookup
tables that replace every remote API the reference calls. No wall-clock, no
network; ``random.Random(seed)`` only.

Scales: smoke ≈ 100 businesses (~1.2k pages), correctness ≈ 1,700 (~20k
pages), bench ≈ 17,000 (~200k pages).
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

# (city, state_code, state_name, lat, lon) — Zipf-weighted by position.
# XMS is the reference's bad-naming quirk (location_dicts.py:62), AB Canada.
CITIES = [
    ("Philadelphia", "PA", "Pennsylvania", 39.9526, -75.1652),
    ("Tampa", "FL", "Florida", 27.9506, -82.4572),
    ("Tucson", "AZ", "Arizona", 32.2226, -110.9747),
    ("Santa Barbara", "CA", "California", 34.4208, -119.6982),
    ("Nashville", "TN", "Tennessee", 36.1627, -86.7816),
    ("New Orleans", "LA", "Louisiana", 29.9511, -90.0715),
    ("Reno", "NV", "Nevada", 39.5296, -119.8138),
    ("Edmonton", "AB", "Alberta", 53.5461, -113.4938),
    ("Boise", "ID", "Idaho", 43.6150, -116.2023),
    ("Saint Louis", "XMS", "Missouri", 38.6270, -90.1994),
]

STATES = {c[1]: c[2] for c in CITIES}

CATEGORIES = [
    "Restaurants", "Food", "Shopping", "Home Services", "Beauty & Spas",
    "Health & Medical", "Local Services", "Automotive", "Nightlife", "Bars",
    "Event Planning & Services", "Active Life", "Coffee & Tea", "Fashion",
    "Department Stores", "Home & Garden", "Electronics", "Furniture Stores",
    "Doctors", "Children's Clothing", "Tex-Mex", "Wine & Spirits",
    "Books (New)", "Karaoke", "Parking",
]

PLAIN_ATTRS = {
    "BikeParking": ["True", "False"],
    "BusinessAcceptsCreditCards": ["True", "False"],
    "RestaurantsPriceRange2": ["1", "2", "3", "4"],
    "WiFi": ["u'no'", "u'free'", "'no'"],
    "CoatCheck": ["True", "False"],
    "OutdoorSeating": ["True", "False", "None"],
    "HappyHour": ["True", "False"],
    "ByAppointmentOnly": ["True", "False"],
    "Alcohol": ["u'full_bar'", "u'beer_and_wine'", "u'none'"],
    "NoiseLevel": ["u'average'", "u'quiet'", "u'loud'"],
}

NESTED_ATTRS = {
    "BusinessParking": ["garage", "street", "validated", "lot", "valet"],
    "Ambience": ["touristy", "hipster", "romantic", "casual"],
    "GoodForMeal": ["dessert", "latenight", "lunch", "dinner"],
    "Music": ["dj", "karaoke", "live", "jukebox"],
    "BestNights": ["monday", "friday", "saturday"],
}

DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]

EPOCH = datetime(2015, 1, 1, tzinfo=timezone.utc)


def _zipf_choice(rng: random.Random, items, skew: float = 1.0):
    weights = [1.0 / (i + 1) ** skew for i in range(len(items))]
    return rng.choices(items, weights=weights, k=1)[0]


def _bid(i: int) -> str:
    return f"B{i:021d}"


def _uid(i: int) -> str:
    return f"U{i:021d}"


def _rid(i: int) -> str:
    return f"R{i:021d}"


def _dt(rng: random.Random, lo_year=2015, hi_year=2022) -> str:
    base = datetime(lo_year, 1, 1)
    span = (datetime(hi_year, 12, 28) - base).days
    d = base + timedelta(
        days=rng.randrange(span), hours=rng.randrange(24),
        minutes=rng.randrange(60), seconds=rng.randrange(60),
    )
    return d.strftime("%Y-%m-%d %H:%M:%S")


def _nested_value(rng: random.Random, keys) -> str:
    # stringified pseudo-JSON exactly like Yelp ships it: single quotes,
    # Python True/False/None
    parts = []
    for k in keys:
        v = rng.choice(["True", "False", "None"]) if rng.random() < 0.1 else rng.choice(["True", "False"])
        parts.append(f"'{k}': {v}")
    return "{" + ", ".join(parts) + "}"


def generate_records(seed: int, n_business: int) -> dict[str, list[dict]]:
    """All five Yelp-shaped domains, with the edge cases the reference's
    dispatch exercises (sentinels, pseudo-JSON, list-strings, empty lists)."""
    rng = random.Random(seed)
    n_user = 2 * n_business
    n_review = 6 * n_business
    n_tip = 2 * n_business

    businesses = []
    for i in range(n_business):
        # first |CITIES| businesses cover every city so every linking path is
        # exercised at any scale; the rest are Zipf-skewed (head ≈ Philadelphia)
        if i < len(CITIES):
            city, state_code, _sn, lat, lon = CITIES[i]
        else:
            city, state_code, _sn, lat, lon = _zipf_choice(rng, CITIES)
        city_val = city
        if rng.random() < 0.02:  # comma-suffixed city → partition(",") path
            city_val = f"{city}, {state_code}"
        n_cat = rng.randint(1, 4)
        cats = [_zipf_choice(rng, CATEGORIES) for _ in range(n_cat)]
        seen = set()
        cats = [c for c in cats if not (c in seen or seen.add(c))]
        attributes = {}
        for k, vals in PLAIN_ATTRS.items():
            if rng.random() < 0.5:
                attributes[k] = rng.choice(vals)
        for k, keys in NESTED_ATTRS.items():
            if rng.random() < 0.3:
                attributes[k] = _nested_value(rng, keys)
        if rng.random() < 0.05:
            attributes["DriveThru"] = "None"  # sentinel → none-list routing
        hours = None
        r = rng.random()
        if r < 0.7:
            hours = {d: f"{rng.randint(6, 11)}:0-{rng.randint(17, 23)}:0" for d in DAYS[: rng.randint(5, 7)]}
        elif r < 0.72:
            hours = {}
        businesses.append(
            {
                "business_id": _bid(i),
                "name": f"Business {i}" + (" & Sons" if i % 17 == 0 else ""),
                "address": f"{100 + i} Main St" if i % 11 else "",  # "" → sentinel
                "city": city_val,
                "state": state_code,
                "postal_code": f"{19100 + i % 900:05d}",
                "latitude": round(lat + rng.uniform(-0.05, 0.05), 7),
                "longitude": round(lon + rng.uniform(-0.05, 0.05), 7),
                "stars": rng.randint(1, 10) / 2.0,
                "review_count": rng.randint(0, 500),
                "is_open": rng.randint(0, 1),
                "attributes": attributes if attributes or rng.random() < 0.9 else None,
                "categories": ", ".join(cats) if rng.random() > 0.03 else None,
                "hours": hours,
            }
        )

    users = []
    for i in range(n_user):
        if rng.random() < 0.1:
            friends = "None"
        else:
            k = min(int(rng.paretovariate(1.2)) - 1, 40)
            fids = sorted({rng.randrange(n_user) for _ in range(k)} - {i})
            friends = ", ".join(_uid(f) for f in fids) if fids else "None"
        er = rng.random()
        if er < 0.5:
            elite = ""
        elif er < 0.6:
            elite = str(rng.randint(2010, 2021))  # single year → isdigit → xsd:integer
        else:
            years = sorted({rng.randint(2010, 2021) for _ in range(rng.randint(2, 5))})
            elite = ",".join(map(str, years))  # bare-comma list → xsd:string
        users.append(
            {
                "user_id": _uid(i),
                "name": f"User {i}",
                "review_count": rng.randint(0, 300),
                "yelping_since": _dt(rng, 2008, 2020),
                "friends": friends,
                "useful": rng.randint(0, 1000),
                "funny": rng.randint(0, 500),
                "cool": rng.randint(0, 500),
                "elite": elite,
                "fans": rng.randint(0, 50),
                "average_stars": round(rng.uniform(1.0, 5.0), 2),
                "compliment_count": rng.randint(0, 100),
            }
        )

    reviews = []
    for i in range(n_review):
        # Zipf over businesses → head-entity skew in the review→business join
        b = min(int(rng.paretovariate(0.8)) - 1, n_business - 1)
        date = _dt(rng)
        if i % 37 == 0:
            date = f"2018-05-{rng.randint(1, 28):02d} 12:00:00"  # CQ14 bucket
        reviews.append(
            {
                "review_id": _rid(i),
                "user_id": _uid(rng.randrange(n_user)),
                "business_id": _bid(b),
                "stars": float(rng.randint(1, 5)),
                "useful": rng.randint(0, 100),
                "funny": rng.randint(0, 50),
                "cool": rng.randint(0, 50),
                "text": f"review text {i} " + "good " * rng.randint(0, 5),
                "date": date,
            }
        )

    tips = []
    for i in range(n_tip):
        tips.append(
            {
                "user_id": _uid(rng.randrange(n_user)),
                "business_id": _bid(rng.randrange(n_business)),
                "text": f"tip text {i}",
                "date": _dt(rng),
                "compliment_count": rng.randint(0, 10),
            }
        )

    checkins = []
    for i in range(n_business):
        if rng.random() < 0.2 and i != 0:
            continue
        if i == 1:
            dates = ""  # empty list → skip path (create_yelp_nt_files.py:220)
        else:
            k = rng.randint(1, 30)
            ds = [_dt(rng) for _ in range(k)]
            ds += [ds[0]] * rng.randint(0, 3)  # duplicates → Counter > 1
            if i == 0:  # CQ8/CQ9 spike: dominant single day
                ds += ["2016-06-25 10:00:00"] * (k + 50)
            dates = ", ".join(ds)
        checkins.append({"business_id": _bid(i), "date": dates})

    return {
        "business": businesses,
        "user": users,
        "review": reviews,
        "tip": tips,
        "checkin": checkins,
    }


# ---------------------------------------------------------------------------
# page wrapping
# ---------------------------------------------------------------------------

_HTML_TMPL = (
    "<html><head><title>{title}</title>"
    '<script src="/static/app.js"></script>'
    "<style>body{{margin:0}}</style></head>"
    "<body><nav>Home | Browse | Sign up</nav><header>ExampleCorp</header>"
    '<div class="ad">SPECIAL OFFER — click here!</div>'
    '<script type="application/ld+json">{payload}</script>'
    "<aside>Related links</aside><footer>&copy; example.org</footer></body></html>"
)


def build_pages(records: dict[str, list[dict]], seed: int) -> list[dict]:
    """records → web_pages rows (url, warc_ts, html, text, lang).

    ``text`` is the golden extraction output: exactly the JSON-LD payload.
    ~2% of pages are non-English and must be filtered by the pipeline.
    """
    rng = random.Random(seed + 1)
    pages = []
    i = 0
    for domain, recs in records.items():
        for rec in recs:
            payload = json.dumps(rec, ensure_ascii=False)
            html = _HTML_TMPL.format(title=f"{domain} page {i}", payload=payload)
            lang = "en" if rng.random() > 0.02 else rng.choice(["de", "fr", "es"])
            pages.append(
                {
                    "url": f"https://example.org/{domain}/{i}",
                    "warc_ts": EPOCH + timedelta(seconds=(i * 9973) % 220752000),
                    "html": html.encode("utf-8"),
                    "text": payload,
                    "lang": lang,
                }
            )
            i += 1
    return pages


# ---------------------------------------------------------------------------
# snapshot lookup tables (replace remote SPARQL / wbsearchentities / Nominatim)
# ---------------------------------------------------------------------------


def snapshot_tables() -> dict[str, list[dict]]:
    t: dict[str, list[dict]] = {}

    # category → schema.org mapping, stringified-list form like the reference
    # CSV (create_schema_nt_files.py:51 runs eval() on it)
    t["category_schema_mappings"] = [
        {"YelpCategory": "Restaurants", "SchemaType": "['Restaurant']"},
        {"YelpCategory": "Food", "SchemaType": "['FoodEstablishment']"},
        {"YelpCategory": "Shopping", "SchemaType": "['Store']"},
        {"YelpCategory": "Beauty & Spas", "SchemaType": "['BeautySalon', 'DaySpa']"},
        {"YelpCategory": "Health & Medical", "SchemaType": "['MedicalOrganization']"},
        {"YelpCategory": "Automotive", "SchemaType": "['AutomotiveBusiness']"},
        {"YelpCategory": "Nightlife", "SchemaType": "['NightClub']"},
        {"YelpCategory": "Bars", "SchemaType": "['BarOrPub']"},
        {"YelpCategory": "Coffee & Tea", "SchemaType": "['CafeOrCoffeeShop']"},
        {"YelpCategory": "Department Stores", "SchemaType": "['DepartmentStore']"},
        {"YelpCategory": "Electronics", "SchemaType": "['ElectronicsStore']"},
        {"YelpCategory": "Furniture Stores", "SchemaType": "['FurnitureStore']"},
        {"YelpCategory": "Doctors", "SchemaType": "['Physician']"},
        {"YelpCategory": "Fashion", "SchemaType": "['ClothingStore']"},
        {"YelpCategory": "Parking", "SchemaType": "['ParkingFacility']"},
    ]

    # Frozen ground truth for the discovery P/R evaluation — the reference
    # ships ground_truth_yelp_category_schema_mappings.csv (200 manually
    # verified pairs, README.md:57-58) and scores its semantic mapping
    # against it; this is our fixture-scale equivalent: every verified
    # mapping pair above, flattened to (category, schema_type) rows.
    import ast as _ast

    t["ground_truth_category_mappings"] = [
        {"category": m["YelpCategory"], "schema_type": s}
        for m in t["category_schema_mappings"]
        for s in _ast.literal_eval(m["SchemaType"])
    ]

    t["manually_split_categories"] = [
        {"yelp_category": "Beauty & Spas", "split_yelp_category": "Beauty, Spas"},
        {"yelp_category": "Health & Medical", "split_yelp_category": "Health, Medical"},
        {"yelp_category": "Wine & Spirits", "split_yelp_category": "Wine, Spirits"},
    ]

    S = "https://schema.org/"
    hier = [
        ("Thing", None),
        ("Organization", "Thing"),
        ("Place", "Thing"),
        ("LocalBusiness", "Organization, Place"),  # multi-parent explode case
        ("FoodEstablishment", "LocalBusiness"),
        ("Restaurant", "FoodEstablishment"),
        ("BarOrPub", "FoodEstablishment"),
        ("CafeOrCoffeeShop", "FoodEstablishment"),
        ("Store", "LocalBusiness"),
        ("ElectronicsStore", "Store"),
        ("DepartmentStore", "Store"),
        ("FurnitureStore", "Store"),
        ("ClothingStore", "Store"),
        ("HealthAndBeautyBusiness", "LocalBusiness"),
        ("BeautySalon", "HealthAndBeautyBusiness"),
        ("DaySpa", "HealthAndBeautyBusiness"),
        ("MedicalOrganization", "Organization"),
        ("Physician", "MedicalOrganization"),
        ("AutomotiveBusiness", "LocalBusiness"),
        ("EntertainmentBusiness", "LocalBusiness"),
        ("NightClub", "EntertainmentBusiness"),
        ("CivicStructure", "Place"),
        ("ParkingFacility", "CivicStructure"),
    ]
    t["schemaorg_types"] = [
        {
            "id": S + name,
            "label": name,
            "subTypeOf": (", ".join(S + p for p in parent.split(", ")) if parent else None),
        }
        for name, parent in hier
    ]

    # wdt:P1709 sameAs snapshot — QIDs are full *http* entity IRIs exactly as
    # the query service returns them (create_schema_wiki_mapping.py uses
    # row.QID verbatim).
    WDHTTP = "http://www.wikidata.org/entity/"
    t["wd_schema_links"] = [
        {"schema_iri": S + "Restaurant", "qid": WDHTTP + "Q11707", "label": "restaurant"},
        {"schema_iri": S + "Store", "qid": WDHTTP + "Q213441", "label": "shop"},
        {"schema_iri": S + "Physician", "qid": WDHTTP + "Q39631", "label": "physician"},
        {"schema_iri": S + "BeautySalon", "qid": WDHTTP + "Q1131105", "label": "beauty salon"},
        {"schema_iri": S + "NightClub", "qid": WDHTTP + "Q622425", "label": "nightclub"},
        {"schema_iri": S + "ParkingFacility", "qid": WDHTTP + "Q6501349", "label": "parking lot"},
    ]

    # wbsearchentities snapshot: ordered candidate lists per search label.
    labels = []
    entities = []
    admin = []
    population = []
    country_us = ("Q30", "United States of America")
    country_ca = ("Q16", "Canada")
    state_qids: dict[str, str] = {}
    for j, name in enumerate(sorted({c[2] for c in CITIES})):
        q = f"Q{3000 + j}"
        state_qids[name] = q
        entities.append({"qid": q, "label": name, "kind": "state" if name != "Alberta" else "province", "lat": None, "lon": None})
        country = country_ca if name == "Alberta" else country_us
        admin.append({"child_qid": q, "parent_qid": country[0]})
        # decoy first-rank search hit that is NOT a state/province → the
        # first-common-qid logic must skip it (location_from_wikidata.py:169)
        labels.append({"search_label": name, "qid": f"Q{9500 + j}", "rank": 0})
        labels.append({"search_label": name, "qid": q, "rank": 1})
        entities.append({"qid": f"Q{9500 + j}", "label": name + " (film)", "kind": "film", "lat": None, "lon": None})
    for c in (country_us, country_ca):
        entities.append({"qid": c[0], "label": c[1], "kind": "country", "lat": None, "lon": None})

    for i, (city, code, state_name, lat, lon) in enumerate(CITIES):
        cq = f"Q{1000 + i}"
        coq = f"Q{2000 + i}"
        sq = state_qids[state_name]
        country = country_ca if code == "AB" else country_us
        # the real settlement
        far = city == "Saint Louis"  # >100km → no city match → state-only path
        entities.append(
            {
                "qid": cq,
                "label": city,
                "kind": "settlement",
                "lat": lat + (3.0 if far else 0.0),
                "lon": lon + (3.0 if far else 0.0),
            }
        )
        search = f"{city}, {state_name}"
        if city == "Boise":
            # only the city-only retry finds it (:33-39)
            labels.append({"search_label": city, "qid": cq, "rank": 0})
        else:
            labels.append({"search_label": search, "qid": f"Q{9000 + i}", "rank": 0})  # decoy non-settlement
            labels.append({"search_label": search, "qid": cq, "rank": 1})
            entities.append({"qid": f"Q{9000 + i}", "label": city + " (album)", "kind": "album", "lat": None, "lon": None})
        if city == "Reno":
            # nearer-vs-farther settlement: decoy settlement 2° away loses
            labels.append({"search_label": search, "qid": "Q9990", "rank": 2})
            entities.append({"qid": "Q9990", "label": "Reno (Texas)", "kind": "settlement", "lat": lat - 1.5, "lon": lon + 1.5})
        # admin chain; New Orleans has no county (consolidated) → city→state path
        has_county = city not in ("New Orleans", "Edmonton")
        if has_county:
            entities.append({"qid": coq, "label": city + " County", "kind": "county", "lat": None, "lon": None})
            admin += [
                {"child_qid": cq, "parent_qid": coq},
                {"child_qid": cq, "parent_qid": sq},
                {"child_qid": cq, "parent_qid": country[0]},
                {"child_qid": coq, "parent_qid": sq},
                {"child_qid": coq, "parent_qid": country[0]},
            ]
        else:
            admin += [
                {"child_qid": cq, "parent_qid": sq},
                {"child_qid": cq, "parent_qid": country[0]},
            ]
        population.append({"qid": cq, "population": 100000 + i * 13577, "as_of": "2018-01-01"})
        population.append({"qid": cq, "population": 110000 + i * 13577, "as_of": "2020-01-01"})

    t["wd_labels"] = labels
    t["wd_entities"] = entities
    t["wd_admin"] = admin
    t["wd_population"] = population

    # Nominatim reverse-geocode snapshot keyed by rounded "lat,lon" (the
    # reference's key order: reverse_coordinate_search.py:33-35 builds
    # round_lat + ',' + round_lon). The reference geocodes EVERY unique
    # rounded coordinate_set it sees (:38-49), so the snapshot covers the
    # full 0.01° grid that business jitter (±0.05°) can land in — one row
    # per cell, all cells of a city sharing its address payload.
    geocode = []
    for i, (city, code, state_name, lat, lon) in enumerate(CITIES):
        cells = set()
        for dlat in range(-6, 7):
            for dlon in range(-6, 7):
                cells.add((round(lat + dlat / 100.0, 2), round(lon + dlon / 100.0, 2)))
        for clat, clon in sorted(cells):
            geocode.append(
                {
                    "coord_set": f"{clat},{clon}",
                    "neighbourhood": f"{city} Center",
                    "postcode": f"{19100 + i:05d}",
                    "city": city,
                    "county": f"{city} County",
                    "state": state_name,
                    "country": "Canada" if code == "AB" else "United States",
                }
            )
    t["geocode"] = geocode
    return t


# ---------------------------------------------------------------------------
# materialization
# ---------------------------------------------------------------------------

_PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def write_fixture(out_dir: str, seed: int = 42, n_business: int = 100) -> str:
    """Generate and write the full fixture set; idempotent via a marker."""
    # v4: lat-first geocode keys + ground-truth mapping table
    marker = os.path.join(out_dir, f"_OK_{seed}_{n_business}_v4")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    records = generate_records(seed, n_business)
    pages = build_pages(records, seed)
    cols = {k: [p[k] for p in pages] for k in ("url", "warc_ts", "html", "text", "lang")}
    # Bounded row groups so Spark's scan splits the file across tasks (a
    # single default-size row group would serialize the extraction stage
    # into one task); mirrors a real multi-file Common-Crawl Iceberg table.
    pq.write_table(
        pa.table(cols, schema=_PAGE_SCHEMA),
        os.path.join(out_dir, "web_pages.parquet"),
        row_group_size=2048,
    )
    for name, rows in snapshot_tables().items():
        keys = list(rows[0].keys())
        pq.write_table(
            pa.table({k: [r.get(k) for r in rows] for k in keys}),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def default_fixture(scale: str = "smoke") -> str:
    """Shared cached fixture dirs used by tests and bench."""
    n = {"smoke": 100, "correctness": 1700, "bench": 17000}[scale]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", scale)
    return write_fixture(out, seed=42, n_business=n)


if __name__ == "__main__":
    import sys

    scale = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    print(default_fixture(scale))
