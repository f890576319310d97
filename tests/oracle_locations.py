"""Independent Python oracle for the Wikidata location cascade
(reference: KnowledgeGraphEnrichment/location_from_wikidata.py), computed
straight from the fixture snapshot dicts."""

from __future__ import annotations

import math
from collections import defaultdict

from yckg_spark.namespaces import (
    INSTANCE_OF_PREDICATE,
    LOCATION_PREDICATE,
    POPULATION_PREDICATE,
    Q_COUNTRY,
    Q_COUNTY,
    Q_HUMAN_SETTLEMENT,
    Q_STATE,
    RDFS_LABEL,
    SCHEMA,
    WD,
    XSD_INTEGER,
    XSD_STRING,
    YELPENT,
)
from yckg_spark.operators.enrich_wikidata import STATES


def _hav(lat1, lon1, lat2, lon2):
    p = math.pi / 180
    a = (
        math.sin((lat2 - lat1) * p / 2) ** 2
        + math.cos(lat1 * p) * math.cos(lat2 * p) * math.sin((lon2 - lon1) * p / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def link_keys(businesses, snaps):
    """(city_n, state_name) → dict of qids/labels/population."""
    labels = defaultdict(list)
    for r in snaps["wd_labels"]:
        labels[r["search_label"]].append((r["rank"], r["qid"]))
    for v in labels.values():
        v.sort()
    ent = {r["qid"]: r for r in snaps["wd_entities"]}
    parents = defaultdict(list)
    for r in snaps["wd_admin"]:
        parents[r["child_qid"]].append(r["parent_qid"])
    pop = {}
    for r in sorted(snaps["wd_population"], key=lambda x: x["as_of"]):
        pop[r["qid"]] = r["population"]  # later date wins

    sums = defaultdict(lambda: [0.0, 0.0, 0])
    for b in businesses:
        key = (b["city"].partition(",")[0], STATES[b["state"]])
        s = sums[key]
        s[0] += b["latitude"]
        s[1] += b["longitude"]
        s[2] += 1

    out = {}
    for (city, state), (slat, slon, n) in sums.items():
        clat, clon = slat / n, slon / n
        cands = labels.get(f"{city}, {state}") or labels.get(city) or []
        best = None
        for rank, qid in cands:
            e = ent.get(qid)
            if not e or e["kind"] != "settlement":
                continue
            d = _hav(clat, clon, e["lat"], e["lon"])
            if d <= 100 and (best is None or d < best[0]):
                best = (d, qid)
        city_qid = best[1] if best else None
        state_qid = None
        for rank, qid in labels.get(state, []):
            e = ent.get(qid)
            if e and e["kind"] in ("state", "province"):
                state_qid = qid
                break
        county_qid = None
        if city_qid:
            cs = sorted(q for q in parents.get(city_qid, []) if ent.get(q, {}).get("kind") == "county")
            county_qid = cs[0] if cs else None
        country_qid = None
        if state_qid:
            cs = sorted(q for q in parents.get(state_qid, []) if ent.get(q, {}).get("kind") == "country")
            country_qid = cs[0] if cs else None
        out[(city, state)] = {
            "city_qid": city_qid,
            "city_label": ent[city_qid]["label"] if city_qid else None,
            "state_qid": state_qid,
            "state_label": ent[state_qid]["label"] if state_qid else None,
            "county_qid": county_qid,
            "county_label": ent[county_qid]["label"] if county_qid else None,
            "country_qid": country_qid,
            "country_label": ent[country_qid]["label"] if country_qid else None,
            "population": pop.get(city_qid) if city_qid else None,
        }
    return out


def golden_location_triples(businesses, snaps):
    keys = link_keys(businesses, snaps)
    T = set()

    def add_to_graph(row, lower, higher, instance):
        T.add((WD + row[f"{lower}_qid"], LOCATION_PREDICATE, WD + row[f"{higher}_qid"], False, None))
        T.add((WD + row[f"{higher}_qid"], RDFS_LABEL, row[f"{higher}_label"], True, XSD_STRING))
        T.add((WD + row[f"{higher}_qid"], INSTANCE_OF_PREDICATE, WD + instance, False, None))

    for b in businesses:
        row = keys[(b["city"].partition(",")[0], STATES[b["state"]])]
        biz_iri = YELPENT + "business_id/" + b["business_id"]
        if row["city_qid"]:
            T.add((biz_iri, SCHEMA + "location", WD + row["city_qid"], False, None))
            T.add((WD + row["city_qid"], RDFS_LABEL, row["city_label"], True, XSD_STRING))
            T.add((WD + row["city_qid"], INSTANCE_OF_PREDICATE, WD + Q_HUMAN_SETTLEMENT, False, None))
            if row["population"]:
                T.add((WD + row["city_qid"], POPULATION_PREDICATE, str(row["population"]), True, XSD_INTEGER))
            if row["county_qid"]:
                add_to_graph(row, "city", "county", Q_COUNTY)
                if row["state_qid"]:
                    add_to_graph(row, "county", "state", Q_STATE)
                    if row["country_qid"]:
                        add_to_graph(row, "state", "country", Q_COUNTRY)
                elif row["country_qid"]:
                    add_to_graph(row, "county", "country", Q_COUNTRY)
            elif row["state_qid"]:
                add_to_graph(row, "city", "state", Q_STATE)
                if row["country_qid"]:
                    add_to_graph(row, "state", "country", Q_COUNTRY)
            elif row["country_qid"]:
                add_to_graph(row, "city", "country", Q_COUNTRY)
        elif row["state_qid"]:
            T.add((biz_iri, SCHEMA + "location", WD + row["state_qid"], False, None))
            T.add((WD + row["state_qid"], RDFS_LABEL, row["state_label"], True, XSD_STRING))
            if row["country_qid"]:
                add_to_graph(row, "state", "country", Q_COUNTRY)
    return T
