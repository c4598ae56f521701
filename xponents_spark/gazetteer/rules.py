"""Geocoding rules: scoring, association, choosing, confidence
(SURVEY.md §2.5 J1-J7, §2.7 K1-K14).

Each rule is a function over the per-turn candidate list — the Spark shape of
the reference's GeocodeRule chain (PlaceGeocoder.java:192-318 configure()).
Relative weights mirror the reference's published values (FeatureRule.java:
28-90, NameCodeRule.java:38-56, MajorPlaceRule.java:45-235,
ProvinceAssociationRule weight 5, CoordinateAssociationRule weight 5); the
absolute scale is normalized so the base name score (0..~1.6) and rule
boosts compose like the reference's ScoredPlace accumulation.
"""

from __future__ import annotations

import math

from ..functions.geo import geohash_encode, haversine_m
from ..functions.textnorm import is_upper, levenshtein
from . import data
from .matcher import Place, PlaceCandidate, normalize_token

# K2 feature-class weights (rules/FeatureRule.java:28-90), applied x0.1
FEAT_WEIGHTS = {
    ("A", "ADM1"): 16, ("A", "PCLI"): 16, ("A", "PCL"): 16, ("A", "PCLD"): 16,
    ("P", "PPLC"): 15, ("A", "ADM2"): 13, ("P", "PPLA"): 12,
    ("A", None): 11, ("P", "PPL"): 10, ("P", None): 10,
}
DEFAULT_FEAT_WEIGHT = 5

# feature class -> precision meters (reference prec semantics: city ~5km,
# admin ~50km, country ~100km)
FEAT_PRECISION = {"PPL": 5000, "PPLA": 5000, "PPLC": 5000, "PPLX": 5000,
                  "ADM1": 50000, "ADM2": 30000, "PCLI": 100000, "PCLD": 100000,
                  "CONT": 1000000}


def feat_weight(p: Place) -> int:
    return FEAT_WEIGHTS.get((p.feat_class, p.feat_code),
                            FEAT_WEIGHTS.get((p.feat_class, None),
                                             DEFAULT_FEAT_WEIGHT))


def feat_precision(p: Place) -> int:
    return FEAT_PRECISION.get(p.feat_code, 10000)


# --- K1: default name score --------------------------------------------------

def default_score_rule(cands: list[PlaceCandidate]) -> None:
    """0.5*name_score + 0.1*id_bias (PlaceCandidate.java:427-534).
    name_score = (len - levenshtein(textnorm, namenorm))/len with a small
    exact-match bonus (K3 lexical bonus, GeocodeRule.java:175-199)."""
    for c in cands:
        if c.filtered_out:
            continue
        tnorm = c.textnorm
        for p in c.places:
            nnorm = normalize_token(p.name)
            ln = max(len(tnorm), len(nnorm), 1)
            name_score = (ln - levenshtein(tnorm, nnorm)) / ln
            if c.text == p.name:
                name_score += 0.15          # exact case-sensitive bonus
            c.score_place(p, 0.5 * name_score + 0.1 * p.id_bias, "DefaultScore")
            c.score_place(p, feat_weight(p) * 0.1, "Feature")


# --- K4: CountryRule ----------------------------------------------------------

def country_rule(cands: list[PlaceCandidate], scope: "Scope") -> None:
    """Country names weight +0.2; bare codes +0 (CountryRule.java:25-119).
    Each unfiltered country mention puts its cc in scope."""
    for c in cands:
        if c.filtered_out or not c.is_country:
            continue
        for p in c.places:
            if not p.is_country:
                continue
            if p.name_type == "N":
                c.score_place(p, 0.2, "Country.name")
                scope.country(p.cc, mentioned=True)
            elif p.name_type == "A" and c.is_abbreviation:
                c.score_place(p, 0.1, "Country.abbrev")
                scope.country(p.cc, mentioned=True)
            elif p.name_type == "C":
                # 2-3 char upper codes only; no boost, weak scope
                if is_upper(c.text) and 2 <= len(c.text) <= 3:
                    c.add_rule("Country.code")


# --- J2/K5: NAME, CODE adjacency ----------------------------------------------

def name_code_rule(cands: list[PlaceCandidate], scope: "Scope",
                   text: str = "") -> None:
    """Pair a candidate with a following admin code/name within 5 chars;
    weight 10 (+2 if comma) (NameCodeRule.java:38-56,153-180).  Marks the
    geo in the matching ADM1 as boosted, links geography, infers country."""
    # person/org-suppressed candidates stay pairable: 'Eugene, OR' resurrects
    # (PersonNameFilter + PlaceGeocoder.java:594-691 semantics)
    ordered = [c for c in cands
               if not c.filtered_out
               or c.filter_reason in ("person", "person-title")]
    ordered.sort(key=lambda c: c.start)
    for i, c in enumerate(ordered):
        for j in (i + 1, i + 2):
            if j >= len(ordered):
                break
            nxt = ordered[j]
            gap = nxt.start - c.end
            if gap < 0 or gap > 5:
                continue
            admins = [p for p in nxt.places if p.is_admin1 or p.is_country]
            if not admins:
                continue
            comma = "," in text[c.end:nxt.start]
            close = gap <= 2             # ", " / " " — no intervening word
            for adm in admins:
                boosted = [p for p in c.places
                           if p.cc == adm.cc
                           and (not adm.is_admin1 or p.adm1 == adm.adm1
                                or p.place_id == adm.place_id)]
                if not boosted:
                    continue
                # weight 10 + 2·comma + 4·close (NameCodeRule.java:538):
                # "San Francisco to Bolivia" pairs at distance 4 but gets
                # neither bonus, so a well-known name keeps its own geography
                wt = 1.0 + (0.2 if comma else 0.0) + (0.4 if close else 0.0)
                for p in boosted:
                    c.score_place(p, wt, "NameCode")
                c.linked_admin = adm
                c.is_person = False          # qualified name resurrects place
                if c.filter_reason in ("person", "person-title"):
                    c.filtered_out = False
                    c.filter_reason = None
                if adm.is_admin1:
                    # span merge "NAME, ADMIN" only when hierarchical paths
                    # align (updateRelatedNames, PlaceGeocoder.java:575-583);
                    # a trailing COUNTRY stays its own mention
                    c.merged_end = nxt.end
                    nxt.filtered_out = True  # admin mention merges into NAME
                    nxt.filter_reason = "merged-into-name"
                scope.country(adm.cc)
                scope.admin(adm.hierarchical_path if adm.is_admin1 else None)
                # un-filter codes resurrected by qualification (e.g. 'CA')
                break
            if c.linked_admin:
                break


# --- F13: person/org negation (PersonNameFilter.java, PlaceGeocoder.java:594-691)

def person_org_filter(cands: list[PlaceCandidate],
                      taxons: list[tuple], text: str) -> None:
    """Taxon spans (person/org) suppress coinciding place candidates;
    person titles before a name also suppress; NameCode qualification
    resurrects (handled in name_code_rule which runs after)."""
    import bisect
    spans = sorted((s, e, kind) for (s, e, _m, kind, _c, _cc) in taxons
                   if kind in ("person", "org"))
    span_starts = [s for s, _e, _k in spans]
    max_span = max((e - s for s, e, _k in spans), default=0)
    for c in cands:
        if c.filtered_out:
            continue
        # containment needs s <= c.start, so only spans starting within
        # max_span chars before c.start can cover it (bisect window — the
        # all-spans scan was quadratic on taxon-dense giant turns)
        lo = bisect.bisect_left(span_starts, c.start - max_span)
        hi = bisect.bisect_right(span_starts, c.start)
        for s, e, kind in spans[lo:hi]:
            if c.start >= s and c.end <= e:
                c.filtered_out = True
                c.filter_reason = "person" if kind == "person" else "org"
                c.is_person = kind == "person"
                c.is_org = kind == "org"
                break
        if c.filtered_out:
            continue
        pre = text[max(0, c.start - 12):c.start].strip().lower()
        title = pre.split()[-1].strip(".") if pre.split() else ""
        if title in data.PERSON_TITLES:
            c.filtered_out = True
            c.filter_reason = "person-title"
            c.is_person = True


# --- K6: MajorPlaceRule --------------------------------------------------------

def major_place_rule(cands: list[PlaceCandidate], scope: "Scope") -> None:
    """Capitals +0.4, admin1 +0.2, population ln(pop)-10 scaled (pop>50k),
    +0.2 when the country is mentioned (MajorPlaceRule.java:45-235)."""
    for c in cands:
        if c.filtered_out:
            continue
        for p in c.places:
            if p.feat_code == "PPLC":
                c.score_place(p, 0.4, "MajorPlace.capital")
            elif p.is_admin1:
                c.score_place(p, 0.2, "MajorPlace.admin")
            # population stats are city stats (cities15000 via geohash-5,
            # PlaceGeocoder.java:246-255) — P/A features only, not countries
            if p.pop > 50000 and p.feat_class == "P" or (p.is_admin1 and p.pop > 50000):
                c.score_place(p, max(0.0, math.log(p.pop) - 10) * 0.05,
                              "MajorPlace.pop")
                scope.country(p.cc)
            if p.cc in scope.mentioned_countries:
                c.score_place(p, 0.2, "MajorPlace.inCountry")


# --- K10: ContextualOrganizationRule ---------------------------------------------

def contextual_org_rule(cands: list[PlaceCandidate], scope: "Scope") -> None:
    """Un-filter org-suppressed city names when a boundary for them is in
    scope (rules/ContextualOrganizationRule.java:1-64): 'Cleveland Clinic'
    suppressed as org, but with Ohio in scope Cleveland reads as a place."""
    for c in cands:
        if not c.filtered_out or c.filter_reason != "org":
            continue
        for p in c.places:
            if p.adm1 and p.hierarchical_path in scope.admins:
                c.filtered_out = False
                c.filter_reason = None
                c.is_org = False
                c.add_rule("ContextualOrg")
                break


# --- K9: NameRule — "city of X" / "X province" qualifiers ------------------------

_CITY_QUALIFIERS = ("city of", "town of", "village of", "port of", "city")
_ADMIN_QUALIFIERS = ("province", "county", "district", "state", "prefecture")


def name_rule(cands: list[PlaceCandidate], text: str) -> None:
    """+1-equivalent boost to matching feature types when a qualifier
    prefix/suffix is adjacent (rules/NameRule.java:25-141)."""
    low = text.lower()
    for c in cands:
        if c.filtered_out and c.filter_reason not in ("person", "person-title"):
            continue
        pre = low[max(0, c.start - 12):c.start].strip()
        post = low[c.end:c.end + 12].strip()
        city_q = any(pre.endswith(q) for q in _CITY_QUALIFIERS)
        admin_q = any(post.startswith(q) for q in _ADMIN_QUALIFIERS)
        if (city_q or admin_q) and c.filtered_out:
            # 'city of Paris' is a place even when the bare name is a person
            c.filtered_out = False
            c.filter_reason = None
            c.is_person = False
        if city_q:
            for p in c.places:
                if p.feat_class == "P":
                    c.score_place(p, 0.1, "NameRule.city")
        if admin_q:
            for p in c.places:
                if p.feat_class == "A":
                    c.score_place(p, 0.1, "NameRule.admin")


# --- K7/J5: province containment ------------------------------------------------

def province_association_rule(cands: list[PlaceCandidate], scope: "Scope") -> None:
    for c in cands:
        if c.filtered_out:
            continue
        for p in c.places:
            if p.adm1 and p.hierarchical_path in scope.admins:
                c.score_place(p, 0.5, "ProvinceAssoc")


# --- K8/J3: coordinate proximity -------------------------------------------------

def coordinate_association_rule(cands: list[PlaceCandidate],
                                coords: list[tuple[float, float]],
                                scope: "Scope") -> None:
    """Weight 5 x proximity within 10 km
    (rules/CoordinateAssociationRule.java:30-138).

    Entity-dense giant turns can carry thousands of coords AND thousands of
    candidate geos, so the naive coords x geos haversine sweep is quadratic
    (measured 270 s on a 1 MB adversarial turn).  Bound it: coords dedupe to
    ~11 m resolution and bucket into 0.2-degree latitude bands — latitude
    difference alone lower-bounds great-circle distance, so only coords in
    the geo's own +/-1 band can be within 10 km — and per-geo best proximity
    memoizes across mentions of the same location."""
    if not coords:
        return
    uniq = {(round(lat, 4), round(lon, 4)) for lat, lon in coords}
    for lat, lon in uniq:
        scope.coord_geohashes.add(geohash_encode(lat, lon, 5))
    bands: dict[int, list[tuple[float, float]]] = {}
    for lat, lon in uniq:
        bands.setdefault(int(lat // 0.2), []).append((lat, lon))
    memo: dict[tuple[float, float], float] = {}

    def best_proximity(glat: float, glon: float) -> float:
        key = (glat, glon)
        hit = memo.get(key)
        if hit is not None:
            return hit
        best = 0.0
        for band in {int((glat - 0.1) // 0.2), int(glat // 0.2),
                     int((glat + 0.1) // 0.2)}:
            for lat, lon in bands.get(band, ()):
                d = haversine_m(lat, lon, glat, glon)
                if d < 10000:
                    best = max(best, 1.0 - d / 10000.0)
        memo[key] = best
        return best

    for c in cands:
        if c.filtered_out:
            continue
        for p in c.places:
            prox = best_proximity(p.lat, p.lon)
            if prox > 0.0:
                c.score_place(p, 0.5 * prox, "Coordinate.proximity")
                c.evidence_cc.add(p.cc)
                c.add_rule("Coordinate.proximity")


# --- A4/K-heatmap: geohash co-location --------------------------------------------

def heatmap_rule(cands: list[PlaceCandidate]) -> None:
    """Candidate geos sharing geohash-3 cells with other candidates' geos
    boost each other (rules/HeatMapRule.java:52-132)."""
    bins: dict[str, set[int]] = {}
    for ci, c in enumerate(cands):
        if c.filtered_out:
            continue
        for p in c.places:
            bins.setdefault(geohash_encode(p.lat, p.lon, 3), set()).add(ci)
    for c in cands:
        if c.filtered_out:
            continue
        for p in c.places:
            gh = geohash_encode(p.lat, p.lon, 3)
            if len(bins.get(gh, ())) > 1:
                c.score_place(p, 0.1, "HeatMap")


# --- K11-K13: chooser + confidence -------------------------------------------------

class Scope:
    """Per-turn inferred geography (the reference's document-scope state:
    relevantCountries/relevantProvinces, PlaceGeocoder.java:400-411)."""

    def __init__(self):
        self.countries: dict[str, int] = {}
        self.mentioned_countries: set[str] = set()
        self.admins: set[str] = set()
        self.coord_geohashes: set[str] = set()
        self.preferred_ccs: set[str] = set()
        self.preferred_geohashes: set[str] = set()

    def set_preferences(self, ccs, locations) -> None:
        """Xlayer request options preferred_countries / preferred_locations
        (TaggerResource.java:176-224)."""
        self.preferred_ccs = {c.upper() for c in (ccs or [])}
        self.preferred_geohashes = {geohash_encode(lat, lon, 5)
                                    for lat, lon in (locations or [])}

    def country(self, cc: str | None, mentioned: bool = False) -> None:
        if cc:
            self.countries[cc] = self.countries.get(cc, 0) + 1
            if mentioned:
                self.mentioned_countries.add(cc)

    def admin(self, path: str | None) -> None:
        if path:
            self.admins.add(path)


def location_chooser_rule(cands: list[PlaceCandidate], scope: Scope) -> None:
    """Final scoring scalar (country-ratio/preferred boosts,
    LocationChooserRule.java:186-295), argmax choose (top-2,
    PlaceCandidate.java:331-397) and confidence (K13,
    LocationChooserRule.java:297-602)."""
    total_mentions = max(1, sum(scope.countries.values()))
    for c in cands:
        if c.filtered_out:
            continue
        for p in c.places:
            ratio = scope.countries.get(p.cc, 0) / total_mentions
            if ratio > 0:
                contains = 3.0 if p.hierarchical_path in scope.admins else 1.0
                c.score_place(p, 0.5 * ratio * contains, "LocationChooser.country")
            if scope.coord_geohashes and any(
                    geohash_encode(p.lat, p.lon, 5)[:4] == gh[:4]
                    for gh in scope.coord_geohashes):
                c.score_place(p, 1.0, "LocationChooser.geohash")
            # K11 preferred boosts (LocationChooserRule.java:186-295):
            # preferred country +0.5, preferred-location geohash prefix +1.0
            if p.cc in scope.preferred_ccs:
                c.score_place(p, 0.5, "LocationChooser.preferCountry")
            if scope.preferred_geohashes and any(
                    geohash_encode(p.lat, p.lon, 5)[:4] == gh[:4]
                    for gh in scope.preferred_geohashes):
                c.score_place(p, 1.0, "LocationChooser.preferLocation")

        ranked = sorted(c.places,
                        key=lambda p: (-c.total_score(p), -p.id_bias, p.place_id))
        if ranked:
            c.chosen = ranked[0]
            c.second = ranked[1] if len(ranked) > 1 else None
        _assess_confidence(c, scope)


def _assess_confidence(c: PlaceCandidate, scope: Scope) -> None:
    """Deterministic confidence tiers per the documented recipe (SURVEY.md
    §2.7 K13; LocationChooserRule.java:297-602): absolute base + qualifiers,
    clamped 0..100.

    Also assesses the RUNNER-UP as-if-chosen and records the delta
    (``alt_conf_delta``) — the K12 second-choice confidence signal
    (PlaceCandidate.java:331-397 keeps the second choice scored; near-zero
    delta = the tie case the reference's ambiguity qualifiers penalize)."""
    if not c.chosen:
        c.confidence = 0
        return
    c.confidence = _confidence_of(c, scope, c.chosen, c.second)
    if c.second is not None:
        c.alt_conf_delta = c.confidence - _confidence_of(
            c, scope, c.second, c.chosen)


def _confidence_of(c: PlaceCandidate, scope: Scope, p, second) -> int:
    distinct_geos = len({q.place_id for q in c.places})
    distinct_ccs = len({q.cc for q in c.places})

    # bare-acronym gate: an upper-case short token whose gazetteer entries
    # are codes or plain names (not published abbreviations like 'DPRK',
    # 'NYC') is noise unless qualified or coordinate-backed
    bare_acronym = (c.is_acronym and not c.is_abbreviation
                    and c.linked_admin is None
                    and "Coordinate.proximity" not in c.rules)
    if "Coordinate.proximity" in c.rules:
        conf = 90
    elif bare_acronym:
        conf = 10
    elif c.linked_admin is not None:
        conf = 65                     # NAME, ADMIN qualified
    elif distinct_geos == 1 and not c.is_acronym:
        conf = 70
    elif distinct_ccs == 1:
        conf = 50
    else:
        conf = 40

    conf += int(feat_weight(p) * 0.2)
    if c.text.islower():
        conf -= 10
        if p.is_admin1:
            conf += 15
        elif p.feat_class == "P":
            conf += 10
    if len(c.text) < 5 and c.linked_admin is None and not c.is_country:
        conf -= 10
    conf += min(len(c.text), 12) // 4
    if distinct_ccs == 1 and not c.is_country:
        conf += 8
    if p.pop > 1000000:
        conf += 5
    if p.cc in scope.mentioned_countries:
        conf += 5
    if second is not None:
        s1, s2 = c.total_score(p), c.total_score(second)
        if s2 > 0 and s1 / max(s2, 1e-9) > 1.2:
            conf += 5
    # K13 "preferred +5": the CHOSEN geo matched a caller preference
    if ((id(p), "LocationChooser.preferCountry") in c.scores
            or (id(p), "LocationChooser.preferLocation") in c.scores):
        conf += 5
    return max(0, min(100, conf))
