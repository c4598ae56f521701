"""Reverse geocoding: broadcast spatial grid index (SURVEY.md §2.5 J4, §2.8 O3/O4).

The reference answers ``placesAt(latlon, radiusKM)`` with a Solr
``{!geofilt}`` query (SolrGazetteer.java:131-159) and resolves each found
coordinate to its nearest populated place (top-5 nearby, 25/50 km fallbacks,
PlaceGeocoder.java:874-978).  Here the gazetteer's located rows bucket into a
0.5-degree grid (~55 km cells) built once per executor; a query scans the
3x3 neighborhood and ranks by haversine — a broadcast spatial range join.
"""

from __future__ import annotations

import heapq
import math

from ..functions.geo import haversine_m
from . import data
from .matcher import Place

_CELL_DEG = 0.5


def _cell(lat: float, lon: float) -> tuple[int, int]:
    return int(math.floor(lat / _CELL_DEG)), int(math.floor(lon / _CELL_DEG))


class SpatialIndex:
    def __init__(self, places: list[Place]):
        self.grid: dict[tuple[int, int], list[Place]] = {}
        seen: set[str] = set()
        for p in places:
            # one entry per place_id; P/A features only (the reference's
            # fallback classes, PlaceGeocoder.java:962-965); country
            # centroids (PCL*) are not meaningful nearest-place anchors
            if (p.place_id in seen or p.feat_class not in ("P", "A")
                    or not p.cc or p.feat_code.startswith("PCL")):
                continue
            seen.add(p.place_id)
            self.grid.setdefault(_cell(p.lat, p.lon), []).append(p)

    def places_at(self, lat: float, lon: float, radius_km: float = 50,
                  limit: int = 5) -> list[tuple[float, Place]]:
        """Nearest places within radius, ascending distance, capped at
        ``limit`` (the reference's max=5 nearby places)."""
        ci, cj = _cell(lat, lon)
        reach = max(1, int(math.ceil(radius_km / 55.0)))
        cand: list[tuple[float, str, Place]] = []
        for di in range(-reach, reach + 1):
            for dj in range(-reach, reach + 1):
                for p in self.grid.get((ci + di, cj + dj), ()):
                    d = haversine_m(lat, lon, p.lat, p.lon)
                    if d <= radius_km * 1000:
                        cand.append((d, p.place_id, p))
        top = heapq.nsmallest(limit, cand)
        return [(d, p) for d, _pid, p in top]


_INDEX = None          # SpatialIndex | store.CompactSpatialIndex
_INDEX_SRC = None      # what the cached index was built from


def spatial_index():
    global _INDEX, _INDEX_SRC
    from . import matcher
    src = matcher._GAZ_PATH or matcher._GAZ_ROWS or data.GAZETTEER_ROWS
    if _INDEX is None or _INDEX_SRC is not src:
        if matcher._GAZ_PATH is not None:
            from .mmapstore import MmapSpatialIndex, is_mmap_artifact
            if is_mmap_artifact(matcher._GAZ_PATH):
                # shared-memory scale path: grid lives in the mmap artifact
                _INDEX = MmapSpatialIndex(matcher._GAZ_PATH)
            else:
                # scale path: array-backed grid from the tagger parquet
                from .store import CompactSpatialIndex
                _INDEX = CompactSpatialIndex(matcher._GAZ_PATH)
        else:
            rows = matcher._GAZ_ROWS if matcher._GAZ_ROWS is not None \
                else data.GAZETTEER_ROWS
            _INDEX = SpatialIndex([Place(*r) for r in rows])
        _INDEX_SRC = src
    return _INDEX


def reverse_geocode(lat: float, lon: float) -> dict:
    """Coordinate -> related-place attributes for the coord match
    (Transforms.java geo fields related_place_name / nearest_places).

    ``nearest_places``: top-5 place names within 50 km, nearest first
    (PlaceGeocoder.java:917-941 emits max 5 nearby places per coordinate).
    ``adm1_name``: ProvinceNameSetter resolution for the related place."""
    # ONE grid query serves both the nearest-place choice (populated place
    # at 25 km, P/A fallback at 50 km — PlaceGeocoder.java:898-978) and the
    # top-5 name list; three separate radius queries per coordinate showed
    # up in the round-2 bench
    near = spatial_index().places_at(lat, lon, 50, limit=10)
    if not near:
        return {}
    p = next((q for d, q in near if d <= 25_000 and q.feat_class == "P"),
             None)
    if p is None:
        p = next((q for _d, q in near if q.feat_class in ("P", "A")), None)
    if p is None:
        return {}
    return {"cc": p.cc, "adm1": p.adm1 or None, "name": p.name,
            "place_id": p.place_id,
            "adm1_name": data.ADM1_NAMES.get(p.hierarchical_path),
            "nearest_places": [q.name for _d, q in near[:5]] or None}
