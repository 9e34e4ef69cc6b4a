"""Geo queries/aggs — pinned against brute-force Python haversine and
Web-Mercator tiling over the collected corpus (same formulas, float64),
plus request-validation edges.
"""

import math

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.query import geo
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERY = f"{_V[0]} {_V[3]} {_V[7]}"
ORIGIN = (12.5, -33.25)
Z = 4


def _latlon(doc_id: int) -> tuple[float, float]:
    r = doc_id % 100000
    return (
        (r * 7919) % 16000 / 100.0 - 80.0,
        (r * 104729) % 36000 / 100.0 - 180.0,
    )


@pytest.fixture(scope="module")
def geodocs(corpus):
    r = F.pmod(F.col("doc_id"), F.lit(100000))
    return corpus.withColumn(
        "lat", F.pmod(r * 7919, F.lit(16000)) / 100.0 - 80.0
    ).withColumn(
        "lon", F.pmod(r * 104729, F.lit(36000)) / 100.0 - 180.0
    )


@pytest.fixture(scope="module")
def rows(corpus):
    terms = set(tokenize_str(QUERY))
    out = []
    for r in corpus.select("doc_id", "text").collect():
        lat, lon = _latlon(r["doc_id"])
        out.append(
            (r["doc_id"], lat, lon, bool(terms & set(tokenize_str(r["text"]))))
        )
    return out


def _hav(lat, lon):
    olat, olon = ORIGIN
    rad = math.pi / 180.0
    a = (
        math.sin((lat - olat) * rad / 2) ** 2
        + math.cos(lat * rad)
        * math.cos(olat * rad)
        * math.sin((lon - olon) * rad / 2) ** 2
    )
    return round(2 * geo.EARTH_RADIUS_KM * math.asin(math.sqrt(a)), 3)


def test_geo_distance_topk(geodocs, rows):
    want = sorted(
        ((_hav(lat, lon), did) for did, lat, lon, _ in rows
         if _hav(lat, lon) <= 6000.0),
    )[:15]
    got = geo.geo_distance_topk(geodocs, *ORIGIN, 6000.0, 15).collect()
    assert [(r["dist_km"], r["doc_id"]) for r in got] == [
        (pytest.approx(d, abs=1e-9), i) for d, i in want
    ]


def test_geo_bounding_box(geodocs, rows):
    want = sorted(
        did for did, lat, lon, _ in rows
        if -20 <= lat <= 40 and -100 <= lon <= 30
    )
    got = geo.geo_bounding_box(geodocs, 40.0, -100.0, -20.0, 30.0).collect()
    assert [r["doc_id"] for r in got] == want
    with pytest.raises(ValueError):
        geo.geo_bounding_box(geodocs, -20.0, -100.0, 40.0, 30.0)


def _tile(lat, lon):
    n = 1 << Z
    x = math.floor((lon + 180.0) / 360.0 * n)
    phi = lat * math.pi / 180.0
    y = math.floor(
        (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi)
        / 2.0 * n
    )
    x = max(0, min(x, n - 1))
    y = max(0, min(y, n - 1))
    return f"{Z}/{x}/{y}"


def test_geotile_grid(geodocs, rows):
    counts = {}
    for did, lat, lon, hit in rows:
        if hit:
            t = _tile(lat, lon)
            counts[t] = counts.get(t, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    got = geo.geotile_grid_agg(geodocs, QUERY, Z, 12).collect()
    assert [(r["tile"], r["doc_count"]) for r in got] == want


def test_geo_bounds_and_centroid(geodocs, rows):
    hits = [(lat, lon) for _, lat, lon, hit in rows if hit]
    b = geo.geo_bounds_agg(geodocs, QUERY).first()
    assert b["top_left_lat"] == round(max(h[0] for h in hits), 4)
    assert b["top_left_lon"] == round(min(h[1] for h in hits), 4)
    assert b["bottom_right_lat"] == round(min(h[0] for h in hits), 4)
    assert b["bottom_right_lon"] == round(max(h[1] for h in hits), 4)
    c = geo.geo_centroid_agg(geodocs, QUERY).first()
    assert c["count"] == len(hits)
    assert c["lat"] == pytest.approx(
        sum(h[0] for h in hits) / len(hits), abs=1e-4
    )
    assert c["lon"] == pytest.approx(
        sum(h[1] for h in hits) / len(hits), abs=1e-4
    )


def test_geo_distance_agg(geodocs, rows):
    edges = [3000.0, 8000.0, 14000.0]
    bounds = [None] + edges + [None]
    want = []
    ds = [_hav(lat, lon) for _, lat, lon, hit in rows if hit]
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        want.append(
            sum(
                1 for d in ds
                if (lo is None or d >= lo) and (hi is None or d < hi)
            )
        )
    got = geo.geo_distance_agg(geodocs, QUERY, *ORIGIN, edges).collect()
    assert [r["doc_count"] for r in got] == want
    assert sum(want) == len(ds)  # buckets partition the match set
    assert [r["key"] for r in got] == [
        "*-3000", "3000-8000", "8000-14000", "14000-*"
    ]
    with pytest.raises(ValueError):
        geo.geo_distance_agg(geodocs, QUERY, *ORIGIN, [5.0, 1.0])
