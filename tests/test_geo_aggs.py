"""Geo surface (haversine distance query/sort, geotile_grid) and the
boxplot / string_stats aggregations: semantics vs pure-Python
references on tiny frames."""

from __future__ import annotations

import math
import sys
from collections import Counter
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.facets import (  # noqa: E402
    boxplot_facets,
    string_stats_facets,
)
from embed_rerank_spark.operators.geo import (  # noqa: E402
    EARTH_RADIUS_KM,
    geo_bounding_box_count,
    geo_distance_topk,
    geotile_grid,
    with_derived_geo,
)

DOCS = [
    (1, "fast hash join", "en", 101),
    (2, "slow table scan", "en", 205),
    (3, "hash table lookup fast", "de", 150),
    (4, "merge sort merge", "en", 99),
    (5, "scan scan row", "fr", 310),
    (6, "a lone row", "en", 77),
]
SCHEMA = "doc_id long, text string, lang string, n_chars long"


def _py_haversine(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2
    dl = math.radians(lon2 - lon1) / 2
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def _py_geo(doc_id):
    lon = (doc_id * 2654435761 % 360000000) / 1e6 - 180.0
    lat = (doc_id * 40503 % 170000000) / 1e6 - 85.0
    return lon, lat


def test_derived_geo_matches_python_and_bounds(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    rows = with_derived_geo(docs).select("doc_id", "lon", "lat").collect()
    for r in rows:
        lon, lat = _py_geo(r["doc_id"])
        assert r["lon"] == pytest.approx(lon, abs=1e-12)
        assert r["lat"] == pytest.approx(lat, abs=1e-12)
        assert -180.0 <= r["lon"] < 180.0 and -85.0 <= r["lat"] < 85.0


def test_geo_distance_topk_matches_python(spark):
    docs = with_derived_geo(spark.createDataFrame(DOCS, SCHEMA))
    origin_lat, origin_lon, radius = 20.0, 10.0, 9000.0
    got = [
        (r["rank"], r["doc_id"], r["distance_km"])
        for r in geo_distance_topk(docs, origin_lat, origin_lon, radius, k=4).collect()
    ]
    dists = []
    for doc_id, *_ in DOCS:
        lon, lat = _py_geo(doc_id)
        d = _py_haversine(lat, lon, origin_lat, origin_lon)
        if d <= radius:
            dists.append((d, doc_id))
    dists.sort()
    want = [(i + 1, doc_id, round(d, 6)) for i, (d, doc_id) in enumerate(dists[:4])]
    assert got == want


def test_geo_bounding_box_count(spark):
    docs = with_derived_geo(spark.createDataFrame(DOCS, SCHEMA))
    top, left, bottom, right = 85.0, -180.0, -85.0, 0.0
    n = geo_bounding_box_count(docs, top, left, bottom, right).collect()[0]["n_docs"]
    want = sum(1 for doc_id, *_ in DOCS if _py_geo(doc_id)[0] <= 0.0)
    assert n == want


def test_geotile_grid_matches_python(spark):
    docs = with_derived_geo(spark.createDataFrame(DOCS, SCHEMA))
    zoom = 4
    got = {
        (r["tile_x"], r["tile_y"]): r["n_docs"]
        for r in geotile_grid(docs, zoom).collect()
    }
    n = float(1 << zoom)
    want: Counter = Counter()
    for doc_id, *_ in DOCS:
        lon, lat = _py_geo(doc_id)
        phi = math.radians(lat)
        x = math.floor((lon + 180.0) / 360.0 * n)
        y = math.floor((1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi) / 2.0 * n)
        x = min(max(x, 0), int(n) - 1)
        y = min(max(y, 0), int(n) - 1)
        want[(x, y)] += 1
    assert got == dict(want)


def _quantile(sorted_vals, p):
    # R-7 linear interpolation, the Spark `percentile` definition
    idx = (len(sorted_vals) - 1) * p
    lo, hi = math.floor(idx), math.ceil(idx)
    return sorted_vals[lo] + (idx - lo) * (sorted_vals[hi] - sorted_vals[lo])


def test_boxplot_facets_matches_python(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    queries = [(1, "fast scan"), (2, "merge")]
    got = {r["query_id"]: r for r in boxplot_facets(spark, docs, queries, "n_chars").collect()}
    toks = {d: set(t.split()) for d, t, *_ in DOCS}
    nchars = {d: float(c) for d, _, _, c in DOCS}
    for qid, q in queries:
        match = sorted(nchars[d] for d in toks if toks[d] & set(q.split()))
        r = got[qid]
        q1, q2, q3 = (_quantile(match, p) for p in (0.25, 0.5, 0.75))
        assert r["n_docs"] == len(match)
        assert r["min_v"] == match[0] and r["max_v"] == match[-1]
        assert (r["q1"], r["q2"], r["q3"]) == pytest.approx((q1, q2, q3))
        assert r["iqr"] == pytest.approx(q3 - q1)
        assert r["lower_fence"] == pytest.approx(q1 - 1.5 * (q3 - q1))
        assert r["upper_fence"] == pytest.approx(q3 + 1.5 * (q3 - q1))


def test_string_stats_facets_matches_python(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    queries = [(1, "fast scan")]
    r = string_stats_facets(spark, docs, queries, "text").collect()[0]
    toks = {d: set(t.split()) for d, t, *_ in DOCS}
    texts = [t for d, t, *_ in DOCS if toks[d] & {"fast", "scan"}]
    counts = Counter("".join(texts))
    n = sum(counts.values())
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
    assert r["n_docs"] == len(texts)
    assert r["min_length"] == min(len(t) for t in texts)
    assert r["max_length"] == max(len(t) for t in texts)
    assert r["avg_length"] == pytest.approx(sum(map(len, texts)) / len(texts))
    assert r["entropy"] == pytest.approx(entropy)


def test_geo_bounds_centroid_grouped(spark):
    from embed_rerank_spark.operators.geo import geo_bounds_centroid

    docs = with_derived_geo(spark.createDataFrame(DOCS, SCHEMA))
    got = {r["group"]: r for r in geo_bounds_centroid(docs, "lang").collect()}
    langs = {}
    for doc_id, _, lang, _ in DOCS:
        langs.setdefault(lang, []).append(_py_geo(doc_id))
    for lang, pts in langs.items():
        r = got[lang]
        lons = [p[0] for p in pts]
        lats = [p[1] for p in pts]
        assert r["n_docs"] == len(pts)
        assert (r["min_lat"], r["max_lat"]) == pytest.approx((min(lats), max(lats)))
        assert (r["min_lon"], r["max_lon"]) == pytest.approx((min(lons), max(lons)))
        assert r["centroid_lat"] == pytest.approx(sum(lats) / len(lats))
        assert r["centroid_lon"] == pytest.approx(sum(lons) / len(lons))


def test_diversified_sampler_caps_per_value(spark):
    from embed_rerank_spark.operators.facets import diversified_sampler_stats

    # all docs match "row scan"; lang 'en' has 4 docs -> capped to 2
    docs = spark.createDataFrame(
        [
            (1, "row scan", "en", 10),
            (2, "row scan scan", "en", 20),
            (3, "row", "en", 30),
            (4, "scan", "en", 40),
            (5, "row row scan", "de", 50),
            (6, "scan row", "fr", 60),
        ],
        SCHEMA,
    )
    r = diversified_sampler_stats(
        spark, docs, [(1, "row scan")], dedup_col="lang",
        max_docs_per_value=2, shard_size=100,
    ).collect()[0]
    # 2 en + 1 de + 1 fr survive = 4 docs
    assert r["n_docs"] == 4


def test_trending_keys_counts_empty_windows_as_zero(spark):
    from embed_rerank_spark.operators.events import trending_keys

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 'a': 2 events day0, 0 day1, 1 day2 -> mean 1.0 over 3 windows
    for d, n in [(0, 2), (2, 1)]:
        rows += [(base + dt.timedelta(days=d, minutes=i), "a") for i in range(n)]
    # 'b': 1 event each day -> flat, lift 1.0 everywhere
    rows += [(base + dt.timedelta(days=d), "b") for d in range(3)]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {
        (r["window_start"], r["event_type"]): r
        for r in trending_keys(ev, "1 day", key_col="event_type", min_lift=1.1).collect()
    }
    # only a@day0 trends: n=2 vs expected 1.0 (3 windows exist thanks to 'b')
    assert len(got) == 1
    ((_, key),) = got.keys()
    assert key == "a"
    r = next(iter(got.values()))
    assert r["n_events"] == 2 and r["lift"] == pytest.approx(2.0)
    # std over {2,0,1}: mean 1, var 2/3 -> z = (2-1)/sqrt(2/3)
    assert r["z_score"] == pytest.approx(round(1 / math.sqrt(2 / 3), 6))


def test_change_points_detects_step_and_matches_cusum_reference(spark):
    import datetime as dt

    from embed_rerank_spark.operators.events import change_points

    base = dt.datetime(2024, 3, 1)
    # 'step': daily mean 10.0 for 5 days then 20.0 for 5 days — change
    # point must land on day 4 (the last low bucket, argmax |CUSUM|).
    # 'flat': constant series — all CUSUM 0, earliest bucket wins.
    # 'single': one bucket — no change point by contract.
    rows = []
    for d in range(10):
        v = 10.0 if d < 5 else 20.0
        # two events per bucket so the bucket mean is an actual avg
        rows += [
            (base + dt.timedelta(days=d, hours=1), "step", v - 1.0),
            (base + dt.timedelta(days=d, hours=2), "step", v + 1.0),
        ]
    rows += [(base + dt.timedelta(days=d), "flat", 7.0) for d in range(4)]
    rows += [(base, "single", 3.0)]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = {r["event_type"]: r for r in change_points(ev, "1 day").collect()}

    # python CUSUM reference for 'step'
    xs = [10.0] * 5 + [20.0] * 5
    xbar = sum(xs) / len(xs)
    cusum, s = [], 0.0
    for x in xs:
        s += x - xbar
        cusum.append(round(s, 6))
    cp_i = max(range(len(xs)), key=lambda i: (abs(cusum[i]), -i))
    assert cp_i == 4
    r = got["step"]
    assert r["n_buckets"] == 10
    assert r["cp_ts"] == int((base + dt.timedelta(days=4)).timestamp())
    assert r["cusum_max"] == abs(cusum[cp_i]) == 25.0
    assert r["mean_before"] == 10.0 and r["mean_after"] == 20.0
    assert r["delta"] == 10.0

    # flat series: cp = earliest bucket, delta 0
    r = got["flat"]
    assert r["cusum_max"] == 0.0
    assert r["cp_ts"] == int(base.timestamp())
    assert r["delta"] == 0.0

    # single bucket: no change point
    r = got["single"]
    assert r["n_buckets"] == 1 and r["cp_ts"] is None
    assert r["delta"] == 0.0 and r["mean_after"] is None


def test_geohash_grid_known_value_and_counts(spark):
    """Geohash encoding pinned against the classic published example
    (57.64911N 10.40744E -> u4pruyd) at several precisions, plus
    bucket counting and the +180/+90 edge clamp."""
    from embed_rerank_spark.operators.geo import geohash_grid

    pts = spark.createDataFrame(
        [
            (1, 10.40744, 57.64911),   # u4pruyd (Wikipedia example)
            (2, 10.40744, 57.64911),   # same cell -> counts together
            (3, -0.1278, 51.5074),     # London: gcpvj..
            (4, 180.0, 90.0),          # edge: clamps into the last cell
        ],
        "doc_id long, lon double, lat double",
    )
    g7 = {r.geohash: r.n_docs for r in geohash_grid(pts, precision=7).collect()}
    assert g7["u4pruyd"] == 2
    assert any(h.startswith("gcpvj") for h in g7)
    assert len(g7) == 3  # two distinct singles + the doubled cell
    g1 = {r.geohash: r.n_docs for r in geohash_grid(pts, precision=1).collect()}
    assert g1["u"] == 2 and g1["g"] == 1
    # precision bounds rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        geohash_grid(pts, precision=0)
    # min_doc_count prunes singleton cells
    g7b = {r.geohash for r in geohash_grid(pts, precision=7, min_doc_count=2).collect()}
    assert g7b == {"u4pruyd"}


def test_geohash_matches_interval_subdivision_reference(spark):
    """The closed-form floor/interleave encoder == the textbook
    interval-subdivision geohash, randomized over the globe and
    precisions 1..8 (pure-Python reference implemented from the
    published algorithm)."""
    import numpy as np

    from embed_rerank_spark.operators.geo import GEOHASH_ALPHABET, geohash_grid

    def reference_geohash(lat: float, lon: float, precision: int) -> str:
        lat_lo, lat_hi = -90.0, 90.0
        lon_lo, lon_hi = -180.0, 180.0
        bits, code, even = 0, 0, True
        out = []
        while len(out) < precision:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    code = code * 2 + 1
                    lon_lo = mid
                else:
                    code = code * 2
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    code = code * 2 + 1
                    lat_lo = mid
                else:
                    code = code * 2
                    lat_hi = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(GEOHASH_ALPHABET[code])
                bits, code = 0, 0
        return "".join(out)

    rng = np.random.default_rng(42)
    pts = [
        (i, float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)))
        for i in range(40)
    ]
    df = spark.createDataFrame(pts, "doc_id long, lon double, lat double")
    for precision in (1, 3, 5, 8):
        got = sorted(
            r.geohash for r in geohash_grid(df, precision=precision).collect()
            for _ in range(r.n_docs)
        )
        want = sorted(reference_geohash(lat, lon, precision) for _, lon, lat in pts)
        assert got == want, f"precision {precision}"


def test_geo_distance_rings_matches_python(spark):
    from embed_rerank_spark.operators.geo import geo_distance_rings

    docs = with_derived_geo(spark.createDataFrame(DOCS, SCHEMA))
    edges = [2000.0, 6000.0, 12000.0]
    got = geo_distance_rings(docs, 20.0, 10.0, edges).collect()
    # python reference: half-open [from, to) rings, last open
    counts = Counter()
    for (doc_id, *_rest) in DOCS:
        lon, lat = _py_geo(doc_id)
        d = _py_haversine(lat, lon, 20.0, 10.0)
        ring = len(edges)
        for i, e in enumerate(edges):
            if d < e:
                ring = i
                break
        counts[ring] += 1
    assert [r["ring"] for r in got] == [0, 1, 2, 3]
    for r in got:
        assert r["n_docs"] == counts.get(r["ring"], 0)
        if r["ring"] == 0:
            assert r["from_km"] == 0.0
        if r["ring"] == len(edges):
            assert r["to_km"] is None
    assert sum(r["n_docs"] for r in got) == len(DOCS)


def test_geo_distance_rings_rejects_bad_edges(spark):
    from embed_rerank_spark.operators.geo import geo_distance_rings

    docs = with_derived_geo(spark.createDataFrame(DOCS, SCHEMA))
    with pytest.raises(ValueError):
        geo_distance_rings(docs, 0.0, 0.0, [])
    with pytest.raises(ValueError):
        geo_distance_rings(docs, 0.0, 0.0, [-5.0, 100.0])
