"""Deterministic synthesis of the interleaved-document corpus + fixtures.

BASELINE.json ``input_hint`` pins the corpus shape:
``documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``
— interleaved text+media docs whose ``kind='geo'`` spans carry
``POINT(lon lat)`` WKT.  The driver's own ``documents.parquet`` is a flat
text table, so the span-shaped corpus is synthesized here (seed 42, fully
deterministic, FIXTURES.md §1) under the name ``documents_spans``.

The polygon / route / kNN fixtures mirror the reference's index-scan test
style (small pinned feature sets with exact expected-ID oracles — public
tree: geomesa-index-api/src/test/.../TestGeoMesaDataStore.scala usage in
AccumuloDataStoreQueryTest; mount empty at survey time, SURVEY.md §0).

Everything here is *test/bench input generation* — generation is numpy-
vectorized and cached as parquet so Spark reads it like any other table.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CACHE_DIR = os.environ.get("SPARK_GRAFT_CACHE", "/tmp/geomesa_spark_cache")

#: docs per scale factor — sf0.001 → 2,000 docs (FIXTURES.md §1)
DOCS_PER_SF = 2_000_000

#: hot-cluster centers (inside P1, P2, P5, P10, P12) manufacturing cell skew
HOT_CLUSTERS = [(15.0, 15.0), (-50.0, -20.0), (50.0, 0.0), (-130.0, 30.0), (25.0, -40.0)]

SPAN_SCHEMA = pa.list_(
    pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
)


def sf_of_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def n_docs_for(sf_dir: str) -> int:
    return max(64, int(DOCS_PER_SF * sf_of_dir(sf_dir)))


# ---------------------------------------------------------------------------
# documents_spans
# ---------------------------------------------------------------------------

_EDGE_GEO = [
    "POINT(10 10)",      # exactly on P1 boundary vertex
    "POINT(180 0)",      # antimeridian east
    "POINT(-180 0)",     # antimeridian west
    "POINT(0 85)",       # north clamp
    "POINT(0 -85)",      # south clamp
    "POINT EMPTY",       # empty → must null, not crash
    "POINT(abc def)",    # malformed → must null, not crash
    "POINT(15 15)",      # P1 interior + hot-cluster center
]


def synth_documents_spans(n_docs: int, seed: int = SEED) -> pa.Table:
    """Vectorized construction of the interleaved corpus (no per-doc Python
    except tiny pinned-edge overrides)."""
    rng = np.random.default_rng(seed)

    n_geo = rng.choice(np.array([0, 1, 2]), size=n_docs, p=[0.2, 0.7, 0.1])
    n_geo[: len(_EDGE_GEO)] = 1  # pinned edge docs always carry one geo span
    n_other = rng.integers(2, 8, n_docs)  # ≥1 text + extras
    n_spans = n_other + n_geo
    doc_start = np.concatenate([[0], np.cumsum(n_spans)]).astype(np.int64)
    total = int(doc_start[-1])

    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(doc_start[:-1], n_spans)

    # kinds: 0 text, 1 caption, 2 image, 3 geo
    kind_code = rng.choice(np.array([0, 1, 2]), size=total, p=[0.5, 0.25, 0.25]).astype(np.int8)
    kind_code[doc_start[:-1]] = 0  # first span of every doc is text
    has_geo = n_geo >= 1
    kind_code[doc_start[:-1][has_geo] + 1] = 3  # geo span at position 1
    two_geo = n_geo == 2
    kind_code[doc_start[1:][two_geo] - 1] = 3  # second geo span last

    # geo coordinates: 80% uniform, 20% hot clusters (σ=0.05°)
    geo_idx = np.nonzero(kind_code == 3)[0]
    m = len(geo_idx)
    lon = rng.uniform(-180.0, 180.0, m)
    lat = rng.uniform(-85.0, 85.0, m)
    hot = rng.random(m) < 0.2
    centers = np.asarray(HOT_CLUSTERS)
    which = rng.integers(0, len(centers), m)
    lon = np.where(hot, centers[which, 0] + rng.normal(0, 0.05, m), lon)
    lat = np.where(hot, centers[which, 1] + rng.normal(0, 0.05, m), lat)
    lon = np.clip(lon, -180.0, 180.0)
    lat = np.clip(lat, -85.0, 85.0)

    doc_ids_all = np.char.mod("doc-%08d", np.arange(n_docs))

    # span text
    text = np.empty(total, dtype=object)
    media = np.empty(total, dtype=object)
    media[:] = None
    is_text = kind_code == 0
    is_cap = kind_code == 1
    is_img = kind_code == 2
    doc_of_span = np.repeat(np.arange(n_docs, dtype=np.int64), n_spans)
    tag = np.char.add(
        np.char.add(np.char.mod("%d", doc_of_span), "-"), np.char.mod("%d", pos_in_doc)
    )
    text[is_text] = np.char.add("lorem body text ", tag[is_text])
    text[is_cap] = np.char.add("caption for figure ", tag[is_cap])
    text[is_img] = None
    media[is_img] = np.char.mod("media://img/%07d.jpg", np.nonzero(is_img)[0])
    geo_wkt = np.char.add(
        np.char.add(np.char.add("POINT(", np.char.mod("%.6f", lon)), np.char.add(" ", np.char.mod("%.6f", lat))),
        ")",
    )
    text[geo_idx] = geo_wkt

    # pinned edge docs: override the (position-1) geo span text
    for d, w in enumerate(_EDGE_GEO):
        text[doc_start[d] + 1] = w

    # offsets: cumulative char length within each doc, starting at 0
    lengths = np.array([len(t) + 1 if t is not None else 1 for t in text], dtype=np.int64)
    cum = np.cumsum(lengths)
    doc_base = cum[doc_start[:-1]] - lengths[doc_start[:-1]]
    offset = (cum - lengths - np.repeat(doc_base, n_spans)).astype(np.int32)

    kinds = np.array(["text", "caption", "image", "geo"], dtype=object)[kind_code]

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(text, pa.string()),
            pa.array(media, pa.string()),
            pa.array(offset, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(doc_start, pa.int32()), struct)
    return pa.table({"doc_id": pa.array(doc_ids_all, pa.string()), "spans": spans})


def documents_spans_path(sf_dir: str) -> str:
    n = n_docs_for(sf_dir)
    os.makedirs(CACHE_DIR, exist_ok=True)
    return os.path.join(CACHE_DIR, f"documents_spans_n{n}.parquet")


def ensure_documents_spans(sf_dir: str) -> str:
    """Synthesize (once) and return the parquet path for this scale."""
    path = documents_spans_path(sf_dir)
    if not os.path.exists(path):
        tbl = synth_documents_spans(n_docs_for(sf_dir))
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=16384)
        os.replace(tmp, path)
    return path


def load_documents_spans(spark, sf_dir: str):
    return spark.read.parquet(ensure_documents_spans(sf_dir))


# ---------------------------------------------------------------------------
# polygon fixtures P1..P12 (FIXTURES.md §2 — pinned, oracle-stable)
# ---------------------------------------------------------------------------

def fixture_polygons() -> list[dict]:
    return [
        dict(polygon_id="P1", name="rect-ne", category="rect",
             wkt="POLYGON((10 10, 20 10, 20 20, 10 20, 10 10))"),
        dict(polygon_id="P2", name="rect-sw", category="rect",
             wkt="POLYGON((-60 -30, -40 -30, -40 -10, -60 -10, -60 -30))"),
        dict(polygon_id="P3", name="rect-asia", category="rect",
             wkt="POLYGON((100 40, 120 40, 120 60, 100 60, 100 40))"),
        dict(polygon_id="P4", name="rect-antarctic", category="rect",
             wkt="POLYGON((-10 -75, 30 -75, 30 -50, -10 -50, -10 -75))"),
        dict(polygon_id="P5", name="pentagon", category="convex",
             wkt="POLYGON((45 -5, 55 -5, 58 2, 50 8, 42 2, 45 -5))"),
        dict(polygon_id="P6", name="c-shape", category="concave",
             wkt="POLYGON((70 10, 80 10, 80 12, 73 12, 73 18, 80 18, 80 20, 70 20, 70 10))"),
        dict(polygon_id="P7", name="holed", category="holed",
             wkt="POLYGON((130 -20, 150 -20, 150 0, 130 0, 130 -20), (138 -14, 142 -14, 142 -8, 138 -8, 138 -14))"),
        dict(polygon_id="P8", name="antimeridian", category="antimeridian",
             wkt="POLYGON((175 -5, -175 -5, -175 5, 175 5, 175 -5))"),
        dict(polygon_id="P9", name="tiny", category="tiny",
             wkt="POLYGON((33.3 33.3, 33.31 33.3, 33.31 33.31, 33.3 33.31, 33.3 33.3))"),
        dict(polygon_id="P10", name="huge", category="huge",
             wkt="POLYGON((-150 10, -110 10, -110 50, -150 50, -150 10))"),
        dict(polygon_id="P11", name="sliver", category="degenerate",
             wkt="POLYGON((60 60, 62 62, 61 61, 60 60))"),
        dict(polygon_id="P12", name="rect-hot", category="rect",
             wkt="POLYGON((20 -45, 30 -45, 30 -35, 20 -35, 20 -45))"),
    ]


def fixture_routes() -> list[dict]:
    rng = np.random.default_rng(SEED + 1)
    routes = []
    for i, (lon0, lat0) in enumerate([(14.0, 14.0), (-50.0, -21.0), (49.0, -1.0), (100.5, 41.0)]):
        n = int(rng.integers(5, 51))
        steps = rng.normal(0, 0.08, (n - 1, 2))
        pts = np.vstack([[lon0, lat0], np.cumsum(steps, axis=0) + [lon0, lat0]])
        coords = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
        routes.append(dict(route_id=f"R{i + 1}", name=f"route-{i + 1}", wkt=f"LINESTRING({coords})"))
    return routes


def synth_events_geo(sf_dir: str, seed: int = SEED + 2) -> pa.Table:
    """Timestamped random-walk tracks (FIXTURES.md §4)."""
    n_docs = n_docs_for(sf_dir)
    n_tracks = max(20, n_docs // 100)
    rng = np.random.default_rng(seed)
    n_pts = rng.integers(10, 201, n_tracks)
    total = int(n_pts.sum())
    track_of = np.repeat(np.arange(n_tracks), n_pts)
    start = np.concatenate([[0], np.cumsum(n_pts)]).astype(np.int64)
    pos = np.arange(total) - np.repeat(start[:-1], n_pts)

    base_lon = rng.uniform(-170, 170, n_tracks)
    base_lat = rng.uniform(-80, 80, n_tracks)
    step = rng.normal(0, 0.01, (total, 2))
    step[start[:-1]] = 0.0
    cum = np.cumsum(step, axis=0)
    base_cum = cum[start[:-1]]
    lon = np.repeat(base_lon, n_pts) + cum[:, 0] - np.repeat(base_cum[:, 0], n_pts)
    lat = np.repeat(base_lat, n_pts) + cum[:, 1] - np.repeat(base_cum[:, 1], n_pts)
    lon = np.clip(lon, -180, 180)
    lat = np.clip(lat, -85, 85)

    dt = rng.integers(1, 61, total)
    dt[start[:-1]] = 0
    cumdt = np.cumsum(dt)
    base_dt = cumdt[start[:-1]]
    t0 = np.datetime64("2026-01-01T00:00:00", "s")
    ts = t0 + (cumdt - np.repeat(base_dt, n_pts)).astype("timedelta64[s]")

    return pa.table(
        {
            "event_id": pa.array(np.char.mod("ev-%08d", np.arange(total)), pa.string()),
            "track_id": pa.array(np.char.mod("trk-%05d", track_of), pa.string()),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


def ensure_events_geo(sf_dir: str) -> str:
    n = n_docs_for(sf_dir)
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"events_geo_n{n}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(synth_events_geo(sf_dir), tmp, row_group_size=16384)
        os.replace(tmp, path)
    return path


def fixture_knn_queries() -> list[dict]:
    qs = [
        dict(query_id="Q-ocean", lon=-40.0, lat=-45.0, k=5),    # empty south atlantic → multi-ring
        dict(query_id="Q-hot1", lon=15.0, lat=15.0, k=10),      # densest cluster → ring 0
        dict(query_id="Q-hot2", lon=-50.0, lat=-20.0, k=5),
        dict(query_id="Q-pole", lon=0.0, lat=84.5, k=1),        # pole clamp path
        dict(query_id="Q-anti", lon=179.5, lat=0.0, k=5),       # antimeridian wrap
    ]
    rng = np.random.default_rng(SEED + 3)
    for i in range(5):
        qs.append(
            dict(
                query_id=f"Q-r{i}",
                lon=float(rng.uniform(-170, 170)),
                lat=float(rng.uniform(-80, 80)),
                k=int(rng.choice([1, 5, 10])),
            )
        )
    return qs
