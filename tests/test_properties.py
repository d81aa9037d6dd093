"""Property-based tests (hypothesis) for the pure kernels — the fuzzing
tier of the reference's test strategy (SURVEY.md §5): round-trips and
invariants that must hold for ALL inputs, not just fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_spark import cells
from geomesa_spark.geo import kernels, wkt
from geomesa_spark.operators import xz2

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
res_st = st.integers(min_value=0, max_value=26)


@settings(max_examples=200, deadline=None)
@given(lons, lats, res_st)
def test_cell_roundtrip_contains_point(lon, lat, res):
    c = cells.encode(np.array([lon]), np.array([lat]), res)
    assert c[0] >= 0
    lo0, la0, lo1, la1 = cells.cell_bounds(c, res)
    # closed-left, open-right cells; the top edge clamps into the last cell
    assert lo0[0] - 1e-9 <= lon <= lo1[0] + 1e-9 or lon == 180.0
    assert la0[0] - 1e-9 <= lat <= la1[0] + 1e-9 or lat == 90.0


@settings(max_examples=200, deadline=None)
@given(lons, lats, res_st, st.integers(min_value=0, max_value=10))
def test_parent_is_prefix(lon, lat, res, dres):
    dres = min(dres, res)
    fine = cells.encode(np.array([lon]), np.array([lat]), res)
    coarse = cells.encode(np.array([lon]), np.array([lat]), res - dres)
    assert cells.parent(fine, dres)[0] == coarse[0]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(lons, lats), min_size=1, max_size=8))
def test_wkt_wkb_roundtrip_multipoint(pts):
    g = wkt.Geometry(wkt.WKB_MULTIPOINT, np.asarray(pts, dtype=np.float64))
    back = wkt.wkb_to_geom(wkt.geom_to_wkb(g))
    assert back.kind == wkt.WKB_MULTIPOINT
    assert np.allclose(np.asarray(back.coords), np.asarray(pts))
    # WKT round-trip too (formatter truncates at 1e-10 — compare loosely)
    t = wkt.to_wkt(g)
    back2 = wkt.parse_wkt(t)
    assert np.allclose(np.asarray(back2.coords), np.asarray(pts), atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-179.0, max_value=170.0, allow_nan=False),
    st.floats(min_value=-85.0, max_value=80.0, allow_nan=False),
    st.floats(min_value=1e-6, max_value=8.0),
    st.floats(min_value=1e-6, max_value=4.0),
)
def test_xz2_keys_cover_bbox(lon0, lat0, w, h):
    lon1, lat1 = min(lon0 + w, 180.0), min(lat0 + h, 90.0)
    x0, y0, x1, y1 = (
        f"{lon0!r} {lat0!r}", f"{lon1!r} {lat0!r}", f"{lon1!r} {lat1!r}", f"{lon0!r} {lat1!r}"
    )
    g = f"POLYGON(({x0}, {y0}, {x1}, {y1}, {x0}))"
    keys = xz2.geometry_keys(g, 12)
    assert 1 <= len(keys) <= 4
    (lv,) = {k for k, _ in keys}
    key_cells = {c for _, c in keys}
    # random interior samples must land in a key cell
    rng = np.random.default_rng(7)
    sx = rng.uniform(lon0, lon1, 20)
    sy = rng.uniform(lat0, lat1, 20)
    assert set(int(c) for c in cells.encode(sx, sy, lv)) <= key_cells


@settings(max_examples=100, deadline=None)
@given(lons, lats, lons, lats)
def test_vincenty_vs_haversine_bounds(lon1, lat1, lon2, lat2):
    """Spheroid and sphere distances agree within the flattening (~0.6%)
    — catches sign/iteration bugs without an external geodesic oracle."""
    v = kernels.vincenty_m(np.array([lon1]), np.array([lat1]), lon2, lat2)[0]
    h = kernels.haversine_m(np.array([lon1]), np.array([lat1]), lon2, lat2)[0]
    assert v >= 0
    if h > 1000:  # relative comparison meaningless at ~0 distance
        assert abs(v - h) / h < 0.01
