"""Pairwise geometry predicates over parsed Geometry objects.

Backs the generic ``st_*`` relation/measurement UDF surface for ARBITRARY
geometry pairs (the reference evaluates these through JTS — public tree:
geomesa-spark-jts/.../udf/SpatialRelationFunctions.scala; mount empty at
survey time, SURVEY.md §0).  The engine's hot paths (spatial join, kNN,
tiling) never come through here — they use the fully vectorized kernels in
:mod:`geomesa_spark.geo.kernels`; this module is the per-geometry general
dispatch used by the SQL function surface, batched at the Arrow-UDF level.

Precision notes (documented semantics, SURVEY.md §2.6 priority tier):
- point⊗polygon, point⊗point, point⊗linestring: exact (ray crossing /
  segment tests with boundary classification);
- polygon⊗polygon and linestring⊗* : exact for simple polygons via
  vertex-containment + edge-crossing tests; DE-9IM exotica (EQUALS of
  collapsed geometries, TOUCHES along collinear overlaps) approximate;
- distances: planar in degrees (st_distance parity with JTS) and
  spherical meters (haversine; vertex/edge-projection for lines).
"""

from __future__ import annotations

import numpy as np

from . import kernels, wkt
from .kernels import PIP_IN, PIP_OUT


def _as_parts(g: wkt.Geometry) -> list:
    """Normalize to a list of single-geometry parts."""
    if g.kind == wkt.WKB_MULTIPOLYGON:
        return [wkt.Geometry(wkt.WKB_POLYGON, p) for p in g.coords]
    if g.kind == wkt.WKB_MULTILINESTRING:
        return [wkt.Geometry(wkt.WKB_LINESTRING, c) for c in g.coords]
    if g.kind == wkt.WKB_MULTIPOINT:
        return [wkt.Geometry(wkt.WKB_POINT, c) for c in g.coords]
    if g.kind == wkt.WKB_COLLECTION:
        return [p for part in g.coords for p in _as_parts(part)]
    return [g]


def _pip_one(lon: float, lat: float, rings) -> int:
    return int(kernels.point_in_polygon(np.asarray([lon]), np.asarray([lat]), rings)[0])


def _point_on_line(lon: float, lat: float, coords: np.ndarray) -> bool:
    d = kernels.point_segments_dist_m(np.asarray([lon]), np.asarray([lat]), coords)
    return bool(d[0] < 0.5)  # sub-meter tolerance in geodesic space


def _edges(coords: np.ndarray):
    return coords[:-1], coords[1:]


def _any_edge_cross(a: np.ndarray, b: np.ndarray) -> bool:
    a1, a2 = _edges(a)
    b1, b2 = _edges(b)
    if len(a1) == 0 or len(b1) == 0:
        return False
    return bool(
        kernels.segments_intersect(
            a1[:, None, :], a2[:, None, :], b1[None, :, :], b2[None, :, :]
        ).any()
    )


def _poly_poly_intersects(pa: list[np.ndarray], pb: list[np.ndarray]) -> bool:
    oa, ob = kernels.close_ring(pa[0]), kernels.close_ring(pb[0])
    # bbox reject
    if (oa[:, 0].max() < ob[:, 0].min() or ob[:, 0].max() < oa[:, 0].min()
            or oa[:, 1].max() < ob[:, 1].min() or ob[:, 1].max() < oa[:, 1].min()):
        return False
    av = kernels.point_in_polygon(ob[:-1, 0], ob[:-1, 1], pa)
    if (av != PIP_OUT).any():
        return True
    bv = kernels.point_in_polygon(oa[:-1, 0], oa[:-1, 1], pb)
    if (bv != PIP_OUT).any():
        return True
    for ra in pa:
        for rb in pb:
            if _any_edge_cross(kernels.close_ring(ra), kernels.close_ring(rb)):
                return True
    return False


def _poly_contains_poly(pa: list[np.ndarray], pb: list[np.ndarray]) -> bool:
    # cheap exact rejection: any outer-ring vertex of B strictly outside A
    ob = kernels.close_ring(pb[0])
    cls = kernels.point_in_polygon(ob[:-1, 0], ob[:-1, 1], pa)
    if (cls == PIP_OUT).any():
        return False
    # exact decision via the computed DE-9IM (round-2's vertex+edge-touch
    # heuristic wrongly rejected B touching A's boundary from inside):
    # contains ⟺ II≠F ∧ EI=F ∧ EB=F
    from . import de9im

    m = de9im.poly_poly_matrix(pa, pb)
    return m[0] != "F" and m[6] == "F" and m[7] == "F"


def _line_poly_intersects(line: np.ndarray, rings: list[np.ndarray]) -> bool:
    cls = kernels.point_in_polygon(line[:, 0], line[:, 1], rings)
    if (cls != PIP_OUT).any():
        return True
    for r in rings:
        if _any_edge_cross(line, kernels.close_ring(r)):
            return True
    return False


def intersects(ga: wkt.Geometry, gb: wkt.Geometry) -> bool:
    for a in _as_parts(ga):
        for b in _as_parts(gb):
            if _intersects_single(a, b):
                return True
    return False


def _intersects_single(a: wkt.Geometry, b: wkt.Geometry) -> bool:
    P, L, G = wkt.WKB_POINT, wkt.WKB_LINESTRING, wkt.WKB_POLYGON
    if a.kind == P and b.kind == P:
        return bool(np.allclose(a.coords, b.coords, atol=1e-12))
    if a.kind == P and b.kind == G:
        return _pip_one(a.coords[0], a.coords[1], b.coords) != PIP_OUT
    if a.kind == G and b.kind == P:
        return _intersects_single(b, a)
    if a.kind == P and b.kind == L:
        return _point_on_line(a.coords[0], a.coords[1], b.coords)
    if a.kind == L and b.kind == P:
        return _intersects_single(b, a)
    if a.kind == L and b.kind == L:
        return _any_edge_cross(a.coords, b.coords)
    if a.kind == L and b.kind == G:
        return _line_poly_intersects(a.coords, b.coords)
    if a.kind == G and b.kind == L:
        return _line_poly_intersects(b.coords, a.coords)
    if a.kind == G and b.kind == G:
        return _poly_poly_intersects(a.coords, b.coords)
    return False


def contains(ga: wkt.Geometry, gb: wkt.Geometry) -> bool:
    """DE-9IM contains: b's interior within a's interior, b not touching
    only the boundary."""
    P, L, G = wkt.WKB_POINT, wkt.WKB_LINESTRING, wkt.WKB_POLYGON
    if ga.kind == G:
        pa = ga.coords
        if gb.kind == P:
            return _pip_one(gb.coords[0], gb.coords[1], pa) == PIP_IN
        if gb.kind == L:
            cls = kernels.point_in_polygon(gb.coords[:, 0], gb.coords[:, 1], pa)
            if (cls == PIP_OUT).any() or not (cls == PIP_IN).any():
                return False
            for r in pa:
                if _any_edge_cross(gb.coords, kernels.close_ring(r)):
                    return False
            return True
        if gb.kind == G:
            return _poly_contains_poly(pa, gb.coords)
        if gb.kind in (wkt.WKB_MULTIPOINT, wkt.WKB_MULTILINESTRING, wkt.WKB_MULTIPOLYGON):
            return all(contains(ga, p) for p in _as_parts(gb))
    if ga.kind == P and gb.kind == P:
        return bool(np.allclose(ga.coords, gb.coords, atol=1e-12))
    return False


def covers(ga: wkt.Geometry, gb: wkt.Geometry) -> bool:
    """Like contains but boundary points count as covered."""
    if ga.kind == wkt.WKB_POLYGON and gb.kind == wkt.WKB_POINT:
        return _pip_one(gb.coords[0], gb.coords[1], ga.coords) != PIP_OUT
    if ga.kind == wkt.WKB_POLYGON and gb.kind == wkt.WKB_POLYGON:
        ob = kernels.close_ring(gb.coords[0])
        cls = kernels.point_in_polygon(ob[:-1, 0], ob[:-1, 1], ga.coords)
        if (cls == PIP_OUT).any():
            return False
        # vertices inside is necessary, not sufficient (an edge can bulge
        # into A's exterior, or B can cover one of A's holes): exact via
        # the computed DE-9IM — covers ⟺ EI=F ∧ EB=F
        from . import de9im

        m = de9im.poly_poly_matrix(ga.coords, gb.coords)
        return m[6] == "F" and m[7] == "F"
    return contains(ga, gb)


#: equals() quantization: coordinates are rounded to this many decimals
#: (~1e-12 deg ≈ 0.1 µm) before canonical selection AND comparison, so the
#: byte order used to pick rotation/direction and the value comparison
#: agree by construction (round-5 advice: exact-tobytes selection + atol
#: comparison could canonicalize tolerance-equal rings differently and
#: return a false negative).
_EQ_DECIMALS = 12


def _quant(a) -> np.ndarray:
    # `+ 0.0` folds -0.0 → +0.0 so the two share one byte pattern
    return np.round(np.asarray(a, dtype=np.float64), _EQ_DECIMALS) + 0.0


def _canon_ring(ring: np.ndarray) -> np.ndarray:
    """Canonical form of a ring: quantize, open it, rotate so the
    lexicographically smallest vertex comes first, then pick the
    byte-smaller of the two orientations — so two rings equal up to
    rotation AND direction get the identical array."""
    r = kernels.close_ring(_quant(ring))[:-1]
    i = int(np.lexsort((r[:, 1], r[:, 0]))[0])
    fwd = np.roll(r, -i, axis=0)
    rev = np.roll(fwd[::-1], 1, axis=0)  # same start vertex, opposite walk
    return fwd if fwd.tobytes() <= rev.tobytes() else rev


def _canon_line(line: np.ndarray) -> np.ndarray:
    """Direction-canonical polyline: the byte-smaller of the two walks
    (quantized, so selection and comparison use the same values)."""
    c = _quant(line)
    r = c[::-1]
    return c if c.tobytes() <= r.tobytes() else r


def equals(ga: wkt.Geometry, gb: wkt.Geometry) -> bool:
    """Geometry equality up to the representation freedoms JTS ``equals``
    ignores: ring ROTATION and DIRECTION for polygons, line DIRECTION for
    linestrings, part/vertex ORDER for MULTI* (round 4 — the round-3
    coordinate-sequence narrowing).  Coordinates compare after
    quantization to `_EQ_DECIMALS` decimals (round 5): canonical
    rotation/direction selection and the equality check see the SAME
    values, so tolerance-equal inputs can no longer canonicalize to
    different rotations.  Still vertex-based: two boundaries tracing the
    same set with different collinear-vertex splits compare unequal
    (documented; JTS normalizes nodes, we don't)."""
    if ga.kind != gb.kind:
        return False
    if ga.kind == wkt.WKB_POINT:
        return bool(np.array_equal(_quant(ga.coords), _quant(gb.coords)))
    try:
        if ga.kind == wkt.WKB_POLYGON:
            if len(ga.coords) != len(gb.coords):
                return False
            # outer ring pairs with outer; holes compare as a multiset
            if not _ring_eq(ga.coords[0], gb.coords[0]):
                return False
            return _multiset_eq(
                [_canon_ring(h) for h in ga.coords[1:]],
                [_canon_ring(h) for h in gb.coords[1:]],
            )
        if ga.kind == wkt.WKB_LINESTRING:
            a, b = _canon_line(ga.coords), _canon_line(gb.coords)
            return bool(np.array_equal(a, b))
        if ga.kind == wkt.WKB_MULTIPOINT:
            a = _quant(ga.coords)
            b = _quant(gb.coords)
            if a.shape != b.shape:
                return False
            a = a[np.lexsort((a[:, 1], a[:, 0]))]
            b = b[np.lexsort((b[:, 1], b[:, 0]))]
            return bool(np.array_equal(a, b))
        if ga.kind == wkt.WKB_MULTILINESTRING:
            return _multiset_eq(
                [_canon_line(p) for p in ga.coords],
                [_canon_line(p) for p in gb.coords],
            )
        if ga.kind == wkt.WKB_MULTIPOLYGON:
            return _multiset_eq(
                [_canon_poly(poly) for poly in ga.coords],
                [_canon_poly(poly) for poly in gb.coords],
            )
        return bool(np.allclose(ga.coords, gb.coords, atol=1e-12))
    except (ValueError, TypeError):
        return False


def _canon_poly(poly: list[np.ndarray]) -> np.ndarray:
    """Canonical polygon: outer ring first, holes sorted by canonical
    bytes, each ring prefixed by an (inf, ring_len) separator row so
    different ring partitions of the same vertex rows can never collide
    (inf never appears as a coordinate)."""
    rings = [_canon_ring(poly[0])] + sorted(
        (_canon_ring(h) for h in poly[1:]), key=lambda r: r.tobytes()
    )
    parts = []
    for r in rings:
        parts.append(np.array([[np.inf, float(len(r))]]))
        parts.append(r)
    return np.vstack(parts)


def _ring_eq(a: np.ndarray, b: np.ndarray) -> bool:
    return bool(np.array_equal(_canon_ring(a), _canon_ring(b)))


def _multiset_eq(parts_a: list[np.ndarray], parts_b: list[np.ndarray]) -> bool:
    """Order-insensitive comparison of canonicalized (quantized) parts:
    sorted by the canonical bytes, then pairwise exact — sound because
    sorting and comparison operate on the same quantized values."""
    if len(parts_a) != len(parts_b):
        return False
    sa = sorted(parts_a, key=lambda p: p.tobytes())
    sb = sorted(parts_b, key=lambda p: p.tobytes())
    return all(np.array_equal(x, y) for x, y in zip(sa, sb))


def distance_deg(ga: wkt.Geometry, gb: wkt.Geometry) -> float:
    """Planar cartesian distance in degrees (JTS st_distance parity)."""
    if intersects(ga, gb):
        return 0.0
    pts_a = _sample_coords(ga)
    pts_b = _sample_coords(gb)
    best = np.inf
    for coords, other in ((pts_a, gb), (pts_b, ga)):
        for seg in _segments_of(other):
            d = _pts_to_seg_planar(coords, seg)
            best = min(best, float(d.min()))
    return best


def distance_sphere_m(ga: wkt.Geometry, gb: wkt.Geometry) -> float:
    if intersects(ga, gb):
        return 0.0
    best = np.inf
    pa, pb = _sample_coords(ga), _sample_coords(gb)
    for coords, other in ((pa, gb), (pb, ga)):
        o = _all_coords(other)
        if len(o) >= 2:
            d = kernels.point_segments_dist_m(coords[:, 0], coords[:, 1], o)
        else:
            d = kernels.haversine_m(coords[:, 0], coords[:, 1], o[0, 0], o[0, 1])
        best = min(best, float(np.min(d)))
    return best


def _sample_coords(g: wkt.Geometry) -> np.ndarray:
    return _all_coords(g)


def _all_coords(g: wkt.Geometry) -> np.ndarray:
    if g.kind == wkt.WKB_POINT:
        return np.asarray([g.coords])
    if g.kind == wkt.WKB_LINESTRING:
        return np.asarray(g.coords)
    if g.kind == wkt.WKB_POLYGON:
        return np.vstack([kernels.close_ring(r) for r in g.coords])
    return np.vstack([_all_coords(p) for p in _as_parts(g)])


def _segments_of(g: wkt.Geometry):
    if g.kind == wkt.WKB_POINT:
        yield np.asarray([g.coords, g.coords])
    elif g.kind == wkt.WKB_LINESTRING:
        yield np.asarray(g.coords)
    elif g.kind == wkt.WKB_POLYGON:
        for r in g.coords:
            yield kernels.close_ring(r)
    else:
        for p in _as_parts(g):
            yield from _segments_of(p)


def _pts_to_seg_planar(pts: np.ndarray, seg: np.ndarray) -> np.ndarray:
    x, y = pts[:, 0][:, None], pts[:, 1][:, None]
    x1, y1 = seg[:-1, 0][None, :], seg[:-1, 1][None, :]
    x2, y2 = seg[1:, 0][None, :], seg[1:, 1][None, :]
    dx, dy = x2 - x1, y2 - y1
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(len2 > 0, ((x - x1) * dx + (y - y1) * dy) / len2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    nx, ny = x1 + t * dx, y1 + t * dy
    return np.sqrt((x - nx) ** 2 + (y - ny) ** 2).min(axis=1)
