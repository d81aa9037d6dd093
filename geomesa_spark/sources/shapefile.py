"""Minimal ESRI Shapefile writer/reader (.shp/.shx/.dbf).

GeoMesa exports shapefiles client-side through GeoTools
(geomesa-tools/.../export/ExportCommand.scala — mount empty at survey
time, SURVEY.md §0).  No GIS library ships in this container, so this
implements the public shapefile spec directly for the shapes the export
surface needs: Point (type 1) and Polygon (type 5, outer ring; holes as
additional rings).  Like the reference's exporter this is a CLIENT-SIDE
single-file format: the DataFrame is collected to the driver — use it
for query results, not raw tables (documented contract).

Attributes go to the .dbf as 'C' (string, ≤254 chars) or 'N' (numeric,
width 18, 6 decimals for floats / 0 for ints).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from ..geo import kernels, wkt

SHP_POINT = 1
SHP_POLYGON = 5


def _ring_cw(ring: np.ndarray) -> np.ndarray:
    """Shapefile outer rings are CLOCKWISE; flip if needed (signed area)."""
    r = kernels.close_ring(np.asarray(ring, dtype=np.float64))
    area2 = float(np.sum((r[1:, 0] - r[:-1, 0]) * (r[1:, 1] + r[:-1, 1])))
    return r if area2 > 0 else r[::-1]


def _ring_ccw(ring: np.ndarray) -> np.ndarray:
    r = _ring_cw(ring)
    return r[::-1]


def _shape_record(g: wkt.Geometry) -> bytes:
    if g.kind == wkt.WKB_POINT:
        return struct.pack("<idd", SHP_POINT, float(g.coords[0]), float(g.coords[1]))
    if g.kind == wkt.WKB_POLYGON:
        rings = [_ring_cw(g.coords[0])] + [_ring_ccw(r) for r in g.coords[1:]]
        pts = np.concatenate(rings)
        parts, off = [], 0
        for r in rings:
            parts.append(off)
            off += len(r)
        head = struct.pack(
            "<idddd",
            SHP_POLYGON,
            pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max(),
        )
        head += struct.pack("<ii", len(rings), len(pts))
        head += struct.pack(f"<{len(parts)}i", *parts)
        head += pts.astype("<f8").tobytes()
        return head
    raise ValueError(f"unsupported shapefile geometry: {g.type_name}")


def _header(total_words: int, shape_type: int, bbox: tuple) -> bytes:
    h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    h += struct.pack("<ii", 1000, shape_type)
    h += struct.pack("<dddd", *bbox)
    h += struct.pack("<dddd", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
    return h


def write_shapefile(df, path: str, wkt_col: str = "wkt", max_rows: int = 1_000_000) -> None:
    """Collect a (small) DataFrame and write ``path``.shp/.shx/.dbf.
    All geometries must share one shape type (point or polygon)."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(f"client-side export capped at {max_rows} rows")
    geoms = [wkt.parse_wkt(w) for w in pdf[wkt_col]]
    geoms = [g for g in geoms if g is not None]
    if not geoms:
        raise ValueError("no parseable geometries to export")
    kinds = {g.kind for g in geoms}
    if kinds == {wkt.WKB_POINT}:
        shape_type = SHP_POINT
    elif kinds == {wkt.WKB_POLYGON}:
        shape_type = SHP_POLYGON
    else:
        raise ValueError("mixed/unsupported shape types (one of point|polygon per file)")

    recs = [_shape_record(g) for g in geoms]
    xs = np.concatenate([
        g.coords[0:1] if g.kind == wkt.WKB_POINT else g.coords[0][:, 0] for g in geoms
    ])
    ys = np.concatenate([
        g.coords[1:2] if g.kind == wkt.WKB_POINT else g.coords[0][:, 1] for g in geoms
    ])
    bbox = (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))

    shp = bytearray()
    shx = bytearray()
    offset_words = 50  # header = 100 bytes
    for i, rec in enumerate(recs):
        words = len(rec) // 2
        shx += struct.pack(">ii", offset_words, words)
        shp += struct.pack(">ii", i + 1, words) + rec
        offset_words += 4 + words
    with open(path + ".shp", "wb") as f:
        f.write(_header(50 + len(shp) // 2, shape_type, bbox) + bytes(shp))
    with open(path + ".shx", "wb") as f:
        f.write(_header(50 + len(shx) // 2, shape_type, bbox) + bytes(shx))

    # .dbf attributes: every non-geometry column
    attrs = [c for c in pdf.columns if c != wkt_col]
    fields = []
    for c in attrs:
        if pd.api.types.is_integer_dtype(pdf[c]):
            fields.append((c, b"N", 18, 0))
        elif pd.api.types.is_float_dtype(pdf[c]):
            fields.append((c, b"N", 18, 6))
        else:
            fields.append((c, b"C", 64, 0))
    rec_len = 1 + sum(f[2] for f in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack("<BBBBIHH", 3, 26, 8, 17, len(geoms), hdr_len, rec_len)
    dbf += b"\x00" * 20
    for name, ftype, ln, dec in fields:
        dbf += name.encode("ascii", "replace")[:10].ljust(11, b"\x00")
        dbf += ftype + b"\x00" * 4 + struct.pack("<BB", ln, dec) + b"\x00" * 14
    dbf += b"\x0d"
    for i in range(len(geoms)):
        dbf += b" "
        for (name, ftype, ln, dec) in fields:
            v = pdf[name].iloc[i]
            if ftype == b"N":
                s = ("" if pd.isna(v) else (f"{v:.{dec}f}" if dec else str(int(v))))[:ln]
                dbf += s.rjust(ln).encode("ascii", "replace")
            else:
                s = ("" if v is None else str(v))[:ln]
                dbf += s.ljust(ln).encode("utf-8", "replace")[:ln].ljust(ln, b" ")
    dbf += b"\x1a"
    with open(path + ".dbf", "wb") as f:
        f.write(bytes(dbf))


def parse_shp_bytes(data: bytes) -> list[str | None]:
    """.shp record bytes → WKT strings (None for unsupported types)."""
    pos = 100
    wkts: list[str | None] = []
    while pos < len(data):
        (_, words) = struct.unpack_from(">ii", data, pos)
        pos += 8
        (stype,) = struct.unpack_from("<i", data, pos)
        if stype == SHP_POINT:
            x, y = struct.unpack_from("<dd", data, pos + 4)
            wkts.append(wkt.to_wkt(wkt.Geometry(wkt.WKB_POINT, np.asarray([x, y]))))
        elif stype == SHP_POLYGON:
            nparts, npts = struct.unpack_from("<ii", data, pos + 36)
            parts = list(struct.unpack_from(f"<{nparts}i", data, pos + 44))
            pts = np.frombuffer(
                data, dtype="<f8", count=npts * 2, offset=pos + 44 + 4 * nparts
            ).reshape(npts, 2)
            bounds = parts + [npts]
            rings = [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]
            wkts.append(wkt.to_wkt(wkt.Geometry(wkt.WKB_POLYGON, rings)))
        else:
            wkts.append(None)
        pos += 2 * words
    return wkts


def dbf_field_descriptors(d: bytes) -> list[tuple[str, str, int, int]]:
    """Field descriptor walk of a .dbf header: (name, type, len, dec) per
    column.  Shared by the record parser below and the Data Source API
    schema derivation (one .dbf parser in the codebase)."""
    fields = []
    fpos = 32
    while d[fpos] != 0x0D:
        name = d[fpos:fpos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(d[fpos + 11])
        ln = d[fpos + 16]
        dec = d[fpos + 17]
        fields.append((name, ftype, ln, dec))
        fpos += 32
    return fields


def parse_dbf_bytes(d: bytes) -> dict[str, list]:
    """.dbf bytes → {column: values} (N → int/float, C → str)."""
    nrec, hdr_len, rec_len = struct.unpack_from("<IHH", d, 4)
    fields = dbf_field_descriptors(d)
    rpos = hdr_len
    cols: dict[str, list] = {n: [] for n, _, _, _ in fields}
    for _ in range(nrec):
        p = rpos + 1
        for name, ftype, ln, dec in fields:
            raw = d[p:p + ln]
            p += ln
            if ftype == "N":
                s = raw.strip()
                if not s:
                    cols[name].append(None)
                elif dec:
                    cols[name].append(float(s))
                else:
                    cols[name].append(int(s))
            else:
                cols[name].append(raw.decode("utf-8", "replace").rstrip())
        rpos += rec_len
    return cols


def read_shapefile(spark, path: str):
    """path(.shp/.dbf) → DataFrame(wkt [, attrs…]).  Points + polygons.
    Driver-side (export-sized); the distributed path is
    ``spark.read.format("geomesa_shapefile")`` (sources/datasource.py)."""
    with open(path + ".shp", "rb") as f:
        data = f.read()
    out = pd.DataFrame({"wkt": parse_shp_bytes(data)})

    dbf_path = path + ".dbf"
    if os.path.exists(dbf_path):
        with open(dbf_path, "rb") as f:
            d = f.read()
        for name, vals in parse_dbf_bytes(d).items():
            out[name] = vals
    return spark.createDataFrame(out)
