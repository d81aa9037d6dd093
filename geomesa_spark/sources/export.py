"""Export sinks: GeoJSON, WKT/CSV, Arrow IPC, BIN.

GeoMesa exports query results through its tools/export formats (public
tree: geomesa-tools/.../export/ExportCommand.scala; the 16-byte BIN wire
format is produced by BinAggregatingScan +
bin/BinaryOutputEncoder.scala; Arrow IPC by ArrowScan; mount empty at
survey time — SURVEY.md §0).

Spark restatement: df.write for the columnar/csv paths; GeoJSON feature
rows as JVM-built JSON strings; BIN as a vectorized pandas-UDF packer
producing the same 16-byte little-endian record layout
(trackId:int32, dtg-seconds:int32, lat:float32, lon:float32); Arrow via
``toArrow`` (Spark is Arrow-native — the ArrowScan machinery is free).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def to_geojson_lines(df: DataFrame, lon="lon", lat="lat", props: list[str] | None = None) -> DataFrame:
    """One GeoJSON Feature per row as a string column (write with
    df.write.text for a .geojsonl file) — all JVM json building."""
    props = props or [c for c in df.columns if c not in (lon, lat)]
    prop_struct = F.struct(*[F.col(c) for c in props])
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col(lon), F.col(lat)).alias("coordinates"),
            ).alias("geometry"),
            prop_struct.alias("properties"),
        )
    )
    return df.select(feature.alias("geojson"))


def to_wkt_csv(df: DataFrame, path: str, lon="lon", lat="lat", mode: str = "overwrite") -> None:
    """CSV with a WKT geometry column (the wkt export format)."""
    wkt_col = F.concat(
        F.lit("POINT ("), F.col(lon).cast("string"), F.lit(" "), F.col(lat).cast("string"), F.lit(")")
    )
    out = df.withColumn("geom_wkt", wkt_col).drop(lon, lat)
    out.write.mode(mode).option("header", True).csv(path)


def to_bin_records(
    df: DataFrame, track_col: str, ts_col: str, lon="lon", lat="lat"
) -> DataFrame:
    """Pack rows into GeoMesa's 16-byte BIN wire records
    (trackId-hash:int32 | seconds:int32 | lat:float32 | lon:float32,
    little-endian) — fully vectorized numpy packing per Arrow batch."""

    @F.pandas_udf("binary")
    def pack(track: pd.Series, secs: pd.Series, lons: pd.Series, lats: pd.Series) -> pd.Series:
        n = len(track)
        buf = np.zeros((n, 16), dtype=np.uint8)
        tid = track.to_numpy(np.int64).astype(np.int32)
        buf[:, 0:4] = tid.astype("<i4").view(np.uint8).reshape(n, 4)
        buf[:, 4:8] = secs.to_numpy(np.int64).astype("<i4").view(np.uint8).reshape(n, 4)
        buf[:, 8:12] = lats.to_numpy(np.float64).astype("<f4").view(np.uint8).reshape(n, 4)
        buf[:, 12:16] = lons.to_numpy(np.float64).astype("<f4").view(np.uint8).reshape(n, 4)
        raw = buf.tobytes()
        return pd.Series([raw[i * 16 : (i + 1) * 16] for i in range(n)], dtype=object)

    track_hash = F.xxhash64(F.col(track_col)).bitwiseAND(F.lit(0x7FFFFFFF)).cast("int")
    secs = F.unix_timestamp(F.col(ts_col)).cast("int")
    return df.select(
        pack(track_hash.cast("long"), secs.cast("long"), F.col(lon), F.col(lat)).alias("bin")
    )


def decode_bin_records(rows: list[bytes]) -> pd.DataFrame:
    """Client-side decoder for BIN records (round-trip checks)."""
    arr = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(-1, 16)
    return pd.DataFrame(
        {
            "track_hash": arr[:, 0:4].copy().view("<i4").ravel(),
            "secs": arr[:, 4:8].copy().view("<i4").ravel(),
            "lat": arr[:, 8:12].copy().view("<f4").ravel().astype(np.float64),
            "lon": arr[:, 12:16].copy().view("<f4").ravel().astype(np.float64),
        }
    )


def to_arrow_table(df: DataFrame):
    """Arrow IPC export — Spark 4 is Arrow-native (ArrowScan for free)."""
    return df.toArrow()
