"""Converter-ingest + export-sink tests (SURVEY.md §2.1 rows)."""

import json
import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from geomesa_spark.operators import spatial_join as sj
from geomesa_spark.sources import convert, export


def test_csv_convert_roundtrip(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("id,x,y,name\n1,10.5,20.5,a\n2,bad,30.0,b\n3,-170.0,-80.0,c\n")
    df = convert.read_csv_points(spark, str(csv), lon_col="x", lat_col="y", id_col="id")
    rows = {r["doc_id"]: (r["lon"], r["lat"]) for r in df.collect()}
    assert rows == {"1": (10.5, 20.5), "3": (-170.0, -80.0)}  # bad row dropped


def test_json_convert(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": "a", "geo": {"lon": 1.5, "lat": 2.5}, "meta": {"n": 3}}\n'
        '{"id": "b", "geo": {"lon": -4.0, "lat": 5.0}, "meta": {"n": 7}}\n'
    )
    df = convert.read_json_points(
        spark, str(p), {"doc_id": "id", "lon": "geo.lon", "lat": "geo.lat", "n": "meta.n"}
    )
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("a", 1.5, 2.5, 3), ("b", -4.0, 5.0, 7)]


def test_flat_points_to_spans_joins_like_corpus(spark, tmp_path):
    pdf = pd.DataFrame({"doc_id": ["x1", "x2"], "lon": [15.0, 0.0], "lat": [15.0, 0.0]})
    spans_df = convert.flat_points_to_spans(spark.createDataFrame(pdf))
    assert spans_df.schema["spans"].simpleString().startswith("spans:array<struct")
    out = sj.spatial_join_documents(
        spans_df, [dict(polygon_id="P1", wkt="POLYGON((10 10, 20 10, 20 20, 10 20, 10 10))")]
    )
    assert [r["doc_id"] for r in out.select("doc_id").collect()] == ["x1"]


def test_geojson_lines(spark):
    pdf = pd.DataFrame({"doc_id": ["a"], "lon": [1.0], "lat": [2.0], "n": [5]})
    out = export.to_geojson_lines(spark.createDataFrame(pdf)).collect()
    j = json.loads(out[0]["geojson"])
    assert j["type"] == "Feature"
    assert j["geometry"] == {"type": "Point", "coordinates": [1.0, 2.0]}
    assert j["properties"]["doc_id"] == "a" and j["properties"]["n"] == 5


def test_wkt_csv_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame({"doc_id": ["a", "b"], "lon": [1.5, -2.0], "lat": [3.0, 4.25]})
    out_dir = str(tmp_path / "csv")
    export.to_wkt_csv(spark.createDataFrame(pdf), out_dir)
    back = spark.read.option("header", True).csv(out_dir).collect()
    geoms = {r["doc_id"]: r["geom_wkt"] for r in back}
    assert geoms["a"] == "POINT (1.5 3.0)"
    assert geoms["b"] == "POINT (-2.0 4.25)"


def test_bin_records_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "track_id": ["t1", "t1", "t2"],
            "ts": pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:30", "2026-01-01 01:00:00"]),
            "lon": [10.25, 10.5, -120.0],
            "lat": [45.5, 45.75, -33.0],
        }
    )
    df = spark.createDataFrame(pdf)
    recs = [r["bin"] for r in export.to_bin_records(df, "track_id", "ts").collect()]
    assert all(len(b) == 16 for b in recs)
    dec = export.decode_bin_records(recs)
    assert len(dec) == 3
    np.testing.assert_allclose(sorted(dec["lon"]), sorted(pdf["lon"]), rtol=1e-6)
    assert len(set(dec["track_hash"])) == 2  # two distinct tracks
    assert (np.diff(sorted(dec["secs"])) >= 0).all()


def test_arrow_export(spark):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    tbl = export.to_arrow_table(spark.createDataFrame(pdf))
    assert tbl.num_rows == 3 and tbl.column_names == ["a", "b"]
