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


class TestRound2Formats:
    def test_avro_roundtrip(self, spark, tmp_path):
        """Distributed Avro container write → distributed read: values,
        schema, and nulls survive."""
        import pyspark.sql.functions as F

        from geomesa_spark.sources import avro_io

        df = (
            spark.range(500)
            .select(
                F.col("id").cast("bigint").alias("k"),
                (F.col("id") * 1.5).alias("x"),
                F.concat(F.lit("s"), F.col("id")).alias("s"),
                (F.col("id") % 2 == 0).alias("flag"),
                F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(F.col("id")).alias("maybe"),
            )
            .repartition(4)
        )
        p = str(tmp_path / "avro_out")
        avro_io.write_avro(df, p)
        back = avro_io.read_avro(spark, p)

        def canon(d):
            pdf = d.toPandas()
            pdf["maybe"] = pdf["maybe"].fillna(-1).astype("int64")  # nan != nan
            return sorted(map(tuple, pdf.itertuples(index=False, name=None)))

        assert canon(df) == canon(back)
        assert len([f for f in __import__("os").listdir(p) if f.endswith(".avro")]) >= 2

    def test_avro_rejects_nested(self, spark):
        import pyspark.sql.functions as F

        from geomesa_spark.sources import avro_io

        df = spark.range(3).select(F.array("id").alias("a"))
        with __import__("pytest").raises(ValueError, match="unsupported Avro"):
            avro_io.schema_from_spark(df)

    def test_shapefile_point_roundtrip(self, spark, tmp_path):
        import pandas as pd

        from geomesa_spark.sources import shapefile

        pdf = pd.DataFrame(
            {
                "wkt": ["POINT (10.5 -3.25)", "POINT (-170 80)", "POINT (0 0)"],
                "name": ["a", "b", "c"],
                "n": [1, 22, 333],
                "v": [1.5, 2.25, -3.125],
            }
        )
        p = str(tmp_path / "pts")
        shapefile.write_shapefile(spark.createDataFrame(pdf), p)
        back = shapefile.read_shapefile(spark, p).toPandas().sort_values("n")
        assert list(back["wkt"]) == ["POINT (10.5 -3.25)", "POINT (-170 80)", "POINT (0 0)"]
        assert list(back["name"]) == ["a", "b", "c"]
        assert list(back["n"]) == [1, 22, 333]
        assert list(back["v"]) == [1.5, 2.25, -3.125]

    def test_shapefile_polygon_roundtrip(self, spark, tmp_path):
        import pandas as pd

        from geomesa_spark.geo import relate, wkt as W
        from geomesa_spark.sources import shapefile

        w1 = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        w2 = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
        p = str(tmp_path / "polys")
        pdf = pd.DataFrame({"wkt": [w1, w2], "gid": [1, 2]})
        shapefile.write_shapefile(spark.createDataFrame(pdf), p)
        back = shapefile.read_shapefile(spark, p).toPandas().sort_values("gid")
        for orig, got in zip([w1, w2], back["wkt"]):
            go, gg = W.parse_wkt(orig), W.parse_wkt(got)
            assert len(go.coords) == len(gg.coords)  # ring count incl. hole
            # shapefile mandates CW outer rings, so orientation may flip —
            # the same closed ring must have the same vertex set
            for ro, rg in zip(go.coords, gg.coords):
                so = {tuple(p) for p in np.asarray(ro)}
                sg = {tuple(p) for p in np.asarray(rg)}
                assert so == sg
        # hole semantics survive: point in the hole is NOT contained
        g2 = W.parse_wkt(back["wkt"].iloc[1])
        from geomesa_spark.geo import kernels
        assert kernels.point_in_polygon(
            np.array([5.0]), np.array([5.0]), g2.coords
        )[0] == kernels.PIP_OUT

    def test_xml_ingest(self, spark, tmp_path):
        from geomesa_spark.sources import convert

        xml = (
            "<rows>"
            "<row><id>1</id><lon>10.5</lon><lat>20.5</lat></row>"
            "<row><id>2</id><lon>-3.25</lon><lat>4.75</lat></row>"
            "</rows>"
        )
        p = tmp_path / "data.xml"
        p.write_text(xml)
        out = convert.read_xml_points(
            spark, str(p), "row",
            {"doc_id": "CAST(id AS STRING)",
             "lon": "TRY_CAST(lon AS DOUBLE)",
             "lat": "TRY_CAST(lat AS DOUBLE)"},
        ).orderBy("doc_id")
        rows = out.collect()
        assert [(r["doc_id"], r["lon"], r["lat"]) for r in rows] == [
            ("1", 10.5, 20.5), ("2", -3.25, 4.75)
        ]

    def test_fixed_width_ingest(self, spark, tmp_path):
        from geomesa_spark.sources import convert

        lines = [
            "0001  10.50  20.50",
            "0002  -3.25   4.75",
            "0003  oops!   1.00",  # malformed lon → nulls, never aborts
        ]
        p = tmp_path / "fw.txt"
        p.write_text("\n".join(lines))
        out = convert.read_fixed_width(
            spark, str(p),
            [("id", 1, 4, "INT"), ("lon", 5, 7, "DOUBLE"), ("lat", 12, 7, "DOUBLE")],
        ).orderBy("id")
        rows = out.collect()
        assert (rows[0]["id"], rows[0]["lon"], rows[0]["lat"]) == (1, 10.5, 20.5)
        assert (rows[1]["lon"], rows[1]["lat"]) == (-3.25, 4.75)
        assert rows[2]["lon"] is None and rows[2]["lat"] == 1.0
