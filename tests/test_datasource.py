"""Python Data Source API front-ends: the partitioned shapefile batch
source and the replayable changelog streaming source (the executable
Kafka-log analogue)."""

import pandas as pd
import pytest

from geomesa_spark.sources import datasource, shapefile
from geomesa_spark.streaming import live


@pytest.fixture()
def shp_dir(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "wkt": ["POINT (1 2)", "POINT (3 4)", "POINT (5 6)"],
            "name": ["a", "b", "c"],
            "score": [1.5, 2.5, 3.5],
            "n": [10, 20, 30],
        }
    )
    shapefile.write_shapefile(spark.createDataFrame(pdf), str(tmp_path / "one"))
    pdf2 = pdf.assign(wkt=["POINT (7 8)", "POINT (9 10)", "POINT (11 12)"])
    shapefile.write_shapefile(spark.createDataFrame(pdf2), str(tmp_path / "two"))
    return tmp_path


class TestShapefileSource:
    def test_matches_driver_reader(self, spark, shp_dir):
        datasource.register(spark)
        via_ds = (
            spark.read.format("geomesa_shapefile")
            .load(str(shp_dir / "one.shp"))
            .toPandas()
        )
        via_driver = shapefile.read_shapefile(spark, str(shp_dir / "one")).toPandas()
        a = via_ds.sort_values("wkt").reset_index(drop=True)
        b = via_driver[a.columns].sort_values("wkt").reset_index(drop=True)
        assert a["wkt"].tolist() == b["wkt"].tolist()
        assert a["name"].tolist() == b["name"].tolist()
        assert a["n"].astype(int).tolist() == b["n"].astype(int).tolist()

    def test_directory_is_one_partition_per_file(self, spark, shp_dir):
        datasource.register(spark)
        df = spark.read.format("geomesa_shapefile").load(str(shp_dir))
        assert df.rdd.getNumPartitions() == 2
        assert df.count() == 6
        assert set(df.toPandas()["name"]) == {"a", "b", "c"}

    def test_schema_types(self, spark, shp_dir):
        datasource.register(spark)
        df = spark.read.format("geomesa_shapefile").load(str(shp_dir / "one.shp"))
        kinds = dict(df.dtypes)
        assert kinds["wkt"] == "string"
        assert kinds["score"] == "double"
        assert kinds["n"] == "bigint"


def _msg(fid, ts, lon, lat, op):
    return {"feature_id": fid, "ts": ts, "lon": lon, "lat": lat, "op": op}


class TestChangelogSource:
    def test_offsets_and_replay_unit(self, tmp_path):
        d = str(tmp_path / "log")
        datasource.write_changelog_batch(d, 0, [_msg("f1", "2026-01-01 00:00:00", 1, 1, "insert")])
        datasource.write_changelog_batch(d, 1, [_msg("f2", "2026-01-01 00:00:10", 2, 2, "insert")])
        datasource.write_changelog_batch(d, 2, [_msg("f1", "2026-01-01 00:00:20", 3, 3, "update")])
        r = datasource.ChangelogStreamReader({"path": d})
        assert r.initialOffset() == {"index": 0}
        rows, end = r.read({"index": 0})
        assert end == {"index": 3} and len(list(rows)) == 3
        # deterministic replay of the middle batch only
        mid = list(r.readBetweenOffsets({"index": 1}, {"index": 2}))
        assert len(mid) == 1 and mid[0][0] == "f2"
        # nothing new -> empty increment, same offset
        rows, end = r.read({"index": 3})
        assert end == {"index": 3} and list(rows) == []

    def test_stream_to_upsert_e2e(self, spark, tmp_path):
        """The full changelog path EXECUTES: readStream from the log dir →
        applyInPandasWithState upsert → memory sink."""
        d = str(tmp_path / "log")
        datasource.write_changelog_batch(
            d,
            0,
            [
                _msg("f1", "2026-01-01 00:00:00", 10.0, 10.0, "insert"),
                _msg("f2", "2026-01-01 00:00:10", 20.0, 20.0, "insert"),
            ],
        )
        datasource.write_changelog_batch(
            d,
            1,
            [
                _msg("f1", "2026-01-01 00:00:20", 11.0, 11.0, "update"),
                _msg("f2", "2026-01-01 00:00:40", None, None, "delete"),
                _msg("f1", "2026-01-01 00:00:05", 99.0, 99.0, "update"),  # late
            ],
        )
        stream = live.changelog_dir_source(spark, d)
        out = live.run_batches(
            live.changelog_upsert(stream), "cl_upserts", spark, "update"
        ).toPandas()
        rows = out[out["op"] == "upsert"].set_index("feature_id")
        assert rows.loc["f1", "lon"] == 11.0  # latest event time wins over late row
        assert "f2" not in rows.index  # deleted

    def test_checkpoint_offset_continuation(self, spark, tmp_path):
        """A second run against the same checkpoint consumes ONLY files
        appended after the first run (Kafka offset semantics)."""
        d = str(tmp_path / "log")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        datasource.write_changelog_batch(
            d, 0, [_msg("a", "2026-01-01 00:00:00", 1.0, 1.0, "insert")]
        )

        def run_once():
            # parquet sink: the one built-in sink that RESUMES from a
            # checkpoint (memory sink refuses recovery by design)
            stream = live.changelog_dir_source(spark, d)
            q = (
                stream.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            return spark.read.parquet(out).toPandas()

        first = run_once()
        assert set(first["feature_id"]) == {"a"}
        datasource.write_changelog_batch(
            d, 1, [_msg("b", "2026-01-01 00:01:00", 2.0, 2.0, "insert")]
        )
        second = run_once()
        # file 0 NOT reprocessed: exactly one new row appended
        assert sorted(second["feature_id"]) == ["a", "b"]


class TestShapefileSchemaAlignment:
    def test_reordered_dbf_columns_align_by_name(self, spark, tmp_path):
        """A directory whose second file carries the same columns in a
        DIFFERENT .dbf order must still load values under the right
        names (alignment is by name to the first file's schema)."""
        a = pd.DataFrame(
            {"wkt": ["POINT (1 2)"], "name": ["x"], "pop": [7]}
        )
        b = pd.DataFrame(
            {"wkt": ["POINT (3 4)"], "pop": [9], "name": ["y"]}  # swapped
        )
        shapefile.write_shapefile(spark.createDataFrame(a), str(tmp_path / "a"))
        shapefile.write_shapefile(spark.createDataFrame(b), str(tmp_path / "b"))
        datasource.register(spark)
        out = (
            spark.read.format("geomesa_shapefile")
            .load(str(tmp_path))
            .toPandas()
            .set_index("wkt")
        )
        assert out.loc["POINT (1 2)"]["name"] == "x" and out.loc["POINT (1 2)"]["pop"] == 7
        assert out.loc["POINT (3 4)"]["name"] == "y" and out.loc["POINT (3 4)"]["pop"] == 9

    def test_missing_column_nulls_not_shifted(self, spark, tmp_path):
        a = pd.DataFrame({"wkt": ["POINT (1 2)"], "name": ["x"], "pop": [7]})
        b = pd.DataFrame({"wkt": ["POINT (3 4)"], "name": ["y"]})  # no pop
        shapefile.write_shapefile(spark.createDataFrame(a), str(tmp_path / "a"))
        shapefile.write_shapefile(spark.createDataFrame(b), str(tmp_path / "b"))
        datasource.register(spark)
        out = (
            spark.read.format("geomesa_shapefile")
            .load(str(tmp_path))
            .toPandas()
            .set_index("wkt")
        )
        assert out.loc["POINT (3 4)"]["name"] == "y"
        assert pd.isna(out.loc["POINT (3 4)"]["pop"])


def test_parse_ts_offset_converts_to_utc():
    from datetime import datetime

    p = datasource._parse_ts
    assert p("2024-01-01T00:00:00+05:00") == datetime(2023, 12, 31, 19, 0, 0)
    assert p("2024-01-01T00:00:00Z") == datetime(2024, 1, 1, 0, 0, 0)
    assert p("2024-01-01T00:00:00") == datetime(2024, 1, 1, 0, 0, 0)  # naive
    assert p(1704067200) == datetime(2024, 1, 1, 0, 0, 0)  # epoch path agrees
