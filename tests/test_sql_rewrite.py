"""Transparent SQL pushdown tests: pruned result == unpruned result, and
pruning actually prunes."""

import pytest

from geomesa_spark.operators import spatial_join as sj
from geomesa_spark.plans import planner, sql_rewrite
from geomesa_spark.sources import corpus

POLY = "POLYGON((10 10, 20 10, 20 20, 10 20, 10 10))"


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sqlrw") / "pts")
    docs = corpus.load_documents_spans(spark, sf_dir)
    pts = sj.extract_geo_points(docs).select("doc_id", "lon", "lat")
    planner.write_partitioned(pts, path, res=10)
    eng = sql_rewrite.SqlEngine(spark)
    eng.register_parquet("geo_docs", path, res=10)
    return eng


def test_pushdown_same_result_as_full_scan(spark, engine):
    q = f"""
      SELECT doc_id FROM geo_docs
      WHERE st_contains(st_geomFromWKT('{POLY}'), st_point(lon, lat))
    """
    pruned = {r["doc_id"] for r in engine.sql(q).collect()}
    # full scan (no engine): plain spark.sql against the restored full view
    full = {r["doc_id"] for r in spark.sql(q).collect()}
    assert pruned == full and len(pruned) > 0


def test_pruning_happens(spark, engine):
    q = f"""
      SELECT count(*) AS n FROM geo_docs
      WHERE st_intersects(st_geomFromWKT('{POLY}'), st_point(lon, lat))
    """
    stats = engine.explain_pruning(q)
    n_total = spark.read.parquet(
        engine._tables["geo_docs"]["path"]
    ).select("cell_bucket").distinct().count()
    assert 0 < stats["geo_docs"] < n_total


def test_dwithin_pushdown(spark, engine):
    q = """
      SELECT doc_id FROM geo_docs
      WHERE st_dwithin(st_point(lon, lat), st_point(15.0D, 15.0D), 100000.0D)
    """
    pruned = {r["doc_id"] for r in engine.sql(q).collect()}
    full = {r["doc_id"] for r in spark.sql(q).collect()}
    assert pruned == full and len(pruned) > 0
    assert engine.explain_pruning(q)["geo_docs"] > 0


def test_dwithin_linestring_corridor_pushdown(spark, engine):
    """Round-4: the tube-select SQL pattern — st_dwithin against a literal
    LINESTRING — prunes via the corridor cover (same kernel the executed
    tube plan uses) and matches the full scan exactly."""
    q = """
      SELECT doc_id FROM geo_docs
      WHERE st_dwithin(st_geomFromWKT('LINESTRING(12 12, 15 15, 18 13)'),
                       st_point(lon, lat), 150000.0D)
    """
    pruned = {r["doc_id"] for r in engine.sql(q).collect()}
    full = {r["doc_id"] for r in spark.sql(q).collect()}
    assert pruned == full and len(pruned) > 0
    n_total = spark.read.parquet(
        engine._tables["geo_docs"]["path"]
    ).select("cell_bucket").distinct().count()
    assert 0 < engine.explain_pruning(q)["geo_docs"] < n_total


def test_dwithin_polygon_dilated_pushdown(spark, engine):
    """st_dwithin against a literal POLYGON prunes via the padded bbox."""
    q = f"""
      SELECT doc_id FROM geo_docs
      WHERE st_dwithin(st_geomFromWKT('{POLY}'), st_point(lon, lat), 50000.0D)
    """
    pruned = {r["doc_id"] for r in engine.sql(q).collect()}
    full = {r["doc_id"] for r in spark.sql(q).collect()}
    assert pruned == full and len(pruned) > 0
    assert engine.explain_pruning(q)["geo_docs"] > 0


def test_dwithin_unparseable_linestring_is_sound(spark, engine):
    """An unparseable corridor literal disables pruning entirely; whatever
    the predicate itself evaluates to, the engine matches plain spark.sql."""
    q = """
      SELECT count(*) AS n FROM geo_docs
      WHERE st_dwithin(st_geomFromWKT('LINESTRING(bad'), st_point(lon, lat), 1000.0D) IS NULL
    """
    assert engine.explain_pruning(q)["geo_docs"] == -1  # no pruning
    assert engine.sql(q).collect()[0]["n"] == spark.sql(q).collect()[0]["n"]


def test_no_predicate_no_pruning_full_table(spark, engine):
    n = engine.sql("SELECT count(*) AS n FROM geo_docs").collect()[0]["n"]
    full = spark.read.parquet(engine._tables["geo_docs"]["path"]).count()
    assert n == full


def test_unparseable_literal_is_sound(spark, engine):
    q = "SELECT count(*) AS n FROM geo_docs WHERE st_contains(st_geomFromWKT('POLYGON((bad'), st_point(lon, lat)) IS NULL"
    # falls back to full scan; predicate itself yields NULL → IS NULL keeps all
    n = engine.sql(q).collect()[0]["n"]
    assert n == spark.read.parquet(engine._tables["geo_docs"]["path"]).count()


def test_not_predicate_disables_pruning(spark, engine):
    """Regression (round-1 advice): NOT st_contains must not prune — rows
    OUTSIDE the cover satisfy the query."""
    q = f"""
      SELECT doc_id FROM geo_docs
      WHERE NOT st_contains(st_geomFromWKT('{POLY}'), st_point(lon, lat))
    """
    assert engine.explain_pruning(q)["geo_docs"] == -1  # no pruning
    got = {r["doc_id"] for r in engine.sql(q).collect()}
    full = {r["doc_id"] for r in spark.sql(q).collect()}
    assert got == full and len(got) > 0


def test_or_predicate_disables_pruning(spark, engine):
    q = f"""
      SELECT doc_id FROM geo_docs
      WHERE st_contains(st_geomFromWKT('{POLY}'), st_point(lon, lat))
         OR lon < -170.0
    """
    assert engine.explain_pruning(q)["geo_docs"] == -1
    got = {r["doc_id"] for r in engine.sql(q).collect()}
    full = {r["doc_id"] for r in spark.sql(q).collect()}
    assert got == full and len(got) > 0


def test_order_by_does_not_disable_pruning(spark, engine):
    q = f"""
      SELECT doc_id FROM geo_docs
      WHERE st_contains(st_geomFromWKT('{POLY}'), st_point(lon, lat))
      ORDER BY doc_id
    """
    assert engine.explain_pruning(q)["geo_docs"] > 0


class TestSpacetimePushdown:
    """Round-3 verdict item 7: st_dwithin AND a literal time window over a
    time-binned layout must prune BOTH partition dimensions (the composite
    (cell_bucket, time_bin) plan), with the exact predicates refining."""

    @pytest.fixture(scope="class")
    def st_engine(self, spark, sf_dir, tmp_path_factory):
        import pyspark.sql.functions as F

        path = str(tmp_path_factory.mktemp("sqlst") / "events_pts")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            "ts",
            F.expr("((event_id * 9973) % 36000) / 100.0 - 180.0").alias("lon"),
            F.expr("((event_id * 7919) % 17000) / 100.0 - 85.0").alias("lat"),
        )
        planner.write_partitioned(ev, path, res=10, time_col="ts")
        eng = sql_rewrite.SqlEngine(spark)
        eng.register_parquet("geo_events", path, res=10, time_col="ts")
        return eng

    Q = """
      SELECT event_id FROM geo_events
      WHERE st_dwithin(st_point(lon, lat), st_point(15.0D, 15.0D), 2000000.0D)
        AND ts >= TIMESTAMP '2024-01-08 00:00:00'
        AND ts < TIMESTAMP '2024-01-15 00:00:00'
    """

    def test_equality_with_full_scan(self, spark, st_engine):
        pruned = {r["event_id"] for r in st_engine.sql(self.Q).collect()}
        full = {r["event_id"] for r in spark.sql(self.Q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_both_dimensions_prune(self, spark, st_engine):
        stats = st_engine.explain_pruning(self.Q)
        path = st_engine._tables["geo_events"]["path"]
        full = spark.read.parquet(path)
        n_buckets = full.select("cell_bucket").distinct().count()
        n_bins = full.select("time_bin").distinct().count()
        assert 0 < stats["geo_events"] < n_buckets
        assert 0 < stats["geo_events:time_bins"] < n_bins

    def test_time_only_window_prunes(self, spark, st_engine):
        q = """
          SELECT count(*) AS n FROM geo_events
          WHERE ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
                       AND TIMESTAMP '2024-01-14 23:59:59'
        """
        stats = st_engine.explain_pruning(q)
        assert stats["geo_events:time_bins"] > 0
        n = st_engine.sql(q).collect()[0]["n"]
        full = spark.sql(q).collect()[0]["n"]
        assert n == full and n > 0

    def test_corridor_and_time_window_composite(self, spark, st_engine):
        """The full tube-select SQL pattern: corridor (literal LINESTRING
        dwithin) AND time window prune BOTH partition dimensions."""
        q = """
          SELECT event_id FROM geo_events
          WHERE st_dwithin(st_geomFromWKT('LINESTRING(0 10, 15 15, 30 10)'),
                           st_point(lon, lat), 500000.0D)
            AND ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-15 00:00:00'
        """
        stats = st_engine.explain_pruning(q)
        path = st_engine._tables["geo_events"]["path"]
        full = spark.read.parquet(path)
        assert 0 < stats["geo_events"] < full.select("cell_bucket").distinct().count()
        assert 0 < stats["geo_events:time_bins"] < full.select("time_bin").distinct().count()
        pruned = {r["event_id"] for r in st_engine.sql(q).collect()}
        plain = {r["event_id"] for r in spark.sql(q).collect()}
        assert pruned == plain and len(pruned) > 0

    def test_or_disables_time_pruning(self, spark, st_engine):
        q = """
          SELECT event_id FROM geo_events
          WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' OR event_id = 1
        """
        assert st_engine.explain_pruning(q)["geo_events:time_bins"] == -1
        got = {r["event_id"] for r in st_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0


def _box_wkt(x0, y0, x1, y1):
    return f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def _random_boxes(n, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    cx = rng.uniform(-160, 160, n)
    cy = rng.uniform(-75, 75, n)
    w = rng.uniform(0.5, 25.0, n)
    h = rng.uniform(0.5, 15.0, n)
    return [
        (f"g{i}", _box_wkt(cx[i] - w[i] / 2, cy[i] - h[i] / 2,
                           cx[i] + w[i] / 2, cy[i] + h[i] / 2))
        for i in range(n)
    ]


class TestGeomLayoutPushdown:
    """Round-5 verdict item 2: literal spatial predicates over an XZ2/XZ3
    geometry layout prune the (xz_level, xz_bucket) [+ time_bin] dirs; the
    registered view is the deduped feature table so pruned == full."""

    QUERY_BOX = _box_wkt(0, 0, 30, 30)

    @pytest.fixture(scope="class")
    def geom_engine(self, spark, tmp_path_factory):
        import pandas as pd

        from geomesa_spark.operators import xz2

        boxes = _random_boxes(200)
        geoms = spark.createDataFrame(pd.DataFrame(boxes, columns=["geom_id", "wkt"]))
        path = str(tmp_path_factory.mktemp("sqlgeom") / "shapes")
        xz2.write_partitioned_geoms(geoms, path)
        eng = sql_rewrite.SqlEngine(spark)
        eng.register_geom_parquet("geo_shapes", path, id_col="geom_id")
        return eng, boxes

    def test_view_is_deduped_feature_table(self, spark, geom_engine):
        eng, boxes = geom_engine
        df = spark.sql("SELECT * FROM geo_shapes")
        assert set(df.columns) == {"geom_id", "wkt"}
        assert df.count() == len(boxes)

    def test_intersects_literal_prunes_and_matches(self, spark, geom_engine):
        eng, _ = geom_engine
        q = f"""
          SELECT geom_id FROM geo_shapes
          WHERE st_intersects(st_geomFromWKT('{self.QUERY_BOX}'),
                              st_geomFromWKT(wkt))
        """
        path = eng._tables["geo_shapes"]["path"]
        n_dirs = (
            spark.read.parquet(path).select("xz_level", "xz_bucket").distinct().count()
        )
        assert 0 < eng.explain_pruning(q)["geo_shapes"] < n_dirs
        pruned = {r["geom_id"] for r in eng.sql(q).collect()}
        full = {r["geom_id"] for r in spark.sql(q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_contains_literal_matches(self, spark, geom_engine):
        eng, _ = geom_engine
        big = _box_wkt(-60, -60, 60, 60)
        q = f"""
          SELECT geom_id FROM geo_shapes
          WHERE st_contains(st_geomFromWKT('{big}'), st_geomFromWKT(wkt))
        """
        pruned = {r["geom_id"] for r in eng.sql(q).collect()}
        full = {r["geom_id"] for r in spark.sql(q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_dwithin_literal_padded_matches(self, spark, geom_engine):
        eng, _ = geom_engine
        q = """
          SELECT geom_id FROM geo_shapes
          WHERE st_dwithin(st_geomFromWKT('POINT(10 10)'),
                           st_geomFromWKT(wkt), 500000.0D)
        """
        assert eng.explain_pruning(q)["geo_shapes"] > 0
        pruned = {r["geom_id"] for r in eng.sql(q).collect()}
        full = {r["geom_id"] for r in spark.sql(q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_or_disables_pruning(self, spark, geom_engine):
        eng, _ = geom_engine
        q = f"""
          SELECT geom_id FROM geo_shapes
          WHERE st_intersects(st_geomFromWKT('{self.QUERY_BOX}'),
                              st_geomFromWKT(wkt))
             OR geom_id = 'g0'
        """
        assert eng.explain_pruning(q)["geo_shapes"] == -1
        got = {r["geom_id"] for r in eng.sql(q).collect()}
        full = {r["geom_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_after_pruned_query_view_restored(self, spark, geom_engine):
        eng, boxes = geom_engine
        q = f"""
          SELECT geom_id FROM geo_shapes
          WHERE st_intersects(st_geomFromWKT('{self.QUERY_BOX}'),
                              st_geomFromWKT(wkt))
        """
        eng.sql(q).collect()
        assert spark.sql("SELECT count(*) AS n FROM geo_shapes").collect()[0]["n"] == len(boxes)


class TestXZ3GeomPushdown:
    """XZ3 layout (time_bin ⊕ xz_level ⊕ xz_bucket): a literal spatial
    predicate AND a literal time window prune all three dimensions."""

    @pytest.fixture(scope="class")
    def xz3_engine(self, spark, tmp_path_factory):
        import pandas as pd

        from geomesa_spark.operators import xz2

        boxes = _random_boxes(400, seed=11)
        ts = [
            pd.Timestamp("2024-01-01") + pd.Timedelta(hours=5 * i)
            for i in range(len(boxes))
        ]
        rows = [(gid, w, t) for (gid, w), t in zip(boxes, ts)]
        geoms = spark.createDataFrame(
            pd.DataFrame(rows, columns=["geom_id", "wkt", "ts"])
        )
        path = str(tmp_path_factory.mktemp("sqlxz3") / "shapes")
        xz2.write_partitioned_geoms(geoms, path, time_col="ts")
        eng = sql_rewrite.SqlEngine(spark)
        eng.register_geom_parquet("geo_shapes_t", path, id_col="geom_id", time_col="ts")
        return eng

    Q = f"""
      SELECT geom_id FROM geo_shapes_t
      WHERE st_intersects(st_geomFromWKT('{_box_wkt(-40, -40, 40, 40)}'),
                          st_geomFromWKT(wkt))
        AND ts >= TIMESTAMP '2024-01-08 00:00:00'
        AND ts < TIMESTAMP '2024-01-22 00:00:00'
    """

    def test_all_dims_prune_and_match(self, spark, xz3_engine):
        stats = xz3_engine.explain_pruning(self.Q)
        path = xz3_engine._tables["geo_shapes_t"]["path"]
        full_df = spark.read.parquet(path)
        n_dirs = full_df.select("xz_level", "xz_bucket").distinct().count()
        n_bins = full_df.select("time_bin").distinct().count()
        assert 0 < stats["geo_shapes_t"] < n_dirs
        assert 0 < stats["geo_shapes_t:time_bins"] < n_bins
        pruned = {r["geom_id"] for r in xz3_engine.sql(self.Q).collect()}
        full = {r["geom_id"] for r in spark.sql(self.Q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_time_only_window_matches(self, spark, xz3_engine):
        q = """
          SELECT count(*) AS n FROM geo_shapes_t
          WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-15 00:00:00'
        """
        n = xz3_engine.sql(q).collect()[0]["n"]
        full = spark.sql(q).collect()[0]["n"]
        assert n == full and n > 0


class TestDualIndexSQL:
    """Round-5 capstone: a table registered in BOTH layouts routes each
    SQL query through the strategy decider — the cheaper index prunes,
    the other predicate refines, results always equal the full scan."""

    TINY = "POLYGON((10 10, 12 10, 12 12, 10 12, 10 10))"
    HUGE = "POLYGON((-179 -85, 0 -85, 179 -85, 179 85, 0 85, -179 85, -179 -85))"

    @pytest.fixture(scope="class")
    def dual_engine(self, spark, tmp_path_factory):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(23)
        n = 4000
        tags = np.where(
            rng.random(n) < 0.01, "rare",
            np.array([chr(65 + i) for i in rng.integers(0, 26, n)], dtype=object),
        )
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": np.arange(n),
                    "lon": rng.uniform(-179, 179, n),
                    "lat": rng.uniform(-85, 85, n),
                    "tag": tags,
                }
            )
        )
        root = tmp_path_factory.mktemp("dualsql")
        sp, at = str(root / "spatial"), str(root / "attr")
        planner.write_partitioned(df, sp, res=10)
        planner.write_attr_partitioned(df, at, attr_col="tag")
        eng = sql_rewrite.SqlEngine(spark)
        eng.register_dual_parquet("dual_t", sp, at, attr_col="tag", res=10)
        return eng

    def _q(self, geom, attr_pred):
        return f"""
          SELECT doc_id FROM dual_t
          WHERE st_contains(st_geomFromWKT('{geom}'), st_point(lon, lat))
            AND {attr_pred}
        """

    def test_view_is_payload_only(self, spark, dual_engine):
        df = spark.sql("SELECT * FROM dual_t")
        assert set(df.columns) == {"doc_id", "lon", "lat", "tag"}

    def test_tiny_box_broad_attr_routes_spatial(self, spark, dual_engine):
        q = self._q(self.TINY, "tag >= 'A' AND tag <= 'Z'")
        stats = dual_engine.explain_pruning(q)
        assert stats["dual_t:strategy"] == "spatial" and stats["dual_t"] > 0
        got = {r["doc_id"] for r in dual_engine.sql(q).collect()}
        full = {r["doc_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_rare_attr_huge_box_routes_attr(self, spark, dual_engine):
        q = self._q(self.HUGE, "tag = 'rare'")
        stats = dual_engine.explain_pruning(q)
        assert stats["dual_t:strategy"] == "attr" and stats["dual_t"] > 0
        got = {r["doc_id"] for r in dual_engine.sql(q).collect()}
        full = {r["doc_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_attr_only_literal_prunes_attr(self, spark, dual_engine):
        q = "SELECT doc_id FROM dual_t WHERE tag = 'rare'"
        assert dual_engine.explain_pruning(q)["dual_t:strategy"] == "attr"
        got = {r["doc_id"] for r in dual_engine.sql(q).collect()}
        full = {r["doc_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_spatial_only_literal_prunes_spatial(self, spark, dual_engine):
        q = f"""
          SELECT doc_id FROM dual_t
          WHERE st_contains(st_geomFromWKT('{self.TINY}'), st_point(lon, lat))
        """
        assert dual_engine.explain_pruning(q)["dual_t:strategy"] == "spatial"
        got = {r["doc_id"] for r in dual_engine.sql(q).collect()}
        full = {r["doc_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_or_disables_and_view_restored(self, spark, dual_engine):
        q = "SELECT doc_id FROM dual_t WHERE tag = 'rare' OR doc_id = 1"
        assert dual_engine.explain_pruning(q)["dual_t"] == -1
        got = {r["doc_id"] for r in dual_engine.sql(q).collect()}
        full = {r["doc_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0
        # restored full view after any pruned query
        dual_engine.sql(self._q(self.TINY, "tag >= 'A' AND tag <= 'Z'")).collect()
        assert spark.sql("SELECT count(*) AS n FROM dual_t").collect()[0]["n"] == 4000


class TestAttrIndexPushdown:
    """Round-4 capstone: GeoMesa's attribute-index strategy selection as a
    SQL rewrite — a literal equality/range conjunct on the registered
    attribute prunes the lexicoded ``attr_part`` dirs (+ nested
    ``date_bin`` with a literal time window); the exact predicate refines."""

    @pytest.fixture(scope="class")
    def attr_engine(self, spark, sf_dir, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("sqlattr") / "events_attr")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "user_id", "ts"
        )
        planner.write_attr_partitioned(
            ev, path, attr_col="event_type", date_col="ts"
        )
        eng = sql_rewrite.SqlEngine(spark)
        eng.register_attr_parquet(
            "events_attr", path, attr_col="event_type", date_col="ts"
        )
        return eng

    def test_equality_prunes_and_matches(self, spark, attr_engine):
        q = """
          SELECT event_id, user_id FROM events_attr
          WHERE event_type = 'click'
        """
        stats = attr_engine.explain_pruning(q)
        path = attr_engine._tables["events_attr"]["path"]
        n_parts = (
            spark.read.parquet(path).select("attr_part").distinct().count()
        )
        assert 0 < stats["events_attr"] < n_parts
        pruned = {r["event_id"] for r in attr_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_range_prunes_and_matches(self, spark, attr_engine):
        q = """
          SELECT event_id FROM events_attr
          WHERE event_type >= 'click' AND event_type <= 'purchase'
        """
        assert attr_engine.explain_pruning(q)["events_attr"] > 0
        pruned = {r["event_id"] for r in attr_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_attr_and_date_window_composite(self, spark, attr_engine):
        q = """
          SELECT event_id FROM events_attr
          WHERE event_type = 'click'
            AND ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-15 00:00:00'
        """
        stats = attr_engine.explain_pruning(q)
        path = attr_engine._tables["events_attr"]["path"]
        full_df = spark.read.parquet(path)
        assert 0 < stats["events_attr"]
        assert (
            0
            < stats["events_attr:time_bins"]
            < full_df.select("date_bin").distinct().count()
        )
        pruned = {r["event_id"] for r in attr_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert pruned == full and len(pruned) > 0

    def test_or_disables_attr_pruning(self, spark, attr_engine):
        q = """
          SELECT event_id FROM events_attr
          WHERE event_type = 'click' OR user_id = 1
        """
        assert attr_engine.explain_pruning(q)["events_attr"] == -1
        got = {r["event_id"] for r in attr_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_no_literal_full_scan(self, spark, attr_engine):
        n = attr_engine.sql("SELECT count(*) AS n FROM events_attr").collect()[0]["n"]
        path = attr_engine._tables["events_attr"]["path"]
        assert n == spark.read.parquet(path).count()

    def test_case_when_projection_does_not_prune(self, spark, attr_engine):
        """Round-5 advice (high): a literal equality inside a CASE WHEN
        projection is NOT a WHERE conjunct — pruning on it drops rows."""
        q = """
          SELECT event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS flag
          FROM events_attr
        """
        assert attr_engine.explain_pruning(q)["events_attr"] == -1
        got = {(r["event_id"], r["flag"]) for r in attr_engine.sql(q).collect()}
        full = {(r["event_id"], r["flag"]) for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0
        # both flag values present — the un-pruned rows actually survive
        assert {f for _, f in got} == {0, 1}

    def test_other_table_qualified_column_does_not_prune(
        self, spark, attr_engine, sf_dir
    ):
        """Round-5 advice (high): ``o.event_type = 'x'`` where ``o`` is a
        DIFFERENT table must not prune events_attr's attr_part dirs."""
        spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type"
        ).createOrReplaceTempView("other_events")
        q = """
          SELECT e.event_id FROM events_attr e
          JOIN other_events o ON e.event_id = o.event_id
          WHERE o.event_type = 'purchase'
        """
        assert attr_engine.explain_pruning(q)["events_attr"] == -1
        got = {r["event_id"] for r in attr_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_own_alias_qualified_column_still_prunes(self, spark, attr_engine):
        """``e.event_type`` where ``e`` aliases the registered table IS a
        genuine conjunct — pruning stays on."""
        q = """
          SELECT e.event_id FROM events_attr e
          WHERE e.event_type = 'click'
        """
        assert attr_engine.explain_pruning(q)["events_attr"] > 0
        got = {r["event_id"] for r in attr_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_subquery_in_where_does_not_prune(self, spark, attr_engine, sf_dir):
        """A correlated subquery's inner conjunct must not leak into the
        outer table's bounds."""
        spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type"
        ).createOrReplaceTempView("other_events2")
        q = """
          SELECT event_id FROM events_attr
          WHERE event_id IN (
            SELECT event_id FROM other_events2 WHERE event_type = 'purchase'
          )
        """
        assert attr_engine.explain_pruning(q)["events_attr"] == -1
        got = {r["event_id"] for r in attr_engine.sql(q).collect()}
        full = {r["event_id"] for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0

    def test_escaped_quote_literal_captured_whole(self, attr_engine):
        """Round-5 advice (low): ``'O''Brien'`` must capture the full
        unescaped value, not truncate at the doubled quote (with
        prefix_len>1 the truncated bound maps to the wrong partition)."""
        meta = attr_engine._tables["events_attr"]
        q = "SELECT event_id FROM events_attr WHERE event_type = 'O''Brien'"
        bounds = attr_engine._attr_bounds_from_query(q, meta, "events_attr")
        assert bounds == ("O'Brien", "O'Brien")

    def test_case_when_disables_time_pruning_too(self, spark, attr_engine):
        """The date_bin path is gated by the same WHERE-clause scoping."""
        q = """
          SELECT event_id,
                 CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00' THEN 1 ELSE 0 END AS late
          FROM events_attr
        """
        assert attr_engine.explain_pruning(q)["events_attr:time_bins"] == -1
        got = {(r["event_id"], r["late"]) for r in attr_engine.sql(q).collect()}
        full = {(r["event_id"], r["late"]) for r in spark.sql(q).collect()}
        assert got == full and len(got) > 0
