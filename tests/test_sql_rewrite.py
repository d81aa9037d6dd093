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
