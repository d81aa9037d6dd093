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
