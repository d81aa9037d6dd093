"""Bounded operator-cache registry semantics (round-4: same-plan reuse).

The round-3 unconditional swap turned best-of-N reps of the XZ2 join into
recompute-every-rep — a measured 1.7x regression (interleaved A/B,
round-3 verdict item 3).  swap_cache must now (a) return the CACHED frame
when the new plan is sameResult, (b) still swap on a different plan, and
(c) not serve a stale entry after an external clearCache().
"""

import pyspark.sql.functions as F

from geomesa_spark import cache


def test_same_plan_returns_cached_frame(spark):
    cache.clear_caches()
    a = spark.range(100).withColumn("v", F.col("id") * 2)
    got1 = cache.swap_cache("t.same", a)
    got1.count()
    assert got1.is_cached
    # an identically-built frame must hit the SAME cache entry
    b = spark.range(100).withColumn("v", F.col("id") * 2)
    got2 = cache.swap_cache("t.same", b)
    assert got2 is got1 and got2.is_cached
    cache.clear_caches()


def test_different_plan_swaps_and_unpersists_previous(spark):
    cache.clear_caches()
    a = cache.swap_cache("t.diff", spark.range(100).withColumn("v", F.col("id") * 2))
    a.count()
    b = cache.swap_cache("t.diff", spark.range(100).withColumn("v", F.col("id") * 3))
    b.count()
    assert b.is_cached and not a.is_cached  # bounded: one entry per key
    assert b.agg(F.sum("v")).first()[0] == 3 * sum(range(100))
    cache.clear_caches()


def test_external_clear_cache_is_not_served_stale(spark):
    cache.clear_caches()
    a = cache.swap_cache("t.stale", spark.range(50).withColumn("v", F.col("id") + 1))
    a.count()
    spark.catalog.clearCache()
    b = cache.swap_cache("t.stale", spark.range(50).withColumn("v", F.col("id") + 1))
    assert b.is_cached  # re-persisted, not the stale uncached entry
    assert b.count() == 50
    cache.clear_caches()


def test_alias_only_difference_must_not_reuse(spark):
    """Regression (round 4, found live): sameResult canonicalizes
    attribute names away, so a plan differing ONLY in output aliases
    compared equal and the caller got the previous query's schema
    (zonal_stats received xz2_poly_point_join's geom_event_id column
    instead of zone_id).  Column names must gate reuse."""
    cache.clear_caches()
    a = cache.swap_cache(
        "t.alias", spark.range(50).select(F.col("id").alias("geom_event_id"))
    )
    a.count()
    b = cache.swap_cache(
        "t.alias", spark.range(50).select(F.col("id").alias("zone_id"))
    )
    assert b.columns == ["zone_id"]
    assert b is not a
    b.count()
    assert b.is_cached and not a.is_cached  # still bounded: one entry per key
    cache.clear_caches()
