"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: :mod:`geomesa_spark` — see SURVEY.md for the operator map.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``geomesa_spark`` importable on executor Python workers even
    when the driver process runs from a different cwd: zip the package and
    addPyFile it (the local-mode equivalent of ``spark-submit --py-files
    engine.zip`` that the north_rule prescribes for cluster runs)."""
    if id(spark) in _SHIPPED:
        return
    import zipfile

    zpath = os.path.join("/tmp", "geomesa_spark_pkg.zip")
    src_root = os.path.join(_REPO, "geomesa_spark")
    newest = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(src_root)
        for f in fs
        if f.endswith(".py")
    )
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < newest:
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dp, _, fs in os.walk(src_root):
                for f in fs:
                    if f.endswith(".py"):
                        full = os.path.join(dp, f)
                        z.write(full, os.path.relpath(full, _REPO))
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(id(spark))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: spatial join of the interleaved-span corpus against
    the pinned fixture polygons (cell-cover broadcast join + exact PIP
    refine), at sf0.001.  Returns (doc_id, polygon_id, n_spans)."""
    import pyspark.sql.functions as F

    _ship_package(spark)
    from geomesa_spark.operators import spatial_join as sj
    from geomesa_spark.sources import corpus

    docs = corpus.load_documents_spans(spark, "/root/testdata/sf0.001")
    # res="auto": sampled per-cell histogram picks the finest in-budget
    # index resolution (a table property; here recomputed per smoke run)
    out = sj.spatial_join_documents(
        docs, corpus.fixture_polygons(), predicate="intersects", res="auto"
    )
    return out.select(
        "doc_id", "polygon_id", F.size("spans").alias("n_spans")
    ).orderBy("doc_id", "polygon_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from geomesa_spark import entry_queries

    def wrap(fn):
        def call(spark, sf_dir):
            _ship_package(spark)
            return fn(spark, sf_dir)

        return call

    return {name: wrap(fn) for name, fn in entry_queries.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of :func:`queries` (plain SQL — no
    spatial extension offline; geometry truth uses axis-aligned fixtures
    and explicit haversine, SURVEY.md §5.2.4)."""
    from geomesa_spark import entry_queries

    return entry_queries.oracle_sql()
