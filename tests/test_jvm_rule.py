"""The genuine JVM Catalyst rule (SURVEY.md §4.5 stretch goal —
SpatialOptimizationsRule analogue): arbitrary ``spark.sql`` with a literal
spatial conjunct over a cell-partitioned layout gets ``cell_bucket IN``
injected invisibly by a ``SparkSessionExtensions`` optimizer rule written
in Java and compiled with javac against pyspark's own jars.

Runs in a SUBPROCESS session: the rule class must be on the driver
classpath before the JVM starts, which the shared test session cannot do.
Skipped when javac is unavailable (environmental)."""

import json
import shutil
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None, reason="javac unavailable (environmental)"
)


@pytest.fixture(scope="module")
def classes_dir():
    from tools.build_jvm_rule import build

    return build()


_CHILD = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    import numpy as np, pandas as pd

    spark = (SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.extensions", "geomesa.spark.rules.GeoSparkExtensions")
        .config("spark.driver.extraClassPath", {classes!r})
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    from geomesa_spark.functions import st_funcs
    from geomesa_spark.plans import planner
    st_funcs.register(spark)

    rng = np.random.default_rng(5)
    n = 20000
    pdf = pd.DataFrame({{
        "doc_id": np.arange(n),
        "lon": rng.uniform(-179, 179, n),
        "lat": rng.uniform(-85, 85, n),
    }})
    path = {layout!r}
    planner.write_partitioned(spark.createDataFrame(pdf), path, res=10)
    spark.read.parquet(path).createOrReplaceTempView("pts")
    # a plain non-layout table (no cell_bucket): the rule must not touch it
    spark.createDataFrame(pdf).createOrReplaceTempView("raw_pts")

    POLY = "POLYGON((10 10, 20 10, 20 20, 10 20, 10 10))"
    out = {{}}

    q = f"SELECT doc_id FROM pts WHERE st_contains(st_geomFromWKT('{{POLY}}'), st_point(lon, lat))"
    res = spark.sql(q)
    opt = res._jdf.queryExecution().optimizedPlan().toString()
    phys = res._jdf.queryExecution().executedPlan().toString()
    got = sorted(r["doc_id"] for r in res.collect())
    m = (pdf.lon >= 10) & (pdf.lon <= 20) & (pdf.lat >= 10) & (pdf.lat <= 20)
    want = sorted(pdf.doc_id[m].tolist())
    out["injected"] = "cell_bucket" in opt and " IN " in opt
    pf = phys.split("PartitionFilters", 1)
    out["pruned"] = len(pf) == 2 and "cell_bucket" in pf[1][:400]
    out["match"] = got == want and len(got) > 0

    q_or = q + " OR doc_id = 1"
    r2 = spark.sql(q_or)
    opt2 = r2._jdf.queryExecution().optimizedPlan().toString()
    got2 = sorted(r["doc_id"] for r in r2.collect())
    out["or_not_injected"] = not ("cell_bucket" in opt2 and " IN " in opt2)
    out["or_match"] = got2 == sorted(set(want) | {{1}})

    q_raw = f"SELECT doc_id FROM raw_pts WHERE st_intersects(st_geomFromWKT('{{POLY}}'), st_point(lon, lat))"
    r3 = spark.sql(q_raw)
    out["raw_untouched_match"] = sorted(x["doc_id"] for x in r3.collect()) == want

    # explicit user filter on cell_bucket: idempotence guard leaves it alone
    q4 = "SELECT count(*) AS n FROM pts WHERE cell_bucket >= 0"
    out["bucket_query_intact"] = spark.sql(q4).collect()[0]["n"] == n

    print("RESULT " + json.dumps(out))
    spark.stop()
    """
)


def test_jvm_rule_injects_prunes_and_matches(classes_dir, tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.format(
        repo=repo, classes=classes_dir, layout=str(tmp_path / "layout")
    )
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600
    )
    assert p.returncode == 0, p.stderr[-3000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, p.stdout[-2000:]
    out = json.loads(line[-1][len("RESULT "):])
    assert out == {
        "injected": True,
        "pruned": True,
        "match": True,
        "or_not_injected": True,
        "or_match": True,
        "raw_untouched_match": True,
        "bucket_query_intact": True,
    }
