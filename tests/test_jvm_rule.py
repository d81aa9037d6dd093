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
        .config("spark.sql.session.timeZone", "UTC")
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

    # st_dwithin(st_point(lon,lat), literal, r_meters): radius-padded bbox
    # injection.  Oracle = the engine's own haversine over pandas (the
    # predicate semantics), run on the full frame.
    from geomesa_spark.geo import kernels
    CTR_LON, CTR_LAT, R_M = 12.0, 52.0, 300000.0
    qd = ("SELECT doc_id FROM pts WHERE st_dwithin(st_point(lon, lat), "
          f"st_geomFromWKT('POINT({{CTR_LON}} {{CTR_LAT}})'), {{R_M}})")
    rd = spark.sql(qd)
    optd = rd._jdf.queryExecution().optimizedPlan().toString()
    gotd = sorted(r["doc_id"] for r in rd.collect())
    dist = kernels.haversine_m(
        pdf.lon.to_numpy(), pdf.lat.to_numpy(), CTR_LON, CTR_LAT)
    wantd = sorted(pdf.doc_id[dist <= R_M].tolist())
    # a single covered bucket gets its IN list folded to `=` by OptimizeIn
    import re as _re
    out["dwithin_injected"] = bool(_re.search(r"cell_bucket#\\d+ (=|IN) ", optd))
    out["dwithin_match"] = gotd == wantd and len(gotd) > 0

    # dwithin whose padded box crosses the antimeridian: haversine wraps in
    # longitude, the bucket grid does not -- the rule must take every lon
    # column (or not inject) rather than drop the wrapped side.
    qw = ("SELECT doc_id FROM pts WHERE st_dwithin(st_point(lon, lat), "
          "st_geomFromWKT('POINT(179.5 0.0)'), 300000.0)")
    gotw = sorted(r["doc_id"] for r in spark.sql(qw).collect())
    dw = kernels.haversine_m(pdf.lon.to_numpy(), pdf.lat.to_numpy(), 179.5, 0.0)
    out["dwithin_antimeridian_match"] = (
        gotw == sorted(pdf.doc_id[dw <= 300000.0].tolist()) and len(gotw) > 0)

    # degenerate both-literal predicate: constrains nothing about the row
    # -- the rule must NOT inject (it would drop every other bucket).
    qc = ("SELECT doc_id FROM pts WHERE st_contains("
          f"st_geomFromWKT('{{POLY}}'), st_geomFromWKT('POINT(15 15)'))")
    rc = spark.sql(qc)
    optc = rc._jdf.queryExecution().optimizedPlan().toString()
    out["const_pred_not_injected"] = not ("cell_bucket" in optc and " IN " in optc)
    out["const_pred_match"] = len(rc.collect()) == n

    # derived alias shadowing the layout column: lon+100 AS lon through a
    # subquery -- the row's STORED position is elsewhere, so injection on
    # cell_bucket would drop matching rows.  Rule must leave it alone.
    qa = ("SELECT doc_id FROM (SELECT doc_id, lon + 100.0 AS lon, lat, "
          "cell_bucket FROM pts) WHERE "
          f"st_contains(st_geomFromWKT('{{POLY}}'), st_point(lon, lat))")
    ra = spark.sql(qa)
    gota = sorted(r["doc_id"] for r in ra.collect())
    ma = (pdf.lon + 100.0 >= 10) & (pdf.lon + 100.0 <= 20) & (pdf.lat >= 10) & (pdf.lat <= 20)
    out["derived_alias_match"] = gota == sorted(pdf.doc_id[ma].tolist()) and len(gota) > 0

    # Z3 layout (time_bin=W/cell_bucket=B dirs): a literal timestamp
    # window on the layout's (unique) timestamp column injects
    # time_bin >= / <= bounds alongside the spatial bucket IN.
    pdf_t = pdf.copy()
    pdf_t["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 70 * 86400, n), unit="s")
    path_t = {layout!r} + "_t"
    planner.write_partitioned(spark.createDataFrame(pdf_t), path_t, res=10, time_col="ts")
    spark.read.parquet(path_t).createOrReplaceTempView("pts_t")
    T0, T1 = "2024-01-15 00:00:00", "2024-02-05 00:00:00"
    qt = ("SELECT doc_id FROM pts_t WHERE "
          f"st_contains(st_geomFromWKT('{{POLY}}'), st_point(lon, lat)) "
          f"AND ts >= TIMESTAMP '{{T0}}' AND ts < TIMESTAMP '{{T1}}'")
    rt = spark.sql(qt)
    optt = rt._jdf.queryExecution().optimizedPlan().toString()
    gott = sorted(r["doc_id"] for r in rt.collect())
    mt = ((pdf_t.lon >= 10) & (pdf_t.lon <= 20) & (pdf_t.lat >= 10) & (pdf_t.lat <= 20)
          & (pdf_t.ts >= pd.Timestamp(T0)) & (pdf_t.ts < pd.Timestamp(T1)))
    out["z3_time_injected"] = bool(
        _re.search(r"time_bin#\\d+ >= ", optt) and _re.search(r"time_bin#\\d+ <= ", optt)
        and _re.search(r"cell_bucket#\\d+ (=|IN) ", optt))
    out["z3_time_match"] = gott == sorted(pdf_t.doc_id[mt].tolist()) and len(gott) > 0

    # time-only window (no spatial conjunct): time_bin bounds alone
    qt2 = (f"SELECT count(*) AS n FROM pts_t WHERE ts >= TIMESTAMP '{{T0}}' "
           f"AND ts < TIMESTAMP '{{T1}}'")
    rt2 = spark.sql(qt2)
    optt2 = rt2._jdf.queryExecution().optimizedPlan().toString()
    nt = int(((pdf_t.ts >= pd.Timestamp(T0)) & (pdf_t.ts < pd.Timestamp(T1))).sum())
    out["time_only_injected"] = bool(_re.search(r"time_bin#\\d+ >= ", optt2))
    out["time_only_match"] = rt2.collect()[0]["n"] == nt and nt > 0

    # a timestamp bound under OR is not a top-level conjunct: no injection
    qt3 = (f"SELECT count(*) AS n FROM pts_t WHERE ts >= TIMESTAMP '{{T0}}' "
           "OR doc_id = 1")
    rt3 = spark.sql(qt3)
    optt3 = rt3._jdf.queryExecution().optimizedPlan().toString()
    nt3 = int(((pdf_t.ts >= pd.Timestamp(T0)) | (pdf_t.doc_id == 1)).sum())
    out["time_or_not_injected"] = not _re.search(r"time_bin#\\d+ >= ", optt3)
    out["time_or_match"] = rt3.collect()[0]["n"] == nt3

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
        "dwithin_injected": True,
        "dwithin_match": True,
        "dwithin_antimeridian_match": True,
        "const_pred_not_injected": True,
        "const_pred_match": True,
        "derived_alias_match": True,
        "z3_time_injected": True,
        "z3_time_match": True,
        "time_only_injected": True,
        "time_only_match": True,
        "time_or_not_injected": True,
        "time_or_match": True,
    }
