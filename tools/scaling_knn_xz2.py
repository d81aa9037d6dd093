"""Scaling evidence for kNN and the XZ2 poly×point join at 2→8 executors
(round-3 verdict item 9: the two headline queries without fleet-size
evidence) — same methodology as tools/scaling_bench.py /
scaling_spacetime.py: per-executor JVM isolation (local-cluster),
interleaved small/large order, best-of-reps, in-child steady-state
best-of-3, output parity asserted across fleet sizes.

Inputs are deterministic synthetic tables built with JVM xxhash64
(seed-stable, no Python in synthesis).  Comparators: kNN is scan-bound
(per-round broadcast ring join over the persisted encoded table) so its
floor is the table-pass probe (2-column sum, zero shuffle); the XZ2 join
shuffles both sides on (xz_level, xz_cell) so its floor is the
shuffle-pass probe (hash-repartition through one exchange).

Usage: python tools/scaling_knn_xz2.py [--job knn|xz2] [--n N] [--reps 2]
       [--small 2 --large 8 --exec-cores 2]
Writes BENCH/scaling_knn.json / BENCH/scaling_xz2.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cores = %(cores)d
n_exec = %(n_exec)d
n_rows = %(n_rows)d
job_name = %(job)r
from geomesa_spark.session import get_spark
import __spark_entry__ as entry_mod
import pyspark.sql.functions as FF

if n_exec > 0:
    spark = get_spark(
        "scaling-kx", cores=cores, shuffle_partitions=cores,
        master=f"local-cluster[{n_exec},{cores // n_exec},6144]",
        executor_mem="6g",
    )
else:
    spark = get_spark("scaling-kx", cores=cores, shuffle_partitions=cores)
# 1 MB splits: the synthetic table is a few tens of MB — at the 8 MB
# default it yields fewer splits than 8 cores and the pre-shuffle stages
# cap at the split count, not the fleet (same rationale as bench.py)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 * 1024 * 1024))
spark.conf.set("spark.sql.files.openCostInBytes", "0")
entry_mod._ship_package(spark)

cache = %(cache)r
p = os.path.join(cache, f"kx_points_n{n_rows}.parquet")
if not os.path.exists(p):
    (spark.range(n_rows)
     .select(
         FF.col("id").alias("event_id"),
         (FF.pmod(FF.xxhash64("id", FF.lit(7)), FF.lit(1 << 32)) / FF.lit(float(1 << 32)) * 360.0 - 180.0).alias("lon"),
         (FF.pmod(FF.xxhash64("id", FF.lit(8)), FF.lit(1 << 32)) / FF.lit(float(1 << 32)) * 170.0 - 85.0).alias("lat"),
     )
     .write.mode("overwrite").parquet(p))
pts = spark.read.parquet(p)
n_pts = pts.count()
res = {"cores": cores, "n_pts": n_pts}

if job_name == "knn":
    from geomesa_spark.operators import knn as knn_op

    QUERIES = [
        dict(query_id=f"Q{i}", lon=float(((i * 73) %% 340) - 170),
             lat=float(((i * 37) %% 160) - 80), k=10)
        for i in range(10)
    ]

    def job():
        out = knn_op.knn(pts, QUERIES, res=7)
        return len(out), int(out["dist_m"].sum() * 1000)

    # warm every worker slot outside the clock (sample keeps all splits)
    knn_op.knn(pts.sample(0.02, seed=1), QUERIES[:2], res=7)
    t_best = float("inf"); rows = None
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = job()
        t_best = min(t_best, time.time() - t0)
    res.update({
        "job_s": round(t_best, 3), "rows": rows[0], "checksum": rows[1],
        "rows_per_s": round(n_pts / t_best, 1),
    })

    def floor_job():
        # table-pass floor: full parquet decode, zero shuffle, scalar out
        return pts.select(FF.sum("lon"), FF.sum("lat")).collect()[0][0]

elif job_name == "xz2":
    from geomesa_spark.operators import xz2 as xz2_op

    geoms = (
        pts.filter(FF.col("event_id") %% 37 == 0)
        .select(
            FF.col("event_id").alias("geom_event_id"),
            FF.expr(
                "concat('POLYGON((',"
                " CAST(lon - 2.005 AS STRING), ' ', CAST(greatest(lat - 1.005, -89.9) AS STRING), ', ',"
                " CAST(lon + 2.005 AS STRING), ' ', CAST(greatest(lat - 1.005, -89.9) AS STRING), ', ',"
                " CAST(lon + 2.005 AS STRING), ' ', CAST(least(lat + 1.005, 89.9) AS STRING), ', ',"
                " CAST(lon - 2.005 AS STRING), ' ', CAST(least(lat + 1.005, 89.9) AS STRING), ', ',"
                " CAST(lon - 2.005 AS STRING), ' ', CAST(greatest(lat - 1.005, -89.9) AS STRING), '))')"
            ).alias("wkt"),
        )
    )
    n_geoms = geoms.count()
    res["n_geoms"] = n_geoms

    def job():
        return xz2_op.xz2_join_points(
            geoms, pts.select(FF.col("event_id").alias("point_event_id"), "lon", "lat"),
            predicate="intersects",
        ).count()

    xz2_op.xz2_join_points(
        geoms.sample(0.02, seed=1),
        pts.sample(0.02, seed=1).select(FF.col("event_id").alias("point_event_id"), "lon", "lat"),
    ).count()
    t_best = float("inf"); rows = None
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = job()
        t_best = min(t_best, time.time() - t0)
    res.update({
        "job_s": round(t_best, 3), "rows": rows,
        "rows_per_s": round((n_pts + n_geoms) / t_best, 1),
    })

    def floor_job():
        # shuffle-pass floor (same probe as scaling_spacetime): fan rows
        # out 32x (64M narrow rows) so the probe is throughput-dominated
        # (tens of seconds), not stage-overhead dominated
        u = pts.withColumn("r", FF.explode(FF.sequence(FF.lit(0), FF.lit(31))))
        u = u.withColumn("k", FF.col("event_id") * 32 + FF.col("r"))
        return u.repartition(cores, "k").count()

else:
    raise SystemExit(f"unknown job {job_name}")

floor_job()  # warm
t_floor = float("inf")
for _ in range(3):
    spark.catalog.clearCache()
    t0 = time.time()
    floor_job()
    t_floor = min(t_floor, time.time() - t0)
res["floor_s"] = round(t_floor, 3)
print("RESULT " + json.dumps(res))
spark.stop()
"""


def run_child(cores: int, n_exec: int, n_rows: int, cache: str, job: str) -> dict:
    code = CHILD % {
        "repo": REPO, "cores": cores, "n_exec": n_exec, "n_rows": n_rows,
        "cache": cache, "job": job,
    }
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", choices=["knn", "xz2"], required=True)
    ap.add_argument("--n", type=int, default=0, help="0 = per-job default")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--large", type=int, default=8)
    ap.add_argument("--exec-cores", type=int, default=2)
    args = ap.parse_args()
    if not args.n:
        # sized so the 2-core run is throughput-dominated (tens of
        # seconds), not stage-overhead dominated.  xz2 candidate volume
        # grows ~n²/2048 (every point meets every same-cell box): 2M pts
        # × 54k boxes ≈ 53M refine candidates ≈ 30-60 s at 2 cores — 8M
        # was measured at >40 min, hopeless as a sweep unit.
        args.n = {"knn": 40_000_000, "xz2": 2_000_000}[args.job]

    sys.path.insert(0, REPO)
    from geomesa_spark.sources import corpus

    out_path = os.path.join(REPO, "BENCH", f"scaling_{args.job}.json")
    os.makedirs(corpus.CACHE_DIR, exist_ok=True)
    results: dict[int, dict] = {}
    order = [c for _ in range(args.reps) for c in (args.small, args.large)]
    for cores in order:
        n_exec = cores // args.exec_cores if args.exec_cores else 0
        r = run_child(cores, n_exec, args.n, corpus.CACHE_DIR, args.job)
        print(f"rep local-cluster[{n_exec},{args.exec_cores}] ({cores} cores): {r}")
        best = results.get(cores)
        if best is None or r["job_s"] < best["job_s"]:
            results[cores] = dict(r)
        elif r["floor_s"] < best["floor_s"]:
            best["floor_s"] = r["floor_s"]

    ratio = args.large / args.small
    s, l = results[args.small], results[args.large]
    assert s["rows"] == l["rows"], "output parity violated"
    if "checksum" in s:
        assert s["checksum"] == l["checksum"], "result checksum differs across fleets"
    eff = (l["rows_per_s"] / s["rows_per_s"]) / ratio
    floor_eff = (s["floor_s"] / l["floor_s"]) / ratio
    summary = {
        "job": {
            "knn": "kNN 10 queries k=10 res=7 (iterative broadcast ring join)",
            "xz2": "xz2_join_points poly×point intersects (large×large)",
        }[args.job],
        "small": s,
        "large": l,
        "efficiency": round(eff, 3),
        "floor_efficiency": round(floor_eff, 3),
        "floor_relative": round(eff / floor_eff, 3),
    }
    print(json.dumps(summary, indent=2))
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
