"""Scaling evidence for the spatio-temporal co-location join (the round-3
operator) — same methodology as tools/scaling_bench.py: per-executor JVM
isolation (local-cluster), interleaved small/large order, best-of-reps,
in-child steady-state best-of-3.

Input: two deterministic synthetic point+timestamp tables built with JVM
xxhash64 (seed-stable, no Python in synthesis).  Join: 50 km AND 1 h on
the composite (cell, time_bin) key.  Output parity is asserted across
every fleet size.

Usage: python tools/scaling_spacetime.py [--n 8000000] [--reps 2]
       [--small 2 --large 8 --exec-cores 2]
Writes BENCH/scaling_spacetime.json.
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
from geomesa_spark.session import get_spark
import __spark_entry__ as entry_mod
from geomesa_spark.operators import spatial_join as sj
import pyspark.sql.functions as FF

if n_exec > 0:
    spark = get_spark(
        "scaling-st", cores=cores, shuffle_partitions=cores,
        master=f"local-cluster[{n_exec},{cores // n_exec},6144]",
        executor_mem="6g",
    )
else:
    spark = get_spark("scaling-st", cores=cores, shuffle_partitions=cores)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
spark.conf.set("spark.sql.files.openCostInBytes", "0")
entry_mod._ship_package(spark)

cache = %(cache)r
paths = {}
for side, salt in (("a", 11), ("b", 23)):
    p = os.path.join(cache, f"st_points_{side}_n{n_rows}.parquet")
    if not os.path.exists(p):
        (spark.range(n_rows)
         .select(
             FF.col("id").alias(f"id_{side}"),
             (FF.pmod(FF.xxhash64("id", FF.lit(salt)), FF.lit(1 << 32)) / FF.lit(float(1 << 32)) * 360.0 - 180.0).alias("lon"),
             (FF.pmod(FF.xxhash64("id", FF.lit(salt + 1)), FF.lit(1 << 32)) / FF.lit(float(1 << 32)) * 170.0 - 85.0).alias("lat"),
             FF.timestamp_seconds(
                 FF.lit(1704067200)
                 + FF.pmod(FF.xxhash64("id", FF.lit(salt + 2)), FF.lit(30 * 86400))
             ).alias("ts"),
         )
         .write.mode("overwrite").parquet(p))
    paths[side] = p
a = spark.read.parquet(paths["a"])
b = spark.read.parquet(paths["b"])
n_a = a.count(); n_b = b.count()

def job():
    return sj.spatiotemporal_join_grid(
        a, b, res=7, dist_m=50_000.0, max_dt_s=3600,
        left_id="id_a", right_id="id_b", unique_ids=True,
    ).count()

def floor_job():
    # shuffle-pass floor: the minimal Spark job that moves rows through
    # one full exchange (hash-repartition on a unique key) — the
    # comparator for a join whose cost IS two such exchanges, exactly as
    # the table-pass probe is the comparator for scan-bound jobs.  Rows
    # are fanned out 8x BEFORE the exchange so the floor is
    # throughput-dominated (tens of seconds), not stage-overhead
    # dominated — a 4 s floor measures scheduling, not shuffle.
    u = a.select(FF.col("id_a").alias("k"), "lon", "lat", "ts").unionAll(
        b.select(FF.col("id_b").alias("k"), "lon", "lat", "ts"))
    u = u.withColumn("r", FF.explode(FF.sequence(FF.lit(0), FF.lit(7)))).withColumn(
        "k", FF.col("k") * 8 + FF.col("r"))
    return u.repartition(cores, "k").count()

floor_only = %(floor_only)d
res = {"cores": cores, "n_a": n_a, "n_b": n_b}
if not floor_only:
    # warm every worker slot outside the clock
    sj.spatiotemporal_join_grid(
        a.sample(0.02, seed=1), b.sample(0.02, seed=1), res=7, dist_m=50_000.0,
        max_dt_s=3600, left_id="id_a", right_id="id_b", unique_ids=True,
    ).count()
    t_best = float("inf"); rows = None
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = job()
        t_best = min(t_best, time.time() - t0)
    res.update({
        "join_s": round(t_best, 3), "join_rows": rows,
        "rows_per_s": round((n_a + n_b) / t_best, 1),
    })
floor_job()  # warm
t_floor = float("inf")
for _ in range(3):
    spark.catalog.clearCache()
    t0 = time.time()
    floor_rows = floor_job()
    t_floor = min(t_floor, time.time() - t0)
res.update({
    "floor_s": round(t_floor, 3),
    "floor_rows_per_s": round(8 * (n_a + n_b) / t_floor, 1),  # 8x fan-out
})
print("RESULT " + json.dumps(res))
spark.stop()
"""


def run_child(
    cores: int, n_exec: int, n_rows: int, cache: str, floor_only: bool = False
) -> dict:
    code = CHILD % {
        "repo": REPO, "cores": cores, "n_exec": n_exec, "n_rows": n_rows,
        "cache": cache, "floor_only": int(floor_only),
    }
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--large", type=int, default=8)
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument(
        "--floor-only", action="store_true",
        help="measure only the shuffle-pass floor and merge it into an "
        "existing BENCH/scaling_spacetime.json (join numbers untouched)",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from geomesa_spark.sources import corpus

    out_path = os.path.join(REPO, "BENCH", "scaling_spacetime.json")
    os.makedirs(corpus.CACHE_DIR, exist_ok=True)
    results: dict[int, dict] = {}
    floors: dict[int, dict] = {}
    order = [c for _ in range(args.reps) for c in (args.small, args.large)]
    for cores in order:
        n_exec = cores // args.exec_cores if args.exec_cores else 0
        r = run_child(cores, n_exec, args.n, corpus.CACHE_DIR, args.floor_only)
        print(f"rep local-cluster[{n_exec},{args.exec_cores}] ({cores} cores): {r}")
        if not args.floor_only:
            best = results.get(cores)
            if best is None or r["join_s"] < best["join_s"]:
                results[cores] = dict(r)
        fb = floors.get(cores)
        if fb is None or r["floor_s"] < fb["floor_s"]:
            floors[cores] = {k: r[k] for k in ("cores", "floor_s", "floor_rows_per_s")}

    ratio = args.large / args.small
    fs, fl = floors[args.small], floors[args.large]
    floor_eff = (fl["floor_rows_per_s"] / fs["floor_rows_per_s"]) / ratio
    if args.floor_only:
        with open(out_path) as f:
            summary = json.load(f)
    else:
        s, l = results[args.small], results[args.large]
        assert s["join_rows"] == l["join_rows"], "output parity violated"
        eff = (l["rows_per_s"] / s["rows_per_s"]) / ratio
        summary = {
            "job": "spatiotemporal_join_grid (50 km AND 1 h, composite cell+time_bin key)",
            "small": s, "large": l, "efficiency": round(eff, 3),
        }
    summary["shuffle_floor"] = {"small": fs, "large": fl, "efficiency": round(floor_eff, 3)}
    summary["floor_relative"] = round(summary["efficiency"] / floor_eff, 3)
    print(json.dumps(summary, indent=2))
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
