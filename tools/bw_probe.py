"""Host saturation probes: aggregate throughput at 1/8/32 parallel
processes for (a) memory bandwidth (large-array memcpy) and (b) pure CPU
(cache-resident FMA loop, no memory traffic).  The 8->32 ratios bound the
scaling efficiency ANY job can achieve on this host — cite them when a
Spark job's measured 8->32 efficiency lands below the north-rule gate."""
import multiprocessing as mp
import time

import numpy as np


def bw_worker(q):
    a = np.random.default_rng(0).random(60_000_000)  # ~480 MB
    b = np.empty_like(a)
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        np.copyto(b, a)
    dt = time.time() - t0
    q.put(reps * a.nbytes * 2 / dt)  # read+write bytes/s


def cpu_worker(q):
    # 64 KB array: L1/L2-resident, so the loop measures ALU/FMA issue rate,
    # not the memory bus.  flops = reps * n * 2 (mul+add).
    a = np.random.default_rng(0).random(8192)
    t0 = time.time()
    reps = 40_000
    for _ in range(reps):
        a = a * 0.9999999 + 1e-9
    dt = time.time() - t0
    q.put(reps * a.size * 2 / dt)  # flops/s


def sweep(fn, label, unit_div, unit):
    agg = {}
    for n in (1, 2, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=fn, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        agg[n] = total
        print(f"{label} {n:2d} procs: aggregate {total/unit_div:.2f} {unit}")
    print(f"{label} 2->8 scaling efficiency: {agg[8] / (4 * agg[2]):.2f}")
    print(f"{label} 8->32 scaling efficiency: {agg[32] / (4 * agg[8]):.2f}")


if __name__ == "__main__":
    sweep(cpu_worker, "cpu   ", 1e9, "Gflop/s")
    sweep(bw_worker, "memcpy", 1e9, "GB/s")
