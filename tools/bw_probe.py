"""Host memory-bandwidth saturation probe: aggregate numpy memcpy
throughput at 1/8/32 parallel processes."""
import multiprocessing as mp
import time

import numpy as np


def worker(q):
    a = np.random.default_rng(0).random(60_000_000)  # ~480 MB
    b = np.empty_like(a)
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        np.copyto(b, a)
    dt = time.time() - t0
    q.put(reps * a.nbytes * 2 / dt)  # read+write bytes/s


if __name__ == "__main__":
    for n in (1, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        print(f"{n:2d} procs: aggregate {total/1e9:.1f} GB/s")
