"""Hardware scaling control: pure-numpy processes, zero Spark.

Separates "does the dataflow scale" from "does this host scale": P
independent OS processes each loop the same f32 matmul + pairwise-max
workload as the linker's K5/LBP kernel region (one BLAS thread each, no
shared state, no shuffle, no GIL). If *these* cannot reach 4× from 8 to
32 processes, no engine can on this box — the shortfall is hypervisor /
SMT / memory-bandwidth capacity, and engine efficiency on that pairing
should be judged against the probe's ceiling, not against 1.0.

Usage: python tools/hw_scaling_probe.py [p_small] [p_large] [secs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _worker(q, stop_t: float) -> None:
    os.environ["OMP_NUM_THREADS"] = "1"
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((100, 64), dtype=np.float32)
    b = rng.standard_normal((64, 100), dtype=np.float32)
    v = rng.standard_normal((100, 100, 8), dtype=np.float32)
    it = 0
    while time.time() < stop_t:
        c = a @ b
        m = np.maximum(np.maximum(v[..., 0], v[..., 1]), np.maximum(v[..., 2], v[..., 3]))
        np.maximum(m, c, out=m)
        it += 1
    q.put(it)


def run_level(p: int, secs: float) -> float:
    q = mp.Queue()
    stop = time.time() + secs + 1.5  # absorb process start skew
    procs = [mp.Process(target=_worker, args=(q, stop)) for _ in range(p)]
    for x in procs:
        x.start()
    for x in procs:
        x.join()
    return sum(q.get() for _ in procs) / secs


def main() -> None:
    p_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    p_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    small = run_level(p_small, secs)
    large = run_level(p_large, secs)
    ratio = p_large / p_small
    print(
        json.dumps(
            {
                "metric": "hw_scaling_ceiling",
                "small_procs": p_small,
                "large_procs": p_large,
                "small_iters_per_s": round(small, 1),
                "large_iters_per_s": round(large, 1),
                "speedup": round(large / small, 3),
                "efficiency": round(large / small / ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
