"""Host per-core capability vs occupancy — scaling-attribution probe.

The north rule's two-cluster-size criterion is evidenced on ONE
multi-tenant 32-core box (local[4] vs local[16]). On a real cluster,
4x executors bring 4x memory bandwidth and 4x thermal headroom; on
one box they share a socket. This probe quantifies that host effect
independently of Spark: it runs the SAME single-process kernel while
K-1 identical background processes occupy other cores, and reports
per-process throughput at K=1, 4, 16.

If per-process throughput at K=16 is materially below K=4, that gap
is a hardware ceiling (frequency scaling, shared cache / memory
bandwidth, hypervisor scheduling) that bounds ANY 16-thread job's
scaling efficiency on this box — including a perfectly parallel one.
Report: efficiency ceiling = throughput@16 / throughput@4 (per
process). Compare BENCH/scaling.json's observed pipeline efficiency
against this ceiling to see how much is code vs host.

Two kernels bracket the pipeline's profile:
- "alu": integer/float arithmetic on a small in-cache array
  (frequency-bound; no bandwidth pressure)
- "mem": streaming copy+sum over a 256 MB array (bandwidth-bound)

Usage: python tools/host_probe.py            # JSON to stdout
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

ARR_MB = int(os.environ.get("PROBE_MEM_MB", "256"))
REPS = int(os.environ.get("PROBE_REPS", "3"))


def _kernel_alu(seconds: float) -> float:
    """Iterations/sec of an in-cache arithmetic loop."""
    x = np.arange(65_536, dtype=np.float64)
    it = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        x = x * 1.0000001 + 0.5
        x -= x.mean()
        it += 1
    return it / (time.time() - t0)


def _kernel_mem(seconds: float) -> float:
    """GB/sec of a streaming copy over an out-of-cache array
    (read ARR_MB + write ARR_MB per pass — pure bandwidth, no
    reduction)."""
    a = np.random.default_rng(0).random(ARR_MB * 1024 * 1024 // 8)
    moved = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        b = a.copy()          # read + write ARR_MB
        moved += 2 * a.nbytes
        del b
    return moved / (time.time() - t0) / 1e9


def _worker(kind: str, seconds: float, q) -> None:
    fn = _kernel_alu if kind == "alu" else _kernel_mem
    q.put(fn(seconds))


def run_at_occupancy(kind: str, k: int, seconds: float = 4.0) -> float:
    """Per-process throughput with k identical processes running."""
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(kind, seconds, q)) for _ in range(k)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return float(np.mean(vals))


def main() -> None:
    out = {"loadavg_start": round(os.getloadavg()[0], 1), "occupancy": {}}
    for kind in ("alu", "mem"):
        rows = {}
        for k in (1, 4, 16):
            best = max(run_at_occupancy(kind, k) for _ in range(REPS))
            rows[str(k)] = round(best, 3)
        rows["ceiling_4_to_16"] = round(rows["16"] / rows["4"], 3)
        out["occupancy"][kind] = rows
    out["loadavg_end"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
