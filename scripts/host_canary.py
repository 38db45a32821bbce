"""2-second host-speed canary for scaling-attempt scheduling.

The VM's effective CPU/memory-bus throughput swings ~2x on
~10-second-to-minute windows (BENCH.md methodology note).  A scaling
attempt launched inside a depressed window measures the window, not
the code.  This canary times two tiny probes — a single-core
memory-bandwidth pass and an 8-way multiprocessing pass over the same
buffers — so an operator (human or script) can launch the expensive
interleaved attempt only when the host is in a fast phase.

Usage: python scripts/host_canary.py  ->  one JSON line
    {"single_gbps": ..., "eight_gbps": ..., "ratio": ...}

Calibration on this VM (2026-08-17): fast windows show
single >= ~7 GB/s and eight >= ~20 GB/s; depressed windows halve
both.  Attempts gated on the canary are DISCLOSED in BENCH.md and
every launched attempt is still reported.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

import numpy as np

_MB = 256
_N = _MB * 1024 * 1024 // 8


def _bw_pass(_arg=None) -> float:
    """One read+reduce pass over a fresh 256 MB buffer; returns GB/s."""
    x = np.ones(_N)
    t0 = time.time()
    s = 0.0
    for _ in range(3):
        s += float(x.sum())
    dt = time.time() - t0
    assert s > 0
    return 3 * _MB / 1024 / dt


def _cpu_times() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def measure() -> dict:
    single = max(_bw_pass() for _ in range(3))
    with mp.get_context("spawn").Pool(8) as pool:
        pool.map(_bw_pass, range(8))      # warm: spawn + numpy import
        c0 = _cpu_times()
        t0 = time.time()
        per = pool.map(_bw_pass, range(8))
        wall = time.time() - t0
        c1 = _cpu_times()
    eight = 8 * 3 * _MB / 1024 / wall
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d) or 1
    # /proc/stat: user nice system idle iowait irq softirq steal —
    # steal under load is the hypervisor denying this guest its own
    # vCPUs; idle-while-starved is the same denial seen from inside
    return {
        "single_gbps": round(single, 2),
        "eight_gbps": round(eight, 2),
        "per_worker_min_gbps": round(min(per), 2),
        "ratio": round(eight / single, 2),
        "steal_pct_under_load": round(100 * d[7] / tot, 1),
        "idle_pct_under_load": round(100 * d[3] / tot, 1),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))
