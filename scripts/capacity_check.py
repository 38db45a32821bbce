"""Controlled scaling measurement: the extract kernel under pure
multiprocessing (no Spark, no JVM, no shuffle) at 1 / N / 4N workers.

The north rule's N -> 4N >= 0.8 criterion cannot use a real cluster in
this sandbox, and the host VM's CPU throughput swings ~2x on ~10-second
windows (BENCH.md methodology note), so `bench.py --scaling` single
attempts are noisy.  This script is the controlled companion: it times
the exact per-partition worker loop (extract._extract_batch) with BLAS
pinned to one thread per worker, best-of-R per configuration, all
configurations interleaved within one process lifetime so they sample
the same host window.  If per-core throughput is flat from N to 4N
workers here, the operator itself scales; any bench.py --scaling spread
is host noise, not a serial bottleneck.

Usage: python scripts/capacity_check.py [sf_dir] [batch_docs] [rounds]
           [--pin]
Prints one JSON line.

``--pin`` gives each pool a fixed CPU set (pool of w workers ->
cpus 0..w-1 via sched_setaffinity) so the small-worker legs can't be
migrated across the whole package by the scheduler mid-measurement —
the one topology lever this single-socket single-NUMA-node VM offers
(no cross-node memory to pin against).
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"          # must precede numpy import in workers


def _work(args):
    import pandas as pd

    from jerex_spark.config import DEFAULT
    from jerex_spark.extract import _extract_batch
    keys, texts = args
    t0 = time.time()
    out = _extract_batch(pd.DataFrame({"doc_key": keys, "text": texts}),
                         DEFAULT)
    return len(out), time.time() - t0


def main():
    import multiprocessing as mp

    import pandas as pd
    args = [a for a in sys.argv[1:] if a != "--pin"]
    pin = "--pin" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    batch = int(args[1]) if len(args) > 1 else 312
    rounds = int(args[2]) if len(args) > 2 else 2
    configs = (tuple(int(x) for x in args[3].split(","))
               if len(args) > 3 else (1, 4, 16))
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    keys = [f"{s}/{d}" for s, d in zip(docs["source"], docs["doc_id"])]
    texts = list(docs["text"])
    batches = [(keys[i:i + batch], texts[i:i + batch])
               for i in range(0, len(keys), batch)]
    best: dict[int, float] = {}
    ctx = mp.get_context("spawn")
    pools = {w: ctx.Pool(w, _warm, ((set(range(w)) if pin else None),))
             for w in configs}                         # one pool per w
    try:
        for w, pool in pools.items():                  # warm imports
            pool.map(_work, batches[:w])
        for _ in range(rounds):
            for w in configs:                # interleaved: same window
                n_b = max(w * 6, 12)         # >=6 batches/worker: tail
                                             # (straggler) effects <1/6
                todo = (batches * ((n_b // len(batches)) + 1))[:n_b]
                n_docs = sum(len(b[0]) for b in todo)
                t0 = time.time()
                pools[w].map(_work, todo, chunksize=1)
                dt = time.time() - t0
                best[w] = max(best.get(w, 0.0), n_docs / dt)
    finally:
        for pool in pools.values():
            pool.terminate()
    lo, hi = configs[-2], configs[-1]
    out = {
        "metric": "extract_capacity_docs_per_sec",
        "pinned": pin,
        "batch_docs": batch,
        "per_workers": {str(w): round(best[w], 1) for w in configs},
        "per_core": {str(w): round(best[w] / w, 1) for w in configs},
        f"eff_{lo}_to_{hi}": round((best[hi] / hi) / (best[lo] / lo), 4),
    }
    print(json.dumps(out))


def _warm(cpus=None):
    for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
               "MKL_NUM_THREADS"):
        os.environ[_v] = "1"
    if cpus:
        os.sched_setaffinity(0, cpus)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
