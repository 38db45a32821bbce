"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ...}

``--scaling`` additionally runs the flagship extract at two
parallelism levels (local[8] vs local[32]) on the same input and
reports throughput at both plus scaling efficiency
``eff = (T_8 / T_32) / 4`` (the sandbox proxy for the N -> 4N executor
rule — see BASELINE.md), appending the measured table to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries: the flagship KG extract + the heaviest scale ops
BENCH_QUERIES = (
    "kg_triples",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "ann_cosine_topk",
    "simhash32",
    "dedup_exact",
    "tpch_q1",
    "join_agg_revenue",
)


def _count(df) -> int:
    return df.count()


def run_suite(spark, sf_dir):
    from jerex_spark.operators import all_queries
    qs = all_queries()
    timings = {}
    rows = {}
    for name in BENCH_QUERIES:
        fn, _sql = qs[name]
        t0 = time.time()
        rows[name] = _count(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    return timings, rows


def flagship_wall(master: str, sf_dir: str) -> tuple[float, int]:
    """Cold-session wall time of the flagship extract at a given master."""
    from jerex_spark.pipeline import flagship_triples
    from jerex_spark.session import build_session
    spark = build_session(app=f"bench-{master}", master=master)
    try:
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        t0 = time.time()
        flagship_triples(spark, sf_dir).count()
        return time.time() - t0, n_docs
    finally:
        spark.stop()


def main():
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    if "--scaling" in sys.argv:
        t8, n_docs = flagship_wall("local[8]", SF_DIR)
        t32, _ = flagship_wall("local[32]", SF_DIR)
        eff = (t8 / t32) / 4
        out = {
            "metric": "scaling_efficiency_8_to_32",
            "value": round(eff, 4), "unit": "ratio", "sf": sf,
            "wall_8": round(t8, 2), "wall_32": round(t32, 2),
            "docs_per_sec_8": round(n_docs / t8, 1),
            "docs_per_sec_32": round(n_docs / t32, 1),
            "n_docs": n_docs,
        }
        print(json.dumps(out))
        with open(os.path.join(os.path.dirname(__file__), "BENCH.md"),
                  "a") as f:
            f.write(
                f"\n| flagship extract sf{sf} | local[8] {t8:.1f}s "
                f"({n_docs / t8:.0f} docs/s) | local[32] {t32:.1f}s "
                f"({n_docs / t32:.0f} docs/s) | eff={eff:.3f} |\n")
        return

    from jerex_spark.session import build_session
    spark = build_session(app="bench", master=f"local[{CPUS}]")
    try:
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        t0 = time.time()
        timings, rows = run_suite(spark, SF_DIR)
        total = round(time.time() - t0, 3)
        print(json.dumps({
            "metric": "bench_suite_wall",
            "value": total, "unit": "sec",
            "queries": timings, "sf": sf,
            "rows": rows,
            "docs_per_sec_extract": round(
                n_docs / max(timings["kg_triples"], 1e-9), 1),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
