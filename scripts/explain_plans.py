"""Capture .explain("formatted") for bench queries (guide §1 / §7.2).

Writes one file per query to plans/r06/<query>_<tag>.txt.  Usage:

    python scripts/explain_plans.py <tag> [query ...]

With no query names, captures every BENCH_QUERIES entry from bench.py.
Pure plan capture — nothing here is timed or cached; bench.py remains
the only measurement artifact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    from bench import BENCH_QUERIES

    from jerex_spark.caching import release_persisted
    from jerex_spark.operators import all_queries
    from jerex_spark.session import build_session
    if not names:
        names = list(BENCH_QUERIES)
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = build_session(app="explain", master=f"local[{CPUS}]")
    qs = all_queries()
    try:
        for name in names:
            fn, _sql = qs[name]
            df = fn(spark, SF_DIR)
            # _sc returns the formatted plan string without printing
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            release_persisted()
            print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} "
                  f"Exchange refs)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
