"""Empirical gate for frozen golden oracles: every golden-backed query
(the five kg_* flagships + the three ANN queries) is run through the
LIVE Spark pipeline and compared EXACTLY — column set and full row
multiset, doubles bitwise — against its golden oracle SQL at each sf
dir.  This is the required follow-up whenever scripts/make_golden.py
prints a margin warning (fp32 order-statistics regime: a corpus-min
mention/enttype margin of a few ulps is normal at any large corpus and
cannot be floor-guarded — see make_golden.py's MARGIN_FLOORS note),
and a useful sanity pass any time the goldens or the pipeline change.

Usage: python scripts/check_golden.py [sf_dir ...]
(defaults to /root/testdata/sf{0.001,0.01,0.1}; exits 1 on mismatch)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# every golden-backed query (both views are registered per sf dir)
GOLDEN_QUERIES = (
    "kg_mentions", "kg_entities", "kg_triples", "kg_triples_global",
    "kg_doc_stats", "lsh_topk", "ivf_topk", "embdup_cosine_lsh",
)


def check(sf_dirs: list[str]) -> bool:
    from jerex_spark.caching import release_persisted
    from jerex_spark.operators import all_queries
    from jerex_spark.session import build_session

    qs = all_queries()
    spark = build_session(app="check-golden")
    ok = True
    try:
        for sf_dir in sf_dirs:
            con = duckdb.connect()
            for t in ("documents", "embeddings"):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"'{sf_dir}/{t}.parquet'")
            for name in GOLDEN_QUERIES:
                fn, sql = qs[name]
                sdf = fn(spark, sf_dir)
                cols = sorted(sdf.columns)
                srows = sorted(tuple(r[c] for c in cols)
                               for r in sdf.collect())
                release_persisted()
                res = con.execute(sql)
                dcols = [c[0] for c in res.description]
                drows = sorted(tuple(r[dcols.index(c)] for c in cols)
                               for r in res.fetchall())
                match = sorted(dcols) == cols and srows == drows
                ok &= match
                print(f"{os.path.basename(sf_dir)} {name}: "
                      f"{'EXACT-MATCH' if match else 'MISMATCH'} "
                      f"({len(srows)} rows)")
                if not match:
                    so = [r for r in srows if r not in drows][:3]
                    do = [r for r in drows if r not in srows][:3]
                    print(f"  spark-only: {so}\n  golden-only: {do}")
            con.close()
    finally:
        spark.stop()
    return ok


if __name__ == "__main__":
    dirs = sys.argv[1:] or [f"/root/testdata/sf{s}"
                            for s in ("0.001", "0.01", "0.1")]
    sys.exit(0 if check(dirs) else 1)
