"""Golden-oracle machinery for the three ANN queries (lsh_topk,
ivf_topk, embdup_cosine_lsh): the independent numpy implementation in
scripts/golden_ann.py must agree with the Spark operators bit-exactly
at a fixed corpus, and its numeric replicas (XXH64 sample ordering,
HALF_UP rounding) must match Spark's primitives exactly.  The
end-to-end oracle comparison itself runs in test_oracle.py now that
the three queries carry oracle SQL.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

from golden_ann import round_half_up, seq_dot, xxh64_long  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_xxh64_long_matches_spark(spark):
    """The golden generator orders the IVF k-means sample by Spark's
    xxhash64(vec_id) — its own XXH64 (public spec) must be bit-equal."""
    from pyspark.sql import functions as F
    vals = [0, 1, 2, 499, 1999, 4799, 123456789, -1, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], ["v"]).select(
        "v", F.xxhash64(F.col("v").cast("long")).alias("h"))
    got = {r["v"]: r["h"] for r in df.collect()}
    for v in vals:
        assert xxh64_long(v) == got[v], v


def test_round_half_up_matches_spark(spark):
    """Spark ROUND on doubles is shortest-repr decimal HALF_UP — the
    exact .5-boundary cases are where half-even (numpy/python round)
    would diverge."""
    from pyspark.sql import functions as F
    vals = [0.12345, 0.12355, -0.12345, 0.4499995, 0.5, 2.5e-06,
            0.9999995, -0.4499995, 0.1234565, 0.123456499999]
    rows = spark.createDataFrame([(v,) for v in vals], ["v"]).select(
        "v", F.round("v", 4).alias("r4"), F.round("v", 6).alias("r6")
    ).collect()
    for r in rows:
        assert round_half_up(r["v"], 4) == r["r4"], r["v"]
        assert round_half_up(r["v"], 6) == r["r6"], r["v"]


def test_seq_dot_matches_catalyst_fold(spark):
    """seq_dot's dimension-loop must reproduce the left fold of
    aggregate(zip_with(...)) bitwise (summation order matters in fp)."""
    from pyspark.sql import functions as F
    rng = np.random.default_rng(7)
    a = rng.standard_normal(64).tolist()
    b = rng.standard_normal(64).tolist()
    got = spark.createDataFrame([(a, b)], ["a", "b"]).select(
        F.expr("aggregate(zip_with(a, b, (x, y) -> x * y), "
               "cast(0.0 as double), (acc, v) -> acc + v)").alias("d")
    ).collect()[0]["d"]
    mine = float(seq_dot(np.array([a]), np.array([b]))[0])
    assert mine == got


def test_emb_signature_discriminates_corpora():
    """Each sf dir must select exactly its own golden generation via
    the embeddings content signature (sf0.001 and sf0.01 both have 500
    vectors — counts cannot discriminate)."""
    from jerex_spark.operators import all_queries
    sql = all_queries()["lsh_topk"][1]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"'/root/testdata/{sf}/embeddings.parquet'")
        got = con.execute(sql).fetchall()
        want = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet("
            f"'{REPO}/golden/{sf}/golden_lsh_topk.parquet')").fetchone()[0]
        assert len(got) == want == 50, (sf, len(got), want)
        con.close()


@pytest.mark.parametrize("name,table", [
    ("lsh_topk", "lsh_topk"), ("ivf_topk", "ivf_topk"),
    ("embdup_cosine_lsh", "embdup")])
def test_spark_matches_golden_bitexact(spark, sf0001, name, table):
    """Stronger than the rounded oracle compare: the Spark result must
    equal the frozen golden rows EXACTLY (doubles bitwise) — the
    numeric-contract claim golden_ann.py's docstring makes."""
    from jerex_spark.caching import release_persisted
    from jerex_spark.operators import all_queries
    fn, _sql = all_queries()[name]
    sdf = fn(spark, sf0001)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
    release_persisted()
    g = duckdb.sql(
        f"SELECT * FROM read_parquet("
        f"'{REPO}/golden/sf0.001/golden_{table}.parquet')")
    dcols = [c for c in g.columns if c != "emb_sig"]
    assert sorted(dcols) == cols
    drows = sorted(tuple(r[g.columns.index(c)] for c in cols)
                   for r in g.fetchall())
    assert srows == drows


def test_corpus_rejected_near_rounding_boundary():
    """The freeze-time margin guard: a raw cosine within 1e-12 of a
    6-decimal HALF_UP boundary must reject the corpus."""
    from golden_ann import _assert_round_margin
    with pytest.raises(ValueError, match="rounding boundary"):
        _assert_round_margin(0.4512345000000002, "t")
    # exactly ON the boundary is the most drift-sensitive input of all
    # (one ulp down flips the rounded value) -> rejected
    with pytest.raises(ValueError, match="rounding boundary"):
        _assert_round_margin(0.4512345, "t")
    # far from the boundary -> accepted
    _assert_round_margin(0.45123, "t")
    with pytest.raises(ValueError, match="rounding boundary"):
        _assert_round_margin(-0.4512345000000002, "t")
