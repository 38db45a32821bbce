"""Physical-plan assertions: the plans Catalyst actually produces are
the plans a 100 TB run needs — filters reach the parquet scan, column
pruning holds, small dims broadcast, bucketed joins don't shuffle, and
the extract stage contains exactly one (intentional, salted) exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    q = (li.filter(F.col("l_returnflag") == "R")
         .select("l_orderkey", "l_quantity"))
    plan = q.queryExecution if False else q._jdf.queryExecution()
    scan = plan.executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_returnflag), " \
           "EqualTo(l_returnflag,R)]" in scan
    # pruned read schema: only the 3 needed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double," \
           "l_returnflag:string>" in scan


def test_small_dim_join_broadcasts(spark, sf001):
    from jerex_spark.operators.relational import join_agg_revenue
    plan = _plan(join_agg_revenue(spark, sf001))
    assert "BroadcastHashJoin" in plan


def test_extract_pipeline_single_exchange(spark, sf001):
    from jerex_spark.pipeline import flagship_triples
    plan = _plan(flagship_triples(spark, sf001))
    # exactly one exchange: the deliberate salted repartition
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges == 1, plan
    assert "xxhash64" in plan          # the salt hash


def test_bucketed_join_no_shuffle(spark, sf001, tmp_path):
    """Pre-bucketing both sides on the join key removes the exchange —
    the co-located-join strategy for repeated big-big joins at scale."""
    orders = spark.read.parquet(f"{sf001}/orders.parquet")
    cust = spark.read.parquet(f"{sf001}/customer.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("orders_b"))
    (cust.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("customer_b"))
    try:
        j = (spark.table("orders_b")
             .join(spark.table("customer_b"),
                   F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_mktsegment").count())
        plan = _plan(j)
        # no shuffle before the join itself (the agg may exchange)
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_cost_balanced_repartition_no_global_window(spark):
    """The straggler-defense repartition must never funnel the dataset
    through one task: no unpartitioned window (SinglePartition
    exchange) anywhere in its plan — the v1 global row_number did."""
    from jerex_spark.pipeline import cost_balanced_repartition
    df = spark.range(10000).withColumn("cost", (F.col("id") % 100) * 1.0)
    out = cost_balanced_repartition(df, F.col("cost"), n=8)
    plan = _plan(out)
    assert "Exchange SinglePartition" not in plan, plan


def test_no_unpartitioned_window_in_source():
    """Belt-and-braces: no Window.orderBy without partitionBy in any
    non-test source file (the scale-killer pattern)."""
    import ast
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1] / "jerex_spark"
    bad = []
    for p in root.rglob("*.py"):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "orderBy"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "Window"):
                bad.append(f"{p.name}:{node.lineno}")
    assert not bad, f"unpartitioned Window.orderBy at {bad}"


def test_dedup_lsh_verified_gates_shingle_join(spark, sf001):
    """The verify stage's shingle self-join must consume candidate-
    filtered inputs: both scans feeding the intersection join sit below
    a LeftSemi join against the candidate doc set."""
    from jerex_spark.caching import release_persisted
    from jerex_spark.operators.dedup import dedup_lsh_verified
    try:
        plan = _optimized(dedup_lsh_verified(spark, sf001))
        assert "LeftSemi" in plan, plan
        # the jaccard intersection join (shingle = shingle) appears
        # after/below the semi-join gating in the optimized tree
        assert plan.count("LeftSemi") >= 2, (
            "both shingle sides must be candidate-gated:\n" + plan)
    finally:
        release_persisted()


def test_minhash_sig_build_is_map_only(spark, sf001):
    """Round 6: the MinHash signature build is array_min over the
    per-doc shingle array — a pure projection.  The full candidate-pair
    plan must carry NO sort-based aggregate anywhere (the former
    groupBy minimum over var-length strings planned as
    Sort+SortAggregate pairs around an exchange), and the only
    exchanges are the deterministic doc spread, the band self-join and
    the final distinct."""
    from jerex_spark.caching import release_persisted
    from jerex_spark.operators.dedup import minhash_lsh_pairs
    try:
        plan = _plan(minhash_lsh_pairs(spark, sf001))
        assert "SortAggregate" not in plan, plan
        # per-doc dedup is array_distinct, not a row-level distinct
        assert "array_distinct" in plan
    finally:
        release_persisted()


def test_sessionize_single_exchange(spark, sf001):
    """Sessionization = exactly one shuffle (on user_id) reused by the
    lag window, the running-sum window, AND the final groupBy — the
    plan a 10^12-event clickstream needs."""
    from jerex_spark.operators.relational import events_sessionize
    plan = _plan(events_sessionize(spark, sf001))
    assert plan.count("Exchange ") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_aqe_coalesces_small_shuffle(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    out = (li.groupBy("l_partkey")
           .agg(F.sum("l_quantity").alias("q"))
           .groupBy().agg(F.max("q")))
    out.collect()
    plan = _plan(out)
    assert "AQEShuffleRead" in plan or "CustomShuffleReader" in plan, plan


def test_ann_joins_never_build_the_corpus_side(spark, sf001):
    """The LSH/IVF candidate joins must broadcast only the BOUNDED side
    (queries / probes) and never the corpus side: the corpus side's
    size estimate passes through a pandas UDF + posexplode, which
    Catalyst underestimates — left unhinted it picked the corpus side
    as broadcast build and OOM'd the driver at the 10x scale probe."""
    from jerex_spark.operators.dedup import embdup_cosine_lsh
    from jerex_spark.operators.similarity import ivf_topk, lsh_topk

    plan = _plan(lsh_topk(spark, sf001))
    # exactly one broadcast join (queries), whose build side reads the
    # query filter, not the whole corpus
    assert plan.count("BroadcastExchange") == 1
    bcast = plan.split("BroadcastExchange", 1)[1]
    assert "query_id" in bcast.split("Generate", 1)[1].splitlines()[0]

    plan = _plan(ivf_topk(spark, sf001))
    assert "BroadcastHashJoin" in plan

    # the band self-join must stay a partitioned (shuffle) join: both
    # sides are O(n x bands)
    plan = _plan(embdup_cosine_lsh(spark, sf001))
    head = plan.split("ShuffledHashJoin", 1)
    assert len(head) == 2, "band self-join lost its shuffle-hash shape"
    assert "bucket" in head[1].splitlines()[0]


def test_kg_maintenance_plans(spark, sf001):
    """The KG-maintenance queries keep the shapes a 100 TB merge needs:
    the delta merge is SINGLE-PASS — surfaces are computed on the
    nested doc-graph row and triples look them up positionally, so the
    mapInPandas extract appears exactly once and the only shuffle is
    the partial-aggregable groupBy on the triple identity (round 6:
    the former persisted-graph fan-out with surface re-joins is gone).
    The PMI corpus count rides along as a 1-row broadcast, never a
    collect.  Plan construction only — no jobs."""
    from jerex_spark.operators.kg import kg_cooccur_pmi, kg_delta_merge

    plan = _plan(kg_delta_merge(spark, sf001))
    # one extract, no duplicated mapInPandas subtree, no cache needed
    assert plan.count("MapInPandas") == 1
    # partial + final HashAggregate pair on the merge key
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "partial" in plan.lower()

    plan = _plan(kg_cooccur_pmi(spark, sf001))
    assert "InMemoryTableScan" in plan
    # the 1-row n_corpus aggregate joins via broadcast nested loop
    assert "BroadcastNestedLoopJoin" in plan
