"""Relational operators (SURVEY.md §2.3-§2.4, §2.9, §2.11).

The reference's joins are all intra-document pair generation; here the
same shapes (ordered self-pairs, outer match, multi-hot label agg,
micro-P/R/F1, dedup, row_number ids, windowed rollups) are expressed as
plain Catalyst-optimizable DataFrame plans over the driver's TPC-H-ish
tables, each with a DuckDB oracle.

Scale notes: dimension joins are broadcast (nation/region are tiny);
aggregations are partial-agg friendly (sum/count/min/max only); no
driver-side collects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- J4 analog: ordered entity pairs i != j within a group ------------
def j4_nation_pairs(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    a = n.select(F.col("n_regionkey").alias("region_key"),
                 F.col("n_nationkey").alias("head"))
    b = n.select(F.col("n_regionkey").alias("region_key"),
                 F.col("n_nationkey").alias("tail"))
    return (a.join(F.broadcast(b), "region_key")
            .filter(F.col("head") != F.col("tail"))
            .select("region_key", "head", "tail"))


J4_SQL = """
SELECT a.n_regionkey AS region_key, a.n_nationkey AS head,
       b.n_nationkey AS tail
FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
WHERE a.n_nationkey <> b.n_nationkey
"""


# --- J8 analog: prediction<->gt outer match stats ---------------------
def j8_match_stats(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    with_orders = (_t(spark, sf_dir, "orders")
                   .select("o_custkey").distinct())
    j = cust.join(with_orders,
                  cust.c_custkey == with_orders.o_custkey, "left")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.count("o_custkey").alias("n_with_orders"),
        (F.count("*") - F.count("o_custkey")).alias("n_without_orders"),
    )


J8_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(o.o_custkey) AS n_with_orders,
       COUNT(*) - COUNT(o.o_custkey) AS n_without_orders
FROM customer c
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
  ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
"""


# --- A5 analog: multi-hot label aggregation ---------------------------
def a5_priority_multihot(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority")))
        .alias("priorities"),
        F.count("*").alias("n_orders"))


A5_SQL = """
SELECT o_custkey AS custkey,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
         AS priorities,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# --- A6: micro precision/recall/F1 (ref scoring.py:63-73 semantics) ---
def a6_micro_prf(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        (F.col("event_type") == "error").cast("int").alias("pred"),
        (F.col("value") > 150.0).cast("int").alias("gt"))
    agg = e.agg(
        F.sum(F.col("pred") * F.col("gt")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("gt"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("gt")).alias("fn"))
    return agg.select(
        "tp", "fp", "fn",
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 4)
        .alias("precision"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 4)
        .alias("recall"),
        F.round(2 * F.col("tp") / (2 * F.col("tp") + F.col("fp")
                                   + F.col("fn")), 4).alias("f1"))


A6_SQL = """
WITH x AS (
  SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS pred,
         CASE WHEN value > 150.0 THEN 1 ELSE 0 END AS gt
  FROM events),
a AS (SELECT CAST(SUM(pred * gt) AS BIGINT) AS tp,
             CAST(SUM(pred * (1 - gt)) AS BIGINT) AS fp,
             CAST(SUM((1 - pred) * gt) AS BIGINT) AS fn FROM x)
SELECT tp, fp, fn,
       ROUND(tp / (tp + fp), 4) AS precision,
       ROUND(tp / (tp + fn), 4) AS recall,
       ROUND(2.0 * tp / (2 * tp + fp + fn), 4) AS f1
FROM a
"""


# --- A6 per-type: the REAL per-type evaluator over derived triples ----
def pertype_prf_events(spark, sf_dir):
    """Runs evaluation.per_type_prf itself (the distributed per-type
    P/R/F1 evaluator, ref scoring.py:63-73 per-type semantics) over
    pred/gt triple tables derived relationally from events — so the
    evaluator's full-outer-join + per-type aggregation path is
    oracle-checked, not just the micro closed form (a6_micro_prf)."""
    from ..evaluation import per_type_prf
    e = _t(spark, sf_dir, "events")

    def mk(df):
        k = (F.col("event_id") % 100).cast("int")
        return df.select(
            F.col("user_id").cast("string").alias("doc_key"),
            F.array(F.struct(k.alias("start"),
                             (k + 1).alias("end"))).alias("head_key"),
            F.array(F.struct(F.lit(0).alias("start"),
                             F.lit(1).alias("end"))).alias("tail_key"),
            F.concat(F.lit("r"), (F.col("event_id") % 3).cast("string"))
            .alias("rel_type"))

    pred = mk(e.filter(F.col("event_type") == "error"))
    gt = mk(e.filter(F.col("value") > 150.0))
    return per_type_prf(pred, gt)


PERTYPE_SQL = """
WITH p AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS doc_key,
         CAST(event_id % 100 AS INT) AS k,
         'r' || CAST(event_id % 3 AS VARCHAR) AS rel_type
  FROM events WHERE event_type = 'error'),
g AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS doc_key,
         CAST(event_id % 100 AS INT) AS k,
         'r' || CAST(event_id % 3 AS VARCHAR) AS rel_type
  FROM events WHERE value > 150.0),
j AS (
  SELECT COALESCE(p.rel_type, g.rel_type) AS rel_type,
         CASE WHEN p.doc_key IS NOT NULL AND g.doc_key IS NOT NULL
              THEN 1 ELSE 0 END AS is_tp,
         CASE WHEN p.doc_key IS NOT NULL AND g.doc_key IS NULL
              THEN 1 ELSE 0 END AS is_fp,
         CASE WHEN p.doc_key IS NULL AND g.doc_key IS NOT NULL
              THEN 1 ELSE 0 END AS is_fn
  FROM p FULL OUTER JOIN g
    ON p.doc_key = g.doc_key AND p.k = g.k
   AND p.rel_type = g.rel_type),
per AS (
  SELECT rel_type, CAST(SUM(is_tp) AS BIGINT) AS tp,
         CAST(SUM(is_fp) AS BIGINT) AS fp,
         CAST(SUM(is_fn) AS BIGINT) AS fn
  FROM j GROUP BY rel_type),
pr AS (
  SELECT rel_type, tp, fp, fn,
         ROUND(CASE WHEN tp + fp > 0
                    THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END, 6)
           AS precision,
         ROUND(CASE WHEN tp + fn > 0
                    THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END, 6)
           AS recall
  FROM per)
SELECT rel_type, tp, fp, fn, precision, recall,
       ROUND(CASE WHEN precision + recall > 0
                  THEN 2 * precision * recall / (precision + recall)
                  ELSE 0.0 END, 6) AS f1
FROM pr
"""


# --- D2: uniqueness / distinct counting --------------------------------
def d2_lineitem_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey", "l_partkey", "l_suppkey")
        .alias("n_distinct_keys"))


D2_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT (l_orderkey, l_partkey, l_suppkey))
         AS n_distinct_keys
FROM lineitem
"""


# --- W1: row_number for deterministic id assignment (SURVEY §2.11) ----
def w1_top_orders(spark, sf_dir):
    from pyspark.sql.window import Window
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


W1_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 2
"""


# --- TPC-H Q1-style aggregation (partial-agg friendly) -----------------
def tpch_q1(spark, sf_dir):
    # money sums in DECIMAL: exact, so rounding can never straddle a
    # float .5 boundary differently than the oracle
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate",
        F.col("l_quantity").cast("decimal(18,6)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,6)").alias("price"),
        F.col("l_discount").cast("decimal(18,6)").alias("disc"))
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("qty"), 2).cast("double").alias("sum_qty"),
                 F.round(F.sum("price"), 2).cast("double")
                 .alias("sum_base_price"),
                 F.round(F.sum(F.col("price") * (1 - F.col("disc"))), 2)
                 .cast("double").alias("sum_disc_price"),
                 F.round(F.avg("qty"), 4).cast("double").alias("avg_qty"),
                 F.count("*").alias("count_order")))


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- 3-way join + aggregation (broadcast dim, shuffle fact) ------------
def join_agg_revenue(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # raw price/discount ride to the aggregation and the decimal
    # cast+multiply is evaluated INSIDE the agg: the expression then
    # runs post-shuffle across all cores instead of inside the (often
    # single-split) lineitem scan task, at identical shuffled bytes
    # (two doubles vs one decimal) and identical exact-decimal math
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    rev = (F.col("l_extendedprice").cast("decimal(18,6)")
           * (1 - F.col("l_discount").cast("decimal(18,6)")))
    return (orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
            .filter(F.col("revenue") > 100000))


JOIN_AGG_SQL = """
SELECT o.o_orderkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey
HAVING CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) > 100000
"""


# --- as-of join: latest click at-or-before each error, per user --------
# Spark lacks a native as-of join; the scalable pattern is union both
# sides and take last-non-null over an ordered per-key window — one
# shuffle on the key, no range cross-join.
def asof_click_before_error(spark, sf_dir):
    from pyspark.sql.window import Window
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_timestamp("ts").alias("epoch"))
    u = e.select(
        "event_id", "user_id", "epoch",
        F.when(F.col("event_type") == "click", F.col("epoch"))
        .alias("click_epoch"),
        F.col("event_type").alias("kind"))
    w = (Window.partitionBy("user_id")
         .orderBy("epoch", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("last_click_epoch",
                     F.last("click_epoch", ignorenulls=True).over(w))
    return (u.filter(F.col("kind") == "error")
            .select("event_id", "user_id", "epoch", "last_click_epoch"))


ASOF_SQL = """
WITH u AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
         CASE WHEN event_type = 'click'
              THEN CAST(floor(epoch(ts)) AS BIGINT) END AS click_epoch,
         event_type AS kind
  FROM events)
SELECT event_id, user_id, epoch, last_click_epoch FROM (
  SELECT event_id, user_id, epoch, kind,
         last_value(click_epoch IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch, kind, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_epoch
  FROM u) WHERE kind = 'error'
"""


# --- streaming-shaped tumbling window rollup (batch formulation) -------
def events_tumbling(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("event_type",
                      F.unix_timestamp(F.date_trunc("hour", "ts"))
                      .alias("window_start"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
                 .cast("double").alias("sum_value")))


EVENTS_TUMBLING_SQL = """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_value
FROM events GROUP BY 1, 2
"""


# --- A1/A2 relational form: element-wise max/avg pool over vectors ----
def a2_elementwise_pool(spark, sf_dir):
    e = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .select("label", F.posexplode("embedding").alias("dim", "v")))
    return (e.groupBy("label", "dim")
            .agg(F.round(F.max(F.col("v").cast("double")), 6)
                 .alias("max_val"),
                 F.count("*").alias("n")))


A2_SQL = """
WITH x AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS v
  FROM embeddings)
SELECT label, dim, ROUND(MAX(CAST(v AS DOUBLE)), 6) AS max_val,
       COUNT(*) AS n
FROM x GROUP BY label, dim
"""


# --- grouping sets / cube (engine-checklist completeness) --------------
def cube_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum(F.col("o_totalprice")
                               .cast("decimal(18,6)")), 2)
                 .cast("double").alias("sum_price")))


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- sessionization: gaps-and-islands over per-user event streams ------
# The batch formulation of session windows (web-scale clickstream op):
# a new session starts after a >30 min gap; one shuffle on user_id, two
# per-key windows, partial-agg rollup.  At 10^12 events: user_id is the
# partition key (high cardinality, AQE splits hot users), no global
# state.
SESSION_GAP_S = 1800


def events_sessionize(spark, sf_dir):
    from pyspark.sql.window import Window
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_timestamp("ts").alias("ts_s"), "value")
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    prev = F.lag("ts_s").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts_s") - prev > SESSION_GAP_S),
        1).otherwise(0)
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    x = e.withColumn("session_idx", sess)
    return (x.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts_s").alias("start_s"),
                 F.max("ts_s").alias("end_s"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
                 .cast("double").alias("sum_value")))


SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         value
  FROM events),
x AS (
  SELECT *, CASE WHEN LAG(ts_s) OVER w IS NULL
                   OR ts_s - LAG(ts_s) OVER w > {SESSION_GAP_S}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
y AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts_s, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS session_idx
  FROM x)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(ts_s) AS start_s, MAX(ts_s) AS end_s,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_value
FROM y GROUP BY user_id, session_idx
"""


# --- range (point-in-interval) join -------------------------------------
# Each error event joins the session interval containing it.  The
# scale shape: equi-join on the high-cardinality key (user_id) FIRST,
# range predicate as a post-filter — never a pure theta-join.  A
# corpus where one user's sessions are huge is AQE-skew-splittable on
# the equi key.
def range_join_error_sessions(spark, sf_dir):
    sessions = events_sessionize(spark, sf_dir).select(
        "user_id", "session_idx", "start_s", "end_s")
    errors = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"))
    return (errors.join(sessions, "user_id")
            .filter((F.col("ts_s") >= F.col("start_s"))
                    & (F.col("ts_s") <= F.col("end_s")))
            .select("event_id", "user_id", "session_idx", "ts_s",
                    "start_s", "end_s"))


RANGE_JOIN_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         value, event_type
  FROM events),
x AS (
  SELECT *, CASE WHEN LAG(ts_s) OVER w IS NULL
                   OR ts_s - LAG(ts_s) OVER w > {SESSION_GAP_S}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
y AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts_s, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS session_idx
  FROM x),
sessions AS (
  SELECT user_id, session_idx, MIN(ts_s) AS start_s, MAX(ts_s) AS end_s
  FROM y GROUP BY user_id, session_idx)
SELECT e.event_id, e.user_id, s.session_idx, e.ts_s, s.start_s, s.end_s
FROM e JOIN sessions s
  ON e.user_id = s.user_id
 AND e.ts_s BETWEEN s.start_s AND s.end_s
WHERE e.event_type = 'error'
"""


# --- JSON property extraction (semi-structured web payloads) -----------
def events_props_json(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("k"), "value")
    return (e.groupBy("k")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
                 .cast("double").alias("sum_value")))


PROPS_JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_value
FROM events GROUP BY 1
"""


QUERIES = {
    "j4_nation_pairs": (j4_nation_pairs, J4_SQL),
    "events_sessionize": (events_sessionize, SESSIONIZE_SQL),
    "events_props_json": (events_props_json, PROPS_JSON_SQL),
    "range_join_error_sessions": (range_join_error_sessions,
                                  RANGE_JOIN_SQL),
    "a2_elementwise_pool": (a2_elementwise_pool, A2_SQL),
    "cube_orders": (cube_orders, CUBE_SQL),
    "j8_match_stats": (j8_match_stats, J8_SQL),
    "a5_priority_multihot": (a5_priority_multihot, A5_SQL),
    "a6_micro_prf": (a6_micro_prf, A6_SQL),
    "pertype_prf_events": (pertype_prf_events, PERTYPE_SQL),
    "d2_lineitem_distinct": (d2_lineitem_distinct, D2_SQL),
    "w1_top_orders": (w1_top_orders, W1_SQL),
    "tpch_q1": (tpch_q1, TPCH_Q1_SQL),
    "join_agg_revenue": (join_agg_revenue, JOIN_AGG_SQL),
    "events_tumbling": (events_tumbling, EVENTS_TUMBLING_SQL),
    "asof_click_before_error": (asof_click_before_error, ASOF_SQL),
}
