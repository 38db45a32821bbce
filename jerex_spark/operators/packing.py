"""Training-batch assembly operators: deterministic splits + packing.

The last mile of a training-data pipeline, downstream of curation
(operators/curation.py): assign every document a reproducible
train/valid/test split, and map the kept corpus onto fixed-length
training sequences (GPT-style concat-and-chunk packing: concatenate
all token streams in doc_id order, cut every CTX tokens, record which
chunk(s) each document lands in).

Both are oracle-checked exactly — all arithmetic is integer/hex, no fp.

``hash_split`` is ZERO-shuffle: a pure projection over the scan
(md5 of the salted doc id -> 4 hex chars -> bucket in [0,1000) ->
threshold split).  Hash-based assignment, not rand(): re-runs,
retries, and late-arriving partitions all agree on every document's
split, and the salt version-pins the assignment (public practice, e.g.
tf.data / dataset-split recipes).  The 16^4 % 1000 modulo bias is
~0.06% per bucket — irrelevant for split quotas; documented rather
than hidden.

``seq_packing`` needs a global prefix sum of token counts — the one
primitive Catalyst has no distributed form for (a bare
``Window.orderBy`` funnels the corpus through one task; banned by
tests/test_physical_plans.py).  Implemented as the textbook
hierarchical scan: intra-block cumulative sums under windows
PARTITIONED by block (doc_id div 4096), block totals rolled up to
super-blocks (div 4096 again), and the ≤65536 super-block offsets
accumulated on the driver (a bounded driver site like the k-means
sample in operators/similarity.py — hard-capped, raising beyond
~1.1e12 documents rather than degrading).  Every shuffle is keyed and
partial-aggregable; the driver never sees more than SUPER_CAP rows.
Sparse doc_id spaces skew block sizes but never correctness (div is
monotonic, so block order == doc order).

Token counts use the whitespace tokenizer (= token_count's
n_ws_tokens, textops.py) so the chunk map matches the corpus stats
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import _docs, _toks

SPLIT_SALT = ":split:v1"     # bump to re-draw every assignment at once
TRAIN_LT, VALID_LT = 900, 950   # /1000 -> 90/5/5
CTX = 2048                    # tokens per packed training sequence
BLOCK = 4096                  # docs per scan block
SUPER_CAP = 65536             # max super-blocks collected on the driver

_HEXD = "0123456789abcdef"


def _hex4_to_int(h):
    """First 4 hex chars of Column ``h`` as an int in [0, 65536).
    instr(haystack, needle) is 1-based in both engines."""
    v = sum(((F.instr(F.lit(_HEXD), F.substring(h, i, 1)) - 1)
             * (16 ** (4 - i))) for i in range(1, 5))
    return v.cast("long")


def hash_split(spark, sf_dir, docs_df=None) -> DataFrame:
    """(doc_id, bucket, split): deterministic md5-bucket split
    assignment.  Zero shuffles — the plan is scan + project.
    ``docs_df`` lets composing queries (decontaminate) share one
    parquet read — each spark.read.parquet re-reads the file footer
    (~70ms of driver-side construction time)."""
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SPLIT_SALT)))
    bucket = (_hex4_to_int(h) % 1000).alias("bucket")
    return ((_docs(spark, sf_dir) if docs_df is None else docs_df)
            .select("doc_id", bucket)
            .withColumn("split",
                        F.when(F.col("bucket") < TRAIN_LT, "train")
                        .when(F.col("bucket") < VALID_LT, "valid")
                        .otherwise("test")))


def _hex4_sql(h: str) -> str:
    return " + ".join(
        f"(instr('{_HEXD}', substr({h}, {i}, 1)) - 1) * {16 ** (4 - i)}"
        for i in range(1, 5))


HASH_SPLIT_SQL = f"""
WITH b AS (
  SELECT doc_id,
         ({_hex4_sql(f"md5(CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}')")})
           % 1000 AS bucket
  FROM documents)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket < {TRAIN_LT} THEN 'train'
            WHEN bucket < {VALID_LT} THEN 'valid'
            ELSE 'test' END AS split
FROM b
"""


def seq_packing(spark, sf_dir) -> DataFrame:
    """(doc_id, n_tokens, start_offset, chunk_id, end_chunk_id,
    n_chunks_spanned): concat-and-chunk packing map in doc_id order.
    ``start_offset`` is the document's first token's position in the
    concatenated stream; chunks are CTX-token windows of that stream."""
    docs = (_docs(spark, sf_dir)
            .select("doc_id", F.size(_toks()).alias("n_tokens"),
                    (F.col("doc_id") / BLOCK).cast("long").alias("blk")))

    # level 1: exclusive cumsum within each block (partitioned window)
    w_doc = (Window.partitionBy("blk").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    docs = docs.withColumn(
        "doc_excl", F.coalesce(F.sum("n_tokens").over(w_doc), F.lit(0)))

    # level 2: block totals, exclusive cumsum within each super-block
    blocks = (docs.groupBy("blk")
              .agg(F.sum("n_tokens").alias("btotal"))
              .withColumn("sup", (F.col("blk") / BLOCK).cast("long")))
    w_blk = (Window.partitionBy("sup").orderBy("blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    blocks = blocks.withColumn(
        "blk_excl", F.coalesce(F.sum("btotal").over(w_blk), F.lit(0)))

    # level 3: super-block totals -> bounded driver accumulation
    sup_rows = (blocks.groupBy("sup").agg(F.sum("btotal").alias("stotal"))
                .orderBy("sup").collect())
    if len(sup_rows) > SUPER_CAP:
        raise ValueError(
            f"seq_packing: {len(sup_rows)} super-blocks exceeds the "
            f"bounded-driver cap {SUPER_CAP} (~1.1e12 docs); add a "
            f"fourth scan level before raising the cap")
    offsets, acc = [], 0
    for r in sup_rows:
        offsets.append((r["sup"], acc))
        acc += r["stotal"]
    sup_df = spark.createDataFrame(offsets, "sup long, sup_excl long")

    block_off = (blocks.join(F.broadcast(sup_df), "sup")
                 .select("blk",
                         (F.col("blk_excl") + F.col("sup_excl"))
                         .alias("blk_off")))
    out = (docs.join(F.broadcast(block_off), "blk")
           .select("doc_id", "n_tokens",
                   (F.col("doc_excl") + F.col("blk_off"))
                   .alias("start_offset")))
    end = F.col("start_offset") + F.col("n_tokens") - 1
    return (out
            .withColumn("chunk_id",
                        (F.col("start_offset") / CTX).cast("long"))
            .withColumn("end_chunk_id", (end / CTX).cast("long"))
            .withColumn("n_chunks_spanned",
                        F.col("end_chunk_id") - F.col("chunk_id") + 1))


SEQ_PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM t)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // {CTX} AS BIGINT) AS chunk_id,
       CAST((start_offset + n_tokens - 1) // {CTX} AS BIGINT)
         AS end_chunk_id,
       CAST((start_offset + n_tokens - 1) // {CTX}
            - start_offset // {CTX} + 1 AS BIGINT) AS n_chunks_spanned
FROM c
"""


# --- stratified deterministic sampling ----------------------------------
SAMPLE_SALT = ":sample:v1"
SAMPLE_K = 20                 # docs kept per stratum


def stratified_sample(spark, sf_dir, k: int = SAMPLE_K) -> DataFrame:
    """(lang, doc_id, rk): a deterministic ``k``-per-language document
    sample — each stratum ranked by md5(doc_id || salt) and truncated,
    the retry-stable draw an eval-set builder or per-language probe
    uses instead of rand() (same motivation as :func:`hash_split`:
    re-running the job, at any parallelism, reproduces the exact rows;
    adding documents never reshuffles survivors' relative order).

    Scale shape: the only structure is a window PARTITIONED BY lang —
    stratum-local top-k, no global sort; md5 is distinct per doc_id so
    the order is total and tie-free."""
    h = F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(SAMPLE_SALT)))
    w = Window.partitionBy("lang").orderBy(F.col("h").asc())
    return (_docs(spark, sf_dir)
            .select("lang", "doc_id", h.alias("h"))
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .select("lang", "doc_id", "rk"))


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM (SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '{SAMPLE_SALT}'))
               AS rk
      FROM documents)
WHERE rk <= {SAMPLE_K}
"""


QUERIES = {
    "hash_split": (hash_split, HASH_SPLIT_SQL),
    "seq_packing": (seq_packing, SEQ_PACKING_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
}
