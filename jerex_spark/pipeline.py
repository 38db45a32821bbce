"""End-to-end pipeline wiring: pages/documents -> KG tables.

This is the driver-visible composition of the stages: load ->
salted repartition (skew) -> fused extract (shuffle-free) ->
explode -> canonicalize -> dedup -> write.  Each stage returns a
DataFrame so callers can cut the pipeline anywhere (tests, bench,
lineage checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT, PipelineConfig
from .extract import (explode_entities, explode_mentions, explode_triples,
                      extract_graph)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-provided documents table -> (doc_key, text, lang, source).

    ``doc_key = source '/' doc_id`` stands in for the page url
    (FIXTURES.md §4)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string"))
        .alias("doc_key"),
        "doc_id", "text", "lang", "source")


def salted_repartition(df: DataFrame, key: str = "doc_key",
                       cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """Skew-defeating repartition before the heavy extract UDF.

    Web corpora are skewed by host/language; hashing the full document
    key with a salt spreads hot hosts across all partitions (SURVEY.md
    §4 item 2).  xxhash64 is cheap, JVM-side, and deterministic."""
    n = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(n, F.xxhash64(F.col(key), F.lit(cfg.weight_seed)))


def cost_balanced_repartition(df: DataFrame, cost: "F.Column",
                              n: int | None = None) -> DataFrame:
    """Straggler-defeating repartition for heavy-tailed per-row cost
    (SURVEY.md §4 item 3: long docs cost ~quadratically more in the
    extract UDF).  Rows are ranked by descending cost and dealt
    round-robin across partitions, so every partition gets the same
    cost profile — a hash repartition can land several giants in one
    task.  One extra shuffle; use for corpora with heavy length tails
    (the per-doc span/mention caps bound the worst case regardless)."""
    from pyspark.sql.window import Window
    n = n or df.sparkSession.sparkContext.defaultParallelism * 2
    ranked = df.withColumn(
        "_rank", F.row_number().over(Window.orderBy(cost.desc())))
    # range-partition on the round-robin slot: exactly one slot value
    # per partition (hash would collide slots)
    return (ranked.withColumn("_slot", F.pmod(F.col("_rank"), F.lit(n)))
            .repartitionByRange(n, F.col("_slot"))
            .drop("_rank", "_slot"))


def build_graph(documents: DataFrame,
                cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """documents(doc_key, text, ...) -> persisted nested doc-graph."""
    return extract_graph(salted_repartition(documents, cfg=cfg), cfg)


def kg_tables(graph: DataFrame) -> dict[str, DataFrame]:
    return {
        "mentions": explode_mentions(graph),
        "entities": explode_entities(graph),
        "triples": explode_triples(graph),
    }


def flagship_triples(spark: SparkSession, sf_dir: str,
                     cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """The headline query: emit all (subj, pred, obj) triples with types
    and provenance for the corpus (SURVEY.md §7.1 step 3)."""
    docs = load_documents(spark, sf_dir)
    graph = build_graph(docs, cfg)
    t = explode_triples(graph)
    return t.select(
        "doc_key",
        F.col("head_idx").cast("int").alias("head_idx"),
        F.col("tail_idx").cast("int").alias("tail_idx"),
        "rel_type", "head_type", "tail_type",
        F.round("score", 6).alias("score"),
        "head_key", "tail_key")
