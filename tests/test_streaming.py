"""Structured Streaming: the extract operator is stateless, so it runs
unchanged under readStream (continuous crawl ingestion — SURVEY.md
§2.12); plus a watermarked tumbling-window aggregation over the events
shape (late-data handling a streaming rollup needs).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from jerex_spark.corpus import make_pages
from jerex_spark.extract import extract_graph


def _write_parquet_dir(spark, tmp_path, n=60):
    pdf = make_pages(n)[["url", "text"]].rename(columns={"url": "doc_key"})
    src = str(tmp_path / "pages_in")
    spark.createDataFrame(pdf).repartition(3).write.parquet(src)
    return src, pdf


def test_streaming_extract(spark, tmp_path):
    src, pdf = _write_parquet_dir(spark, tmp_path)
    stream = (spark.readStream
              .schema("doc_key string, text string")
              .option("maxFilesPerTrigger", "2")
              .parquet(src))
    graph = extract_graph(stream)
    q = (graph.select("doc_key", F.size("triples").alias("n_triples"))
         .writeStream.format("memory").queryName("stream_graph")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from stream_graph").collect()
    assert len(rows) == len(pdf)
    # streaming result == batch result, doc for doc
    batch = {r.doc_key: len(r.triples)
             for r in extract_graph(
                 spark.createDataFrame(pdf)).collect()}
    got = {r.doc_key: r.n_triples for r in rows}
    assert got == batch


def test_streaming_extract_wrapper(spark, tmp_path):
    """streaming.streaming_extract: pages stream through the sources
    layer -> doc graphs, equal to the batch result."""
    from jerex_spark.streaming import streaming_extract
    src, pdf = _write_parquet_dir(spark, tmp_path, n=30)
    q = (streaming_extract(spark, src)
         .select("doc_key", F.size("mentions").alias("n_mentions"))
         .writeStream.format("memory").queryName("stream_wrap")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_key: r.n_mentions
           for r in spark.sql("select * from stream_wrap").collect()}
    batch = {r.doc_key: len(r.mentions)
             for r in extract_graph(spark.createDataFrame(pdf)).collect()}
    assert got == batch


def test_streaming_stateful_entity_rollup(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: per-key state
    accumulates ACROSS microbatches (maxFilesPerTrigger=1 forces
    several), surfaces stay capped, counts end exact."""
    from jerex_spark.streaming import (MAX_SURFACES,
                                       streaming_entity_rollup)
    src = str(tmp_path / "canon_in")
    rows = [("QHOT" if i % 4 else f"Q{i}", f"d{i:03d}",
             f"surface_{i % 30}") for i in range(120)]
    df = spark.createDataFrame(
        rows, "canonical_id string, doc_key string, phrase string")
    # several files -> several microbatches
    df.repartition(6).write.parquet(src)
    stream = (spark.readStream
              .schema("canonical_id string, doc_key string, phrase string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (streaming_entity_rollup(stream)
         .writeStream.format("memory").queryName("ent_rollup")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # update mode: take the LAST emitted row per key
    final = spark.sql("""
        select canonical_id, n_mentions, n_batches, first_seen, surfaces
        from (select *, row_number() over (partition by canonical_id
                                           order by n_batches desc) rn
              from ent_rollup) where rn = 1""").collect()
    by_key = {r.canonical_id: r for r in final}
    hot = by_key["QHOT"]
    assert hot.n_mentions == 90                    # exact across batches
    assert hot.n_batches > 1                       # state really spanned
    assert hot.first_seen == "d001"
    assert len(hot.surfaces) == MAX_SURFACES       # capped
    assert hot.surfaces == sorted(hot.surfaces)
    assert by_key["Q0"].n_mentions == 1


def test_streaming_windowed_watermark(spark, tmp_path):
    src = str(tmp_path / "events_in")
    rows = [(i, f"2024-01-01 00:{i % 50:02d}:00", "error" if i % 3 == 0
             else "click", float(i)) for i in range(200)]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.repartition(2).write.parquet(src)

    stream = (spark.readStream
              .schema("event_id long, event_type string, value double, "
                      "ts timestamp")
              .parquet(src))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "10 minutes"), "event_type")
           .agg(F.count("*").alias("n")))
    q = (agg.writeStream.format("memory").queryName("stream_win")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "select event_type, sum(n) as n from stream_win group by 1"
    ).collect()
    want = {r.event_type: r.n for r in
            df.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {r.event_type: r.n for r in got} == want
