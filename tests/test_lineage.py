"""T4: kill-and-restart resumability with per-partition lineage.

A checkpointed stage is interrupted after a subset of bucket-groups
(the kill), restarted, and must (a) skip finished groups, (b) finish
the rest, (c) produce a final output identical to a single-shot run,
(d) leave a complete lineage manifest with metrics.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from jerex_spark.lineage import CheckpointedStage


def _stage_fn(df):
    return df.select("doc_key", F.length("text").alias("n_chars"))


def _input(spark):
    rows = [(f"src/{i}", "x" * (i % 17 + 1)) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_key", "text"])


def test_kill_restart_resume(spark, tmp_path):
    out = str(tmp_path / "stage1")
    df = _input(spark)
    st = CheckpointedStage("s1", out, n_buckets=16, group_size=4)

    # first run "killed" after 2 of 4 groups
    st.run(df, _stage_fn, max_groups=2)
    assert not st.is_complete(df)
    m1 = st.metrics()
    assert len(m1) == 2 and all(e["status"] == "done" for e in m1)

    # restart: finishes the remaining groups only
    st.run(df, _stage_fn)
    assert st.is_complete(df)
    m2 = st.metrics()
    assert len(m2) == 4
    assert {e["group"] for e in m2} == {0, 1, 2, 3}
    assert all(e["wall_ms"] >= 0 and e["rows_in"] > 0 for e in m2)
    assert sum(e["rows_in"] for e in m2) == 200

    # third run is a no-op (idempotent)
    st.run(df, _stage_fn)
    assert len(st.metrics()) == 4

    # output identical to a single-shot run
    got = {(r.doc_key, r.n_chars)
           for r in st.read_output(spark).select("doc_key",
                                                 "n_chars").collect()}
    want = {(r.doc_key, r.n_chars) for r in _stage_fn(df).collect()}
    assert got == want


def test_fingerprint_invalidation(spark, tmp_path):
    out = str(tmp_path / "stage2")
    st = CheckpointedStage("s2", out, n_buckets=8, group_size=4)
    df1 = _input(spark)
    st.run(df1, _stage_fn)
    assert st.is_complete(df1)
    # changed input -> fingerprints differ -> stage not complete
    df2 = df1.withColumn("text", F.concat(F.col("text"), F.lit("!")))
    assert not st.is_complete(df2)
    st.run(df2, _stage_fn)
    assert st.is_complete(df2)
    # manifest keeps full lineage history (old + new fingerprints)
    with open(os.path.join(out, "_manifest.jsonl")) as f:
        entries = [json.loads(x) for x in f]
    assert len(entries) == 4
    assert len({e["input_fingerprint"] for e in entries}) == 4


def test_schema_change_refuses_resume(spark, tmp_path):
    """Resuming a stage whose output schema changed must fail fast:
    appending new-schema groups beside old-schema parquet yields
    mixed-schema output (column null or missing depending on which
    footer the reader samples)."""
    out = str(tmp_path / "stage3")
    st = CheckpointedStage("s3", out, n_buckets=8, group_size=4)
    df = _input(spark)
    st.run(df, _stage_fn, max_groups=1)

    def changed(d):
        return d.select(
            "doc_key", F.length("text").cast("string").alias("n_chars"))

    with pytest.raises(RuntimeError, match="schema changed"):
        st.run(df, changed)
    # unchanged schema resumes normally
    st.run(df, _stage_fn)
    assert st.is_complete(df)
    assert all(e["schema_fp"] for e in st.metrics())


def test_manifest_carries_capped_counts(spark, tmp_path):
    """When the checkpointed stage is the extract, each manifest line
    (and the stage rollup) reports how many docs each cap truncated —
    a 100x run surfaces truncation without a separate output scan."""
    from jerex_spark.extract import extract_graph
    out = str(tmp_path / "capped_stage")
    long_doc = " ".join(f"tok{i}" for i in range(3000)) + "."
    rows = [(f"d/{i}", f"doc {i} alpha beta gamma.") for i in range(12)]
    rows.append(("d/long", long_doc))          # trips the 4096-span cap
    df = spark.createDataFrame(rows, "doc_key string, text string")
    st = CheckpointedStage("cap1", out, n_buckets=4, group_size=2)
    st.run(df, extract_graph)
    entries = st.metrics()
    assert all("capped" in e for e in entries)
    assert set(entries[0]["capped"]) == {"spans", "mentions", "pairs"}
    total = st.throughput_summary()["capped"]
    assert total["spans"] == 1                 # exactly the long doc
    # stages without a truncated column don't grow the field
    st2 = CheckpointedStage("cap2", str(tmp_path / "plain"), n_buckets=4,
                            group_size=2)
    st2.run(df, _stage_fn)
    assert all("capped" not in e for e in st2.metrics())
    assert "capped" not in st2.throughput_summary()
