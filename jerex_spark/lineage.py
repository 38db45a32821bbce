"""Per-partition checkpointing with lineage + metrics (north rule).

A checkpointed stage splits its input into ``n_buckets`` deterministic
buckets (``xxhash64(doc_key) % n_buckets``), processes bucket-groups as
separate Spark jobs, and appends one manifest line per bucket-group:

    {stage, group, buckets, input_fingerprint, rows_in, rows_out,
     wall_ms, status, finished_at}

Restarting the same stage anti-joins the done-manifest: finished groups
(matching input fingerprint) are skipped, unfinished ones re-run; the
output directory is append-only parquet partitioned by group, so a
re-run of a crashed group overwrites only its own partition
(idempotent, exactly-once per group).

At cluster scale the manifest would live in Iceberg snapshot metadata;
locally it is a JSONL file written via atomic rename.  The bucket
fingerprint is an order-insensitive sum of xxhash64(doc_key) — any
change to a bucket's membership invalidates only that bucket's groups.

This replaces the reference's pickle spool + rank-0 merge
(ref jerex/model.py:174-186,242-257 — SURVEY.md §2.1 S9) with a
shuffle-free, restartable layout.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedStage:
    def __init__(self, name: str, out_dir: str, n_buckets: int = 16,
                 group_size: int = 4):
        self.name = name
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.group_size = group_size
        self.data_dir = os.path.join(out_dir, "data")
        self.manifest_path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(self.data_dir, exist_ok=True)

    # --- manifest ---------------------------------------------------
    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append_manifest(self, entry: dict) -> None:
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        lines = self._read_manifest() + [entry]
        with open(tmp, "w") as f:
            for e in lines:
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, self.manifest_path)   # atomic

    def done_groups(self, fingerprints: dict[int, str]) -> set[int]:
        done = set()
        for e in self._read_manifest():
            if (e["stage"] == self.name and e["status"] == "done"
                    and e["input_fingerprint"]
                    == fingerprints.get(e["group"])):
                done.add(e["group"])
        return done

    # --- execution --------------------------------------------------
    def _bucketed(self, df: DataFrame, key: str) -> DataFrame:
        b = F.pmod(F.xxhash64(F.col(key)), F.lit(self.n_buckets))
        return df.withColumn("_bucket", b).withColumn(
            "_group", (F.col("_bucket") / self.group_size).cast("int"))

    def _fingerprints(self, bucketed: DataFrame, key: str) -> dict[int, str]:
        content_cols = [F.col(c) for c in bucketed.columns
                        if not c.startswith("_")]
        rows = (bucketed.groupBy("_group")
                .agg(F.sum(F.xxhash64(*content_cols).cast("decimal(38,0)"))
                     .alias("fp"),
                     F.count("*").alias("n"))
                .collect())
        return {r["_group"]: f"{r['fp']}:{r['n']}" for r in rows}

    def run(self, df: DataFrame, stage_fn, key: str = "doc_key",
            max_groups: int | None = None) -> None:
        """Process all (or the first ``max_groups`` — for kill tests)
        not-yet-done groups.  ``stage_fn(group_df) -> DataFrame``."""
        bucketed = self._bucketed(df, key).persist()
        try:
            fps = self._fingerprints(bucketed, key)
            done = self.done_groups(fps)
            todo = sorted(set(fps) - done)
            if max_groups is not None:
                todo = todo[:max_groups]
            schema_fp: str | None = None
            for g in todo:
                t0 = time.time()
                part = bucketed.filter(F.col("_group") == g)
                rows_in = part.count()
                out = stage_fn(part.drop("_bucket", "_group"))
                if schema_fp is None:
                    schema_fp = self._check_schema(out)
                gdir = os.path.join(self.data_dir, f"group={g}")
                if os.path.exists(gdir):     # crashed attempt: redo cleanly
                    shutil.rmtree(gdir)
                out.write.mode("overwrite").parquet(gdir)
                written = out.sparkSession.read.parquet(gdir)
                rows_out, capped = self._written_stats(written)
                entry = {
                    "stage": self.name, "group": g,
                    "buckets": list(range(g * self.group_size,
                                          (g + 1) * self.group_size)),
                    "input_fingerprint": fps[g],
                    "rows_in": rows_in, "rows_out": rows_out,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "schema_fp": schema_fp,
                    "status": "done",
                    "finished_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                }
                if capped is not None:
                    entry["capped"] = capped
                self._append_manifest(entry)
        finally:
            bucketed.unpersist()

    def _check_schema(self, out: DataFrame) -> str:
        """Fingerprint the stage's output schema and refuse to resume
        over groups checkpointed under a DIFFERENT schema: appending
        new-schema parquet next to old-schema groups yields mixed-schema
        output where the changed column reads as null or missing
        depending on which footer the reader samples.  The operator
        must clear ``out_dir`` (or migrate the old groups) after a
        schema change.  Pre-fingerprint manifests (no ``schema_fp``)
        are accepted as unknown — they cannot be distinguished."""
        fp = hashlib.md5(out.schema.json().encode()).hexdigest()[:16]
        prior = {e.get("schema_fp") for e in self._read_manifest()
                 if e["stage"] == self.name and e["status"] == "done"}
        prior.discard(None)
        if prior and prior != {fp}:
            raise RuntimeError(
                f"stage '{self.name}': output schema changed since "
                f"checkpointed groups were written (manifest fingerprint"
                f" {sorted(prior)} != current {fp}); resuming would mix "
                f"schemas in {self.data_dir} — clear the output dir or "
                f"migrate the existing groups first")
        return fp

    @staticmethod
    def _written_stats(df: DataFrame) -> tuple[int, dict | None]:
        """(row count, cap-truncation counts) of a written group in ONE
        aggregation scan.  Truncation counts are present when the stage
        output carries the extract's ``truncated`` flag struct
        (SURVEY.md §7.3 item 4: caps are logged, never silent);
        folding them into the same agg as the row count means each
        group's manifest entry costs exactly one pass over the group
        output — at 100x scale a second per-group scan would double
        the checkpoint I/O."""
        from pyspark.sql.types import BooleanType, StructType
        flags: list[str] = []
        if "truncated" in df.columns:
            t = df.schema["truncated"].dataType
            if isinstance(t, StructType):
                flags = [f.name for f in t.fields
                         if isinstance(f.dataType, BooleanType)]
        row = df.agg(
            F.count(F.lit(1)).alias("_rows"),
            *[F.sum(F.col(f"truncated.{f}").cast("int")).alias(f)
              for f in flags]).collect()[0]
        capped = ({f: int(row[f] or 0) for f in flags} if flags else None)
        return int(row["_rows"]), capped

    def is_complete(self, df: DataFrame, key: str = "doc_key") -> bool:
        bucketed = self._bucketed(df, key)
        fps = self._fingerprints(bucketed, key)
        return set(fps) <= self.done_groups(fps)

    def read_output(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.data_dir)

    def metrics(self) -> list[dict]:
        return [e for e in self._read_manifest()
                if e["stage"] == self.name]

    def throughput_summary(self) -> dict:
        """Stage-level rollup of the per-group manifest metrics — the
        operator's throughput record for the run log."""
        ms = self.metrics()
        wall_s = sum(e["wall_ms"] for e in ms) / 1000.0
        rows_in = sum(e["rows_in"] for e in ms)
        out = {
            "stage": self.name,
            "groups_done": len(ms),
            "rows_in": rows_in,
            "rows_out": sum(e["rows_out"] for e in ms),
            "wall_s": round(wall_s, 2),
            "rows_per_sec": round(rows_in / wall_s, 1) if wall_s else 0.0,
        }
        capped: dict[str, int] = {}
        for e in ms:
            for k, v in (e.get("capped") or {}).items():
                capped[k] = capped.get(k, 0) + v
        if capped:
            out["capped"] = capped
        return out
