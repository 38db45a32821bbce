"""North-rule launch path: the pipeline runs via
``spark-submit --py-files jerex_spark.zip scripts/run_pipeline.py``
against a pages parquet, writes the canonical graph, and a second
identical invocation resumes idempotently (no group re-runs, stable
output)."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent


def _zip_pkg(path: Path) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for p in (REPO / "jerex_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pipeline_and_resume(tmp_path):
    from jerex_spark.corpus import write_pages_parquet
    pages = tmp_path / "pages.parquet"
    write_pages_parquet(str(pages), 80)
    pkg = tmp_path / "jerex_spark.zip"
    _zip_pkg(pkg)
    import pandas as pd
    alias = tmp_path / "alias.parquet"
    pd.DataFrame([("acme corp", "Q_ACME"), ("globex", "Q_GLOBEX")],
                 columns=["alias", "canonical_id"]).to_parquet(alias)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    cmd = ["spark-submit", "--master", "local[4]",
           "--py-files", str(pkg), str(REPO / "scripts/run_pipeline.py"),
           "--input", str(pages), "--output", str(out),
           "--alias", str(alias), "--checkpoint", str(ckpt),
           "--master", "local[4]"]
    r1 = subprocess.run(cmd, capture_output=True, text=True,
                        cwd=str(tmp_path), timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "canonical triples" in r1.stdout

    n1 = duckdb.sql(
        f"select count(*) from parquet_scan('{out}/triples/*/*.parquet')"
    ).fetchone()[0]
    assert n1 > 0
    manifest = [json.loads(line) for line in open(ckpt / "_manifest.jsonl")]
    assert manifest and all(m["status"] == "done" for m in manifest)

    # second run: resumes (no new manifest entries), output stable
    r2 = subprocess.run(cmd, capture_output=True, text=True,
                        cwd=str(tmp_path), timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    manifest2 = [json.loads(line) for line in open(ckpt / "_manifest.jsonl")]
    assert len(manifest2) == len(manifest)
    n2 = duckdb.sql(
        f"select count(*) from parquet_scan('{out}/triples/*/*.parquet')"
    ).fetchone()[0]
    assert n2 == n1
