"""T3: every SQL-expressible query must match its DuckDB oracle at
sf0.01 — row count, column names, and order-insensitive values —
mimicking the driver's CORRECTNESS check.  Rows-only queries are
smoke-checked for rows >= 0 and stable schema.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb(sf001):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf001}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, ddb, sf001, name):
    sdf = ALL[name](spark, sf001)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(ORACLE[name])
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: columns differ spark={scols} duckdb={dcols}")
    assert len(srows) == len(drows), (
        f"{name}: rowcount spark={len(srows)} duckdb={len(drows)}")
    a, b = _rowset(srows, scols), _rowset(drows, dcols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, (
        f"{name}: first mismatches: "
        + "; ".join(f"spark={a[i]} duck={b[i]}" for i in mism))


def test_rows_only_smoke(spark, sf001):
    """As of round 5 every query carries an oracle (the ANN queries
    are golden-backed), so the rows-only set is EMPTY; this guard
    self-activates if a future rows-only query is added."""
    for name in sorted(set(ALL) - set(ORACLE)):
        df = ALL[name](spark, sf001)
        assert df.columns
        assert df.count() >= 0


def test_golden_signature_selects_right_corpus():
    """The kg_* golden oracles pick their generation by corpus content
    signature; each sf dir must select exactly its own golden rows
    (sf0.001 and sf0.01 both have 500 docs — counts cannot
    discriminate, the signature must)."""
    from jerex_spark.operators.kg import QUERIES
    sql = dict(QUERIES)["kg_doc_stats"][1]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'/root/testdata/{sf}/documents.parquet'")
        got = con.execute(sql).fetchall()
        want = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet("
            f"'/root/repo/golden/{sf}/golden_doc_stats.parquet')"
        ).fetchone()[0]
        assert len(got) == want, (sf, len(got), want)
        con.close()
