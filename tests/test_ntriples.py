"""kg_ntriples: RDF N-Triples serialization of the extracted KG.

Covers (1) the ECHAR literal-escape chain on hostile entity keys —
exact expected strings AND cross-engine equality with the DuckDB
replace chain the oracle uses; (2) the line algebra (one relation
line per triple + rdf:type/rdfs:label per distinct node); (3) the
sf0.001 cross-engine match is exercised by tests/test_oracle.py
automatically via the QUERIES registry.
"""

from __future__ import annotations

import duckdb

from jerex_spark.operators.kg import (
    _NT_BASE, _nt_escape_sql, _ntriples_lines, kg_ntriples)

SCHEMA = ("doc_key string, head_idx long, tail_idx long, "
          "rel_type string, head_type string, tail_type string, "
          "head_key string, tail_key string")

HOSTILE_KEY = 'a"b\\c\nd\te\rf'
# backslash escaped first, then quote/newline/tab/CR
HOSTILE_ESCAPED = 'a\\"b\\\\c\\nd\\te\\rf'


def _lines(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(r.line for r in _ntriples_lines(df).collect())


def test_escape_exact_and_cross_engine(spark):
    rows = [("d0", 0, 1, "works_at", "PER", "ORG", HOSTILE_KEY, "1:2")]
    lines = _lines(spark, rows)
    label_lines = [l for l in lines if "rdf-schema#label" in l]
    assert (f'<{_NT_BASE}/doc/d0/entity/0> '
            f'<http://www.w3.org/2000/01/rdf-schema#label> '
            f'"{HOSTILE_ESCAPED}" .') in label_lines
    # the oracle's replace chain must produce the identical bytes
    duck = duckdb.execute(
        "SELECT " + _nt_escape_sql("?"), [HOSTILE_KEY]).fetchone()[0]
    assert duck == HOSTILE_ESCAPED


def test_line_algebra(spark):
    # two triples sharing one node -> 2 rel + 3 nodes x 2 stmt lines
    rows = [("d0", 0, 1, "r1", "PER", "ORG", "0:1", "1:2"),
            ("d0", 1, 2, "r2", "ORG", "LOC", "1:2", "2:3")]
    lines = _lines(spark, rows)
    assert len(lines) == 2 + 3 * 2
    assert len(set(lines)) == len(lines)
    rel = [l for l in lines if f"<{_NT_BASE}/rel/" in l]
    assert rel == sorted([
        f"<{_NT_BASE}/doc/d0/entity/0> <{_NT_BASE}/rel/r1> "
        f"<{_NT_BASE}/doc/d0/entity/1> .",
        f"<{_NT_BASE}/doc/d0/entity/1> <{_NT_BASE}/rel/r2> "
        f"<{_NT_BASE}/doc/d0/entity/2> .",
    ])
    # every line is a syntactically plausible N-Triples statement
    for l in lines:
        assert l.startswith("<") and l.endswith(" .")


def test_node_dedup_across_docs(spark):
    # same idx in DIFFERENT docs stays distinct; same node twice in
    # one doc collapses
    rows = [("d0", 0, 1, "r", "PER", "ORG", "0:1", "1:2"),
            ("d1", 0, 1, "r", "PER", "ORG", "0:1", "1:2"),
            ("d0", 0, 2, "r", "PER", "LOC", "0:1", "2:3")]
    lines = _lines(spark, rows)
    typ = [l for l in lines if "rdf-syntax-ns#type" in l]
    assert len(typ) == 5  # d0:{0,1,2} + d1:{0,1}


def test_corpus_run_counts(spark, sf0001):
    df = kg_ntriples(spark, sf0001)
    lines = [r.line for r in df.collect()]
    n_rel = sum(f"<{_NT_BASE}/rel/" in l for l in lines)
    n_typ = sum("rdf-syntax-ns#type" in l for l in lines)
    n_lab = sum("rdf-schema#label" in l for l in lines)
    assert n_typ == n_lab and n_rel > 0
    assert len(lines) == n_rel + n_typ + n_lab
    assert len(set(lines)) == len(lines)
