"""T2 parity: the Spark pipeline must reproduce the plain-Python
reference executor's triples with P/R >= 0.95 (target 1.0 — both sides
are deterministic and share the frozen weight artifact).

Identity keys follow the reference's eval semantics
(ref jerex/evaluation/conversion.py:4-17,64-79): entity ≡ set of
token-level mention spans; triple ≡ (head span set, head type,
tail span set, tail type, rel type).  See SURVEY.md §1.4.
"""

from __future__ import annotations

import duckdb
import pytest

from jerex_spark.pipeline import flagship_triples, kg_tables, build_graph, \
    load_documents
from jerex_spark.reference_executor import run_document, triple_identity

N_DOCS = 200


@pytest.fixture(scope="module")
def golden(sf0001):
    rows = duckdb.sql(
        f"select source || '/' || doc_id as doc_key, text "
        f"from '{sf0001}/documents.parquet' order by doc_id "
        f"limit {N_DOCS}").fetchall()
    return {k: run_document(k, t) for k, t in rows}


@pytest.fixture(scope="module")
def spark_graph(spark, sf0001, golden):
    docs = load_documents(spark, sf0001).filter(
        f"doc_id < {N_DOCS}")
    g = build_graph(docs).persist()
    g.count()
    yield g
    g.unpersist()


def _golden_triple_set(golden):
    out = set()
    for k, res in golden.items():
        for t in res.triples:
            out.add(triple_identity(k, t))
    return out


def test_triple_parity(spark_graph, golden):
    spark_set = set()
    for r in kg_tables(spark_graph)["triples"].collect():
        spark_set.add((
            r.doc_key,
            tuple((s.start, s.end) for s in r.head_key), r.head_type,
            tuple((s.start, s.end) for s in r.tail_key), r.tail_type,
            r.rel_type))
    gold = _golden_triple_set(golden)
    assert gold, "reference executor produced no triples — fixture broken"
    tp = len(spark_set & gold)
    precision = tp / max(1, len(spark_set))
    recall = tp / max(1, len(gold))
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.3f} R={recall:.3f} "
        f"spark={len(spark_set)} gold={len(gold)}")
    # both sides deterministic + shared scorer: expect exact match
    assert spark_set == gold


def test_mention_parity(spark_graph, golden):
    spark_m = {(r.doc_key, r.start, r.end)
               for r in kg_tables(spark_graph)["mentions"].collect()}
    gold_m = {(k, m["start"], m["end"])
              for k, res in golden.items() for m in res.mentions}
    assert spark_m == gold_m


def test_entity_parity(spark_graph, golden):
    spark_e = {(r.doc_key, tuple((s.start, s.end) for s in r.spans), r.type)
               for r in kg_tables(spark_graph)["entities"].collect()}
    gold_e = {(k, tuple(map(tuple, e["mentions"])), e["type"])
              for k, res in golden.items() for e in res.entities}
    assert spark_e == gold_e


def test_scores_match(spark_graph, golden):
    """fp32 shared-math check: per-triple scores equal to 1e-4 (batched
    BLAS vs per-doc BLAS may differ in the last ulps)."""
    gold_scores = {}
    for k, res in golden.items():
        for t in res.triples:
            gold_scores[triple_identity(k, t)] = t["score"]
    for r in kg_tables(spark_graph)["triples"].collect():
        key = (r.doc_key,
               tuple((s.start, s.end) for s in r.head_key), r.head_type,
               tuple((s.start, s.end) for s in r.tail_key), r.tail_type,
               r.rel_type)
        assert abs(gold_scores[key] - r.score) < 1e-4


def test_flagship_runs(spark, sf0001):
    df = flagship_triples(spark, sf0001)
    assert df.count() > 0


def test_triple_parity_global_variant(spark, sf0001):
    """F6/F9: the 'joint_global' model variant (ref jerex/models/
    __init__.py:9-20, joint_models.py:246-318) — exact triple parity
    between the Spark pipeline and the reference executor, both under
    relation_mode='global'."""
    from jerex_spark.config import GLOBAL

    n = 120
    rows = duckdb.sql(
        f"select source || '/' || doc_id as doc_key, text "
        f"from '{sf0001}/documents.parquet' order by doc_id "
        f"limit {n}").fetchall()
    gold = set()
    for k, t in rows:
        for tr in run_document(k, t, GLOBAL).triples:
            gold.add(triple_identity(k, tr))
    assert gold, "global head emitted no triples — recalibrate relg_b"

    docs = load_documents(spark, sf0001).filter(f"doc_id < {n}")
    spark_set = set()
    for r in kg_tables(build_graph(docs, GLOBAL))["triples"].collect():
        spark_set.add((
            r.doc_key,
            tuple((s.start, s.end) for s in r.head_key), r.head_type,
            tuple((s.start, s.end) for s in r.tail_key), r.tail_type,
            r.rel_type))
    assert spark_set == gold
