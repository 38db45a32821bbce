"""N5 sub-task models (ref classification_models.py:23-262): each of
the five per-task inference paths runs distributed over a gold table,
and the relation tasks reproduce the joint pipeline's scores exactly
when fed the joint pipeline's own upstream structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jerex_spark.config import DEFAULT
from jerex_spark.tasks import TASK_OUTPUT_SCHEMAS, run_task

_GOLD_SCHEMA = (
    "doc_key string, text string, "
    "mentions array<struct<start:int, end:int, sent_idx:int>>, "
    "clusters array<array<int>>, types array<string>, "
    "relations array<struct<head:int, tail:int, rel:string>>")


@pytest.fixture(scope="module")
def gold_from_pipeline(spark, sf0001):
    """Gold table = the joint pipeline's own extraction on 80 docs, so
    the sub-task models run on realistic structure."""
    from jerex_spark.pipeline import build_graph, load_documents
    g = build_graph(load_documents(spark, sf0001)
                    .filter("doc_id < 80")).persist()
    rows = []
    for r in g.collect():
        ments = [(m.start, m.end, m.sent_idx) for m in r.mentions]
        clusters = [list(e.mention_idxs) for e in r.entities]
        types = [e.type for e in r.entities]
        rels = [(t.head_idx, t.tail_idx, t.rel_type) for t in r.triples]
        rows.append((r.doc_key,
                     " ".join(m.phrase for m in r.mentions) or "x",
                     ments, clusters, types, rels))
    # keep the ORIGINAL text (needed for encoder parity): re-read it
    texts = {d.doc_key: d.text for d in
             load_documents(spark, sf0001).filter("doc_id < 80")
             .collect()}
    rows = [(k, texts[k], m, c, t, rl) for k, _, m, c, t, rl in rows]
    df = spark.createDataFrame(rows, _GOLD_SCHEMA).persist()
    df.count()
    yield df, g
    df.unpersist()
    g.unpersist()


def test_all_tasks_run_and_are_deterministic(spark, gold_from_pipeline):
    gold, _ = gold_from_pipeline
    for task in TASK_OUTPUT_SCHEMAS:
        a = sorted(map(tuple, run_task(gold, task).collect()))
        assert a, task
        b = sorted(map(tuple, run_task(gold, task).collect()))
        assert a == b, task


def test_rel_mi_task_matches_joint_pipeline(spark, gold_from_pipeline):
    """Feeding the joint pipeline's own mentions/clusters/types into
    the standalone MI relation model must reproduce the joint triples:
    identity set EXACT, scores to 1e-4 (the batched multi-doc matmul
    and the per-doc task matmul differ by ~1ulp under BLAS blocking;
    since F7 faithfully dropped its relu — ref has none — the pooled
    values no longer floor at 0, so the 1ulp shows in the 5th
    decimal)."""
    gold, g = gold_from_pipeline
    task = {(r.doc_key, r.head, r.tail, r.rel_type): r.score
            for r in run_task(
                gold, "relation_classification_multi_instance").collect()}
    joint = {}
    for r in g.select("doc_key", F.explode("triples").alias("t")).collect():
        joint[(r.doc_key, r.t.head_idx, r.t.tail_idx, r.t.rel_type)] = \
            r.t.score
    assert set(task) == set(joint)
    assert max(abs(task[k] - joint[k]) for k in task) < 1e-4


def test_rel_global_task_matches_joint_global(spark, gold_from_pipeline):
    """Same equivalence for the global variant — but gold types here
    are the MI pipeline's F4 types, which the joint_global run also
    predicts via F4 on identical entity reprs, so triples agree."""
    from jerex_spark.config import GLOBAL
    gold, _ = gold_from_pipeline
    task = {(r.doc_key, r.head, r.tail, r.rel_type, round(r.score, 5))
            for r in run_task(
                gold, "relation_classification_global", GLOBAL).collect()}
    from jerex_spark.pipeline import build_graph, load_documents
    gg = build_graph(load_documents(spark, "/root/testdata/sf0.001")
                     .filter("doc_id < 80"), GLOBAL)
    joint = set()
    for r in gg.select("doc_key", F.explode("triples").alias("t")).collect():
        joint.add((r.doc_key, r.t.head_idx, r.t.tail_idx, r.t.rel_type,
                   round(r.t.score, 5)))
    assert task == joint


def test_entity_task_types_match_pipeline(spark, gold_from_pipeline):
    gold, g = gold_from_pipeline
    task = {(r.doc_key, r.entity_idx, r.type)
            for r in run_task(gold, "entity_classification").collect()}
    joint = {(r.doc_key, r.e.entity_idx, r.e.type)
             for r in g.select("doc_key",
                               F.explode("entities").alias("e")).collect()}
    assert task == joint


def test_mention_task_threshold_consistent(spark, gold_from_pipeline):
    """The standalone mention model's over-threshold spans are exactly
    the joint pipeline's mentions wherever the per-doc cap didn't
    bind."""
    gold, g = gold_from_pipeline
    preds = {}
    for r in run_task(gold, "mention_localization").collect():
        if r.pred:
            preds.setdefault(r.doc_key, set()).add((r.start, r.end))
    for row in g.collect():
        got = {(m.start, m.end) for m in row.mentions}
        if len(got) < DEFAULT.max_mentions_per_doc:
            assert preds.get(row.doc_key, set()) == got, row.doc_key
