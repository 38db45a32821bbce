"""Train-time sampling (N1-N4), loss reductions (A7), five-layer
evaluation (A6), predictions sink (S7), and the T5 skew smoke test."""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from jerex_spark import losses
from jerex_spark.evaluation import evaluate_five_layers, per_type_prf
from jerex_spark.sampling import (build_training_samples,
                                  sample_negative_coref_pairs,
                                  sample_negative_mentions,
                                  sample_negative_relations)


# --- N1-N4 ---------------------------------------------------------------
def test_negative_mentions_deterministic_and_disjoint():
    gold = {(0, 2), (5, 6)}
    a = sample_negative_mentions("doc1", [12], gold, neg_count=20)
    b = sample_negative_mentions("doc1", [12], gold, neg_count=20)
    assert a == b                      # seeded per-doc replay
    assert not set(a) & gold           # negatives never gold
    c = sample_negative_mentions("doc2", [12], gold, neg_count=20)
    assert a != c                      # different doc -> different draw


def test_negative_mentions_overlap_quota():
    gold = {(3, 5)}
    neg = sample_negative_mentions("d", [10], gold, neg_count=10,
                                   overlap_ratio=0.5)
    overl = [s for s in neg if s[0] < 5 and 3 < s[1]]
    assert len(neg) == 10
    assert len(overl) == 5             # exactly the overlap quota


def test_coref_pairs():
    clusters = [[0, 2, 4], [1], [3, 5]]
    pos, neg = sample_negative_coref_pairs("d", clusters, neg_count=5)
    assert set(pos) == {(0, 2), (0, 4), (2, 4), (3, 5)}
    owner = {m: i for i, c in enumerate(clusters) for m in c}
    assert all(owner[a] != owner[b] for a, b in neg)
    assert len(neg) == 5


def test_negative_relations_exclude_gold():
    neg = sample_negative_relations("d", 4, {(0, 1), (2, 3)}, neg_count=50)
    assert (0, 1) not in neg and (2, 3) not in neg
    assert len(neg) == 4 * 3 - 2       # pool smaller than quota


def test_build_training_samples_multihot():
    s = build_training_samples(
        "d", "a b c d e f g h", [(0, 1), (2, 3)], [[0], [1]],
        [(0, 1, "works_at"), (0, 1, "partner_of"), (1, 0, "based_in")])
    assert s["pos_rel_multihot"][(0, 1)] == [1, 0, 1]
    assert s["pos_rel_multihot"][(1, 0)] == [0, 1, 0]


# --- N5: per-task sample builders (ref sampling_classify.py:12-262) ------
_GOLD_SCHEMA = (
    "doc_key string, text string, "
    "mentions array<struct<start:int, end:int, sent_idx:int>>, "
    "clusters array<array<int>>, types array<string>, "
    "relations array<struct<head:int, tail:int, rel:string>>")


def _gold_df(spark):
    rows = [
        ("g/0", "alice works at acme corp in springfield",
         [(0, 1, 0), (3, 5, 0), (6, 7, 0)],
         [[0], [1], [2]], ["PER", "ORG", "LOC"],
         [(0, 1, "works_at"), (1, 2, "based_in")]),
        ("g/1", "bob and alice partner at globex",
         [(0, 1, 0), (2, 3, 0), (5, 6, 0)],
         [[0, 1], [2]], ["PER", "ORG"],
         [(0, 1, "works_at"), (0, 1, "partner_of")]),
    ]
    return spark.createDataFrame(rows, _GOLD_SCHEMA)


def test_task_samples_all_five_tasks(spark):
    from jerex_spark.sampling import _TASK_SCHEMAS, task_samples
    gold = _gold_df(spark)
    for task in _TASK_SCHEMAS:
        out = task_samples(gold, task).collect()
        assert out, task
        # seeded negatives: identical on re-run
        out2 = task_samples(gold, task).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2)), task


def test_task_samples_semantics(spark):
    from jerex_spark.sampling import task_samples
    gold = _gold_df(spark)

    m = task_samples(gold, "mention_localization").collect()
    pos = {(r.doc_key, r.start, r.end) for r in m if r.label == 1}
    assert ("g/0", 0, 1) in pos and ("g/1", 5, 6) in pos
    assert all(r.label in (0, 1) for r in m)

    c = task_samples(gold, "coreference_resolution").collect()
    d1 = [r for r in c if r.doc_key == "g/1"]
    assert {(r.m1, r.m2) for r in d1 if r.label == 1} == {(0, 1)}
    # negatives never cross-label a gold pair
    assert all((r.m1, r.m2) != (0, 1) for r in d1 if r.label == 0)

    e = task_samples(gold, "entity_classification").collect()
    assert {(r.doc_key, r.entity_idx, r.type_id) for r in e} == {
        ("g/0", 0, 0), ("g/0", 1, 1), ("g/0", 2, 2),
        ("g/1", 0, 0), ("g/1", 1, 1)}

    g = task_samples(gold, "relation_classification_global").collect()
    lab = {(r.doc_key, r.head, r.tail): list(r.labels) for r in g}
    assert lab[("g/1", 0, 1)] == [1, 0, 1]     # works_at + partner_of
    assert lab[("g/0", 1, 2)] == [0, 1, 0]     # based_in
    hit = [r for r in g if r.doc_key == "g/0" and (r.head, r.tail) == (0, 1)]
    assert hit[0].head_type_id == 0 and hit[0].tail_type_id == 1

    mi = task_samples(gold, "relation_classification_multi_instance") \
        .collect()
    # g/1 pair (0,1): head cluster {0,1} x tail {2} -> 2 mention pairs
    d = [r for r in mi if r.doc_key == "g/1" and (r.head, r.tail) == (0, 1)]
    assert {(r.m1, r.m2) for r in d} == {(0, 2), (1, 2)}
    # F10: mentions (2,3) and (5,6) -> dist = 5 - 3 + 1 = 3
    td = {(r.m1, r.m2): r.tok_dist for r in d}
    assert td[(1, 2)] == 3


def test_gold_evidence_roundtrip(spark):
    """Gold evidence sentence ids (ref datasets.py:140-159) ride
    through parse -> sampling into the relation sample tables: union
    per pair on positives, empty on negatives, and absent-field golds
    still work (evidence optional)."""
    from jerex_spark.sampling import build_training_samples, task_samples
    schema = (
        "doc_key string, text string, "
        "mentions array<struct<start:int, end:int, sent_idx:int>>, "
        "clusters array<array<int>>, types array<string>, "
        "relations array<struct<head:int, tail:int, rel:string, "
        "evidence:array<int>>>")
    rows = [("g/2", "alice works at acme. bob partners with globex.",
             [(0, 1, 0), (3, 4, 0), (5, 6, 1), (8, 9, 1)],
             [[0], [1], [2], [3]], ["PER", "ORG", "PER", "ORG"],
             [(0, 1, "works_at", [0]), (0, 1, "partner_of", [0, 1]),
              (2, 3, "works_at", [1])])]
    gold = spark.createDataFrame(rows, schema)
    for task in ("relation_classification_global",
                 "relation_classification_multi_instance"):
        out = task_samples(gold, task).collect()
        ev = {(r.head, r.tail): list(r.evidence) for r in out}
        assert ev[(0, 1)] == [0, 1]          # union of the two golds
        assert ev[(2, 3)] == [1]
        assert all(list(r.evidence) == [] for r in out
                   if sum(r.labels) == 0)    # negatives carry none
    # plain-Python builder carries the same map
    s = build_training_samples(
        "g/2", rows[0][1], [(0, 1), (3, 4), (5, 6), (8, 9)],
        [[0], [1], [2], [3]],
        [(0, 1, "works_at", [0]), (0, 1, "partner_of", [0, 1]),
         (2, 3, "works_at", [1])])
    assert s["pos_rel_evidence"] == {(0, 1): [0, 1], (2, 3): [1]}
    # evidence-free golds (3-tuples) still sample identically
    s2 = build_training_samples(
        "g/2", rows[0][1], [(0, 1), (3, 4), (5, 6), (8, 9)],
        [[0], [1], [2], [3]],
        [(0, 1, "works_at"), (0, 1, "partner_of"), (2, 3, "works_at")])
    assert s2["pos_rel_multihot"] == s["pos_rel_multihot"]
    assert s2["pos_rel_evidence"] == {(0, 1): [], (2, 3): []}


# --- A7 ------------------------------------------------------------------
def test_bce_matches_closed_form():
    logits = np.array([0.0, 2.0, -2.0], dtype=np.float32)
    targets = np.array([1.0, 1.0, 0.0], dtype=np.float32)
    want = -(math.log(0.5) + math.log(1 / (1 + math.exp(-2)))
             + math.log(1 - 1 / (1 + math.exp(2)))) / 3
    assert abs(losses.bce_with_logits(logits, targets) - want) < 1e-6


def test_bce_mask_excludes_padding():
    logits = np.array([0.0, 100.0], dtype=np.float32)
    targets = np.array([1.0, 0.0], dtype=np.float32)
    mask = np.array([1.0, 0.0], dtype=np.float32)
    assert abs(losses.bce_with_logits(logits, targets, mask)
               - (-math.log(0.5))) < 1e-6


def test_ce_and_joint_weights():
    logits = np.array([[2.0, 0.0, 0.0]], dtype=np.float32)
    idx = np.array([0])
    want = -math.log(math.exp(2) / (math.exp(2) + 2))
    assert abs(losses.ce_with_logits(logits, idx) - want) < 1e-6
    assert losses.joint_loss(1.0, 2.0, 4.0, 8.0) == 1 + 2 + 0.25 * 4 + 8


# --- A6 five layers -------------------------------------------------------
def _triples_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_key string, head_key array<struct<start:int,end:int>>, "
        "tail_key array<struct<start:int,end:int>>, head_type string, "
        "tail_type string, rel_type string")


def test_five_layer_eval(spark):
    m = "doc_key string, start int, end int"
    e = ("doc_key string, spans array<struct<start:int,end:int>>, "
         "type string")
    pred_m = spark.createDataFrame(
        [("d", 0, 1), ("d", 2, 3), ("d", 9, 10)], m)
    gt_m = spark.createDataFrame([("d", 0, 1), ("d", 2, 3), ("d", 4, 5)], m)
    pred_e = spark.createDataFrame(
        [("d", [(0, 1), (2, 3)], "PER"), ("d", [(9, 10)], "ORG")], e)
    gt_e = spark.createDataFrame(
        [("d", [(2, 3), (0, 1)], "PER"), ("d", [(4, 5)], "ORG")], e)
    k = [(0, 1), (2, 3)]
    pred_t = _triples_df(spark, [
        ("d", k, [(9, 10)], "PER", "ORG", "works_at"),
        ("d", k, [(9, 10)], "PER", "ORG", "works_at"),   # dup: once
    ])
    gt_t = _triples_df(spark, [
        ("d", k, [(9, 10)], "PER", "MISC", "works_at"),
        ("d", k, [(9, 10)], "PER", "MISC", "based_in"),
    ])
    r = evaluate_five_layers(pred_m, gt_m, pred_e, gt_e, pred_t, gt_t)
    assert r["mention"]["tp"] == 2 and r["mention"]["fp"] == 1 \
        and r["mention"]["fn"] == 1
    # coref: span-set identity is order-insensitive
    assert r["coref"]["tp"] == 1
    assert r["entity"]["tp"] == 1
    # relation layer ignores entity types: works_at matches (dup deduped)
    assert r["relation"]["tp"] == 1 and r["relation"]["fp"] == 0 \
        and r["relation"]["fn"] == 1
    # rel_nec adds types: tail_type ORG vs MISC -> no match
    assert r["rel_nec"]["tp"] == 0
    pt = {x.rel_type: x for x in per_type_prf(pred_t, gt_t).collect()}
    assert pt["works_at"].tp == 1 and pt["based_in"].fn == 1


# --- S7 sink --------------------------------------------------------------
def test_predictions_json_sink_golden_vs_reference(spark, tmp_path):
    """S7 golden-file parity: the distributed JSON sink must emit, per
    document, exactly the reference layout (tokens / mentions /
    entities / relations with the ref's key shapes, joint_evaluator.py
    store_predictions) — compared field-for-field against the
    independent plain-Python reference executor."""
    from jerex_spark.corpus import make_pages
    from jerex_spark.extract import extract_graph
    from jerex_spark.graph import export_predictions_json
    from jerex_spark.reference_executor import (run_document,
                                                store_predictions_ref)
    pdf = make_pages(30)[["url", "text"]].rename(columns={"url": "doc_key"})
    docs_df = spark.createDataFrame(pdf)
    g = extract_graph(docs_df)
    out = str(tmp_path / "preds")
    export_predictions_json(g, docs_df, out)
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(x) for x in fh if x.strip()]
    assert len(rows) == 30
    got = {r["doc_key"]: r for r in rows}

    texts = dict(zip(pdf["doc_key"], pdf["text"]))
    golden = store_predictions_ref(
        [run_document(k, t) for k, t in texts.items()], texts)
    assert len(golden) == 30
    for want in golden:
        have = got[want["doc_key"]]
        # json round-trips structs with keys intact; compare verbatim
        assert have["tokens"] == want["tokens"], want["doc_key"]
        assert have["mentions"] == want["mentions"], want["doc_key"]
        assert have["entities"] == want["entities"], want["doc_key"]
        assert have["relations"] == want["relations"], want["doc_key"]


# --- T5 skew smoke ----------------------------------------------------------
def test_salted_repartition_bounds_skew(spark):
    from jerex_spark.pipeline import salted_repartition
    # hot host: 80% of keys share a prefix (host/lang skew axis)
    rows = [(f"https://hot.example.io/p/{i}" if i % 5 != 4
             else f"https://cold{i}.org/p/{i}", "x") for i in range(4000)]
    df = salted_repartition(
        spark.createDataFrame(rows, ["doc_key", "text"]))
    sizes = [r.n for r in
             df.groupBy(F.spark_partition_id().alias("p"))
             .agg(F.count("*").alias("n")).collect()]
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes))


def test_cost_balanced_repartition(spark):
    from jerex_spark.pipeline import cost_balanced_repartition
    # heavy tail: a few giant docs, many small ones
    rows = [(f"d{i}", 10000 if i < 8 else 10) for i in range(800)]
    df = spark.createDataFrame(rows, ["doc_key", "cost"])
    out = cost_balanced_repartition(df, F.col("cost"), n=8)
    per = (out.groupBy(F.spark_partition_id().alias("p"))
           .agg(F.sum("cost").alias("c")).collect())
    costs = sorted(r.c for r in per)
    assert len(costs) == 8
    # every partition gets exactly one giant: near-equal cost
    assert costs[-1] <= 1.2 * costs[0]
