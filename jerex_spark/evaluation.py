"""Five-layer strict evaluation (SURVEY.md §2.4 A6, §2.9 D1).

Distributed reimplementation of the reference's strict scoring
(ref jerex/evaluation/joint_evaluator.py:66-109, scoring.py:15-73):
five layers — mention, coref cluster, typed entity, relation,
relation+entity-type (rel_nec) — each scored micro P/R/F1 on exact
tuple identity, with duplicates counted once (ref scoring.py:15-23;
README.md:62).

Identity keys follow §1.4: entity ≡ sorted set of token-level mention
spans; triple ≡ (head set[, head type], tail set[, tail type], rel).
Everything is a full-outer join on the identity key + one aggregation
— no driver-side loops; the join shuffles only identity-key strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_set_key(spans_col: str):
    """Canonical string key for an array<struct<start,end>> column."""
    return F.concat_ws("|", F.transform(
        F.array_sort(spans_col),
        lambda s: F.concat_ws(":", s.start.cast("string"),
                              s.end.cast("string"))))


def micro_prf(pred: DataFrame, gt: DataFrame,
              key_cols: list[str]) -> dict:
    """Exact-identity micro P/R/F1 with dedup-once semantics (D1)."""
    p = pred.select(*key_cols).distinct().withColumn("in_pred", F.lit(1))
    g = gt.select(*key_cols).distinct().withColumn("in_gt", F.lit(1))
    j = p.join(g, key_cols, "full_outer")
    row = j.agg(
        F.sum(F.when(F.col("in_pred").isNotNull()
                     & F.col("in_gt").isNotNull(), 1).otherwise(0))
        .alias("tp"),
        F.sum(F.when(F.col("in_pred").isNotNull()
                     & F.col("in_gt").isNull(), 1).otherwise(0))
        .alias("fp"),
        F.sum(F.when(F.col("in_pred").isNull()
                     & F.col("in_gt").isNotNull(), 1).otherwise(0))
        .alias("fn"),
    ).collect()[0]
    tp, fp, fn = row.tp or 0, row.fp or 0, row.fn or 0
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": prec, "recall": rec, "f1": f1}


def evaluate_five_layers(pred_mentions: DataFrame, gt_mentions: DataFrame,
                         pred_entities: DataFrame, gt_entities: DataFrame,
                         pred_triples: DataFrame,
                         gt_triples: DataFrame) -> dict[str, dict]:
    """mentions: (doc_key, start, end); entities: (doc_key, spans, type);
    triples: (doc_key, head_key, tail_key, head_type, tail_type,
    rel_type)."""

    def ent_keys(df):
        return df.select("doc_key", span_set_key("spans").alias("k"),
                         "type")

    def trip_keys(df):
        return df.select(
            "doc_key",
            span_set_key("head_key").alias("hk"),
            span_set_key("tail_key").alias("tk"),
            "head_type", "tail_type", "rel_type")

    return {
        "mention": micro_prf(pred_mentions, gt_mentions,
                             ["doc_key", "start", "end"]),
        "coref": micro_prf(ent_keys(pred_entities),
                           ent_keys(gt_entities), ["doc_key", "k"]),
        "entity": micro_prf(ent_keys(pred_entities),
                            ent_keys(gt_entities),
                            ["doc_key", "k", "type"]),
        "relation": micro_prf(trip_keys(pred_triples),
                              trip_keys(gt_triples),
                              ["doc_key", "hk", "tk", "rel_type"]),
        "rel_nec": micro_prf(trip_keys(pred_triples),
                             trip_keys(gt_triples),
                             ["doc_key", "hk", "tk", "head_type",
                              "tail_type", "rel_type"]),
    }


def per_type_prf(pred_triples: DataFrame, gt_triples: DataFrame,
                 type_col: str = "rel_type") -> DataFrame:
    """Per-relation-type P/R/F1 + macro average row (ref
    scoring.py:63-73 per-type + macro semantics), fully distributed."""
    key = ["doc_key", "hk", "tk", "rel_type"]

    def keys(df):
        return df.select(
            "doc_key", span_set_key("head_key").alias("hk"),
            span_set_key("tail_key").alias("tk"), "rel_type").distinct()

    p = keys(pred_triples).withColumn("in_pred", F.lit(1))
    g = keys(gt_triples).withColumn("in_gt", F.lit(1))
    j = p.join(g, key, "full_outer")
    per = (j.groupBy(type_col).agg(
        F.sum(F.when(F.col("in_pred").isNotNull()
                     & F.col("in_gt").isNotNull(), 1).otherwise(0))
        .alias("tp"),
        F.sum(F.when(F.col("in_pred").isNotNull()
                     & F.col("in_gt").isNull(), 1).otherwise(0))
        .alias("fp"),
        F.sum(F.when(F.col("in_pred").isNull()
                     & F.col("in_gt").isNotNull(), 1).otherwise(0))
        .alias("fn")))
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    per = per.select(type_col, "tp", "fp", "fn",
                     F.round(prec, 6).alias("precision"),
                     F.round(rec, 6).alias("recall"))
    f1 = F.when(F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall"))).otherwise(0.0)
    return per.withColumn("f1", F.round(f1, 6))
