"""Graph materialization: canonical triples / entities / edges tables.

Final stage of the KG pipeline (SURVEY.md §7.1 step 6): join the
per-document triples to canonicalized entities, deduplicate across the
corpus, and produce the three output tables a KG consumer reads:

* ``entities``  — one row per canonical entity with surface stats
* ``triples``   — deduplicated (subj, pred, obj) with provenance counts
* ``edges``     — adjacency projection (subj, obj, weight)

Dedup keys follow the reference's eval identity (within-doc: mention
span set — ref jerex/evaluation/conversion.py:4-17; across docs:
canonical id).  All aggregations are partial-agg friendly; the only
shuffles are the two groupBys on canonical keys, which AQE skew-splits
(hot entities like countries are real at web scale).  Writes are
partitioned by ``rel_type`` (low cardinality, stable) so consumers
prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_phrases(mentions: DataFrame, entities: DataFrame) -> DataFrame:
    """entities + representative phrase (first mention's phrase — the
    reference picks the first mention's type/phrase for the cluster,
    ref datasets.py:126-127)."""
    first_m = F.col("mention_idxs")[0]
    e = entities.select("doc_key", "entity_idx", "type",
                        first_m.alias("first_mention"))
    m = mentions.select("doc_key",
                        F.col("mention_idx").alias("first_mention"),
                        "phrase")
    return e.join(m, ["doc_key", "first_mention"]).drop("first_mention")


def canonical_triples(triples: DataFrame,
                      canon_entities: DataFrame) -> DataFrame:
    """Join per-doc triples to canonical ids and dedup corpus-wide.

    canon_entities: (doc_key, entity_idx, canonical_id, type, phrase).
    """
    h = canon_entities.select(
        "doc_key", F.col("entity_idx").alias("head_idx"),
        F.col("canonical_id").alias("subj_id"),
        F.col("phrase").alias("subj_phrase"),
        F.col("type").alias("subj_type"))
    t = canon_entities.select(
        "doc_key", F.col("entity_idx").alias("tail_idx"),
        F.col("canonical_id").alias("obj_id"),
        F.col("phrase").alias("obj_phrase"),
        F.col("type").alias("obj_type"))
    joined = (triples.join(h, ["doc_key", "head_idx"])
              .join(t, ["doc_key", "tail_idx"]))
    return (joined.groupBy("subj_id", "rel_type", "obj_id")
            .agg(F.count("*").alias("n_evidence"),
                 F.min("subj_phrase").alias("subj_phrase"),
                 F.min("obj_phrase").alias("obj_phrase"),
                 F.min("subj_type").alias("subj_type"),
                 F.min("obj_type").alias("obj_type"),
                 F.max("score").alias("max_score"),
                 F.countDistinct("doc_key").alias("n_docs")))


def salted_two_phase(df: DataFrame, keys: list[str], partials: list,
                     finals: list, n_salt: int = 64) -> DataFrame:
    """Two-phase aggregation with an explicit salt for skewed keys
    (north rule: hot canonical entities — countries, famous people —
    concentrate a naive groupBy into one reducer).  Phase 1 groups by
    (keys, salt) so a hot key spreads over ``n_salt`` reducers; phase 2
    merges the per-salt partials.  The salt is a deterministic hash of
    all columns, so re-runs are stable.

    ``partials``: aggregate columns for phase 1 (aliased);
    ``finals``: merge expressions over those aliases for phase 2.
    """
    all_cols = [F.col(c) for c in df.columns]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*all_cols), F.lit(n_salt)))
    p1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return p1.groupBy(*keys).agg(*finals)


def canonical_entity_table(canon_entities: DataFrame,
                           n_salt: int = 64) -> DataFrame:
    """Per-canonical-entity rollup via salted two-phase aggregation
    (countDistinct realized as a distinct-set union merge)."""
    return salted_two_phase(
        canon_entities.select("canonical_id", "type", "doc_key", "phrase"),
        keys=["canonical_id"],
        partials=[
            F.min("type").alias("_type"),
            F.collect_set("doc_key").alias("_docs"),
            F.count("*").alias("_n"),
            F.collect_set("phrase").alias("_surfaces"),
        ],
        finals=[
            F.min("_type").alias("type"),
            F.size(F.array_distinct(F.flatten(F.collect_list("_docs"))))
            .alias("n_docs"),
            F.sum("_n").alias("n_clusters"),
            F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("_surfaces")))).alias("surfaces"),
        ],
        n_salt=n_salt)


def edges(canon_triples: DataFrame) -> DataFrame:
    return (canon_triples.groupBy("subj_id", "obj_id")
            .agg(F.sum("n_evidence").alias("weight"),
                 F.array_sort(F.collect_set("rel_type")).alias("rel_types")))


def export_predictions_json(graph: DataFrame, path: str) -> None:
    """S7: per-document predictions export (mentions, entity clusters
    as mention-idx lists + type, relations) — the shape of the
    reference's predictions.json sink
    (ref jerex/evaluation/joint_evaluator.py:111-135), written as
    distributed JSON lines instead of a rank-0 spool."""
    (graph.select("doc_key", "mentions",
                  F.transform("entities", lambda e: F.struct(
                      e.mention_idxs.alias("mentions"),
                      e.type.alias("type"))).alias("entities"),
                  F.transform("triples", lambda t: F.struct(
                      t.head_idx.alias("head"),
                      t.tail_idx.alias("tail"),
                      t.rel_type.alias("type"))).alias("relations"))
     .write.mode("overwrite").json(path))


def export_examples_html(graph: DataFrame, path: str,
                         limit: int = 25) -> None:
    """S8: small sampled HTML visualization of extractions (the shape
    of the reference's examples.html sink, ref joint_evaluator.py:
    137-180) — a debug artifact rendered from a bounded sample, never
    on the scale path.  No template engine: plain string rendering."""
    import html as _html
    rows = (graph.filter(F.size("triples") > 0)
            .select("doc_key", "mentions", "entities", "triples")
            .limit(limit).collect())
    parts = ["<html><head><meta charset='utf-8'>"
             "<title>extraction examples</title></head><body>"]
    for r in rows:
        parts.append(f"<h3>{_html.escape(r.doc_key)}</h3><ul>")
        ments = {m.mention_idx: m for m in r.mentions}
        for e in r.entities:
            surf = ", ".join(_html.escape(ments[i].phrase)
                             for i in e.mention_idxs)
            parts.append(
                f"<li>E{e.entity_idx} <b>{e.type}</b>: {surf}</li>")
        for t in r.triples:
            parts.append(
                f"<li>(E{t.head_idx}) -[{_html.escape(t.rel_type)}"
                f" {t.score:.2f}]-> (E{t.tail_idx})</li>")
        parts.append("</ul>")
    parts.append("</body></html>")
    with open(path, "w") as f:
        f.write("\n".join(parts))


def write_graph(out_dir: str, canon_triples: DataFrame,
                canon_ents: DataFrame, edge_df: DataFrame) -> None:
    (canon_triples.repartition("rel_type")
     .write.mode("overwrite").partitionBy("rel_type")
     .parquet(f"{out_dir}/triples"))
    canon_ents.write.mode("overwrite").parquet(f"{out_dir}/entities")
    edge_df.write.mode("overwrite").parquet(f"{out_dir}/edges")
