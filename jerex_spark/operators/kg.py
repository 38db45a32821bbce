"""KG-construction queries (the flagship pipeline surface).

The extract stage embeds the frozen scorer inside a ``mapInPandas``
black box, so these are not SQL-expressible — the driver records a
rows-only check, while tests/test_parity.py holds the real correctness
gate (exact triple parity vs the plain-Python reference executor).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..config import DEFAULT, GLOBAL
from ..pipeline import build_graph, flagship_triples, kg_tables, \
    load_documents


def kg_triples(spark, sf_dir):
    return flagship_triples(spark, sf_dir, DEFAULT)


def kg_triples_global(spark, sf_dir):
    """F6/F9 'joint_global' model variant (ref jerex/models/__init__.py:
    9-20, joint_models.py:246-318) — same pipeline, global relation
    head instead of multi-instance."""
    return flagship_triples(spark, sf_dir, GLOBAL)


def kg_mentions(spark, sf_dir):
    graph = build_graph(load_documents(spark, sf_dir), DEFAULT)
    return kg_tables(graph)["mentions"].select(
        "doc_key", "mention_idx", "sent_idx", "start", "end",
        "sub_start", "sub_end", "phrase", F.round("score", 6).alias("score"))


def kg_entities(spark, sf_dir):
    graph = build_graph(load_documents(spark, sf_dir), DEFAULT)
    e = kg_tables(graph)["entities"]
    return e.select(
        "doc_key", "entity_idx", "type",
        F.round("type_score", 6).alias("type_score"),
        F.size("mention_idxs").alias("n_mentions"),
        # canonical identity key: sorted mention span set
        # (ref jerex/evaluation/conversion.py:4-10)
        F.concat_ws("|", F.transform(
            "spans", lambda s: F.concat_ws(":", s.start, s.end)))
        .alias("identity_key"))


def kg_doc_stats(spark, sf_dir):
    """Per-doc pipeline statistics (mentions/entities/triples emitted,
    cap-truncation flags — SURVEY.md §7.3 item 4: never silent)."""
    graph = build_graph(load_documents(spark, sf_dir), DEFAULT)
    return graph.select(
        "doc_key", "n_tokens", "n_spans",
        F.size("mentions").alias("n_mentions"),
        F.size("entities").alias("n_entities"),
        F.size("triples").alias("n_triples"),
        F.col("truncated.spans").alias("spans_capped"),
        F.col("truncated.mentions").alias("mentions_capped"),
        F.col("truncated.pairs").alias("pairs_capped"))


def kg_token_stats(spark, sf_dir):
    """Token/span counts from INSIDE the extract UDF — oracle-checked
    against the SQL closed form, so the mapInPandas tokenization path
    itself is cross-engine verified (the driver's only view into the
    UDF black box)."""
    graph = build_graph(load_documents(spark, sf_dir), DEFAULT)
    return graph.select("doc_key",
                        F.col("n_tokens").cast("long").alias("n_tokens"),
                        F.col("n_spans").cast("long").alias("n_spans"))


# SENTENCE-AWARE closed form for the span count: the tokenizer splits
# sentences at whitespace preceded by [.!?] (tokenization.py
# split_sentences), so token-level a sentence break occurs after every
# token ending in [.!?]; per-sentence span count is the size-1..S
# closed form, summed per doc and capped at max_spans_per_doc.  DuckDB
# has no lookbehind regex, so sentence ids come from a running sum of
# end-of-sentence flags instead of a regex split.  On a corpus without
# punctuation this degenerates to the whole-doc formula; on a
# multi-sentence corpus it cross-checks P1's intra-sentence restriction
# (ref sampling_common.py:85-96) against the mapInPandas tokenizer —
# exercised in tests/test_oracle_sentences.py.
KG_TOKEN_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_key, generate_subscripts(l, 1) AS i, unnest(l) AS t
  FROM (SELECT source || '/' || doc_id AS doc_key,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS l
        FROM documents)),
s AS (
  SELECT doc_key, i,
         COALESCE(SUM(CASE WHEN regexp_matches(t, '[.!?]$')
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_key ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS sent_id
  FROM tok),
slen AS (
  SELECT doc_key, sent_id, COUNT(*) AS n
  FROM s GROUP BY doc_key, sent_id),
agg AS (
  SELECT doc_key, SUM(n) AS n_tokens,
         SUM(least({DEFAULT.max_span_size}, n) * (n + 1)
             - least({DEFAULT.max_span_size}, n)
               * (least({DEFAULT.max_span_size}, n) + 1) // 2) AS raw
  FROM slen GROUP BY doc_key)
SELECT doc_key, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(least(raw, {DEFAULT.max_spans_per_doc}) AS BIGINT) AS n_spans
FROM agg
"""


QUERIES = {
    "kg_triples": (kg_triples, None),
    "kg_triples_global": (kg_triples_global, None),
    "kg_mentions": (kg_mentions, None),
    "kg_entities": (kg_entities, None),
    "kg_doc_stats": (kg_doc_stats, None),
    "kg_token_stats": (kg_token_stats, KG_TOKEN_STATS_SQL),
}
