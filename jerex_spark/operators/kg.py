"""KG-construction queries (the flagship pipeline surface).

The extract stage embeds the frozen scorer inside a ``mapInPandas``
black box, so no closed-form SQL can reproduce it.  The DuckDB oracle
for these queries is instead the *golden tables* materialized by
scripts/make_golden.py from the plain-Python reference executor — an
independent implementation of the same semantics (ref
jerex/models/joint_models.py:202-244, jerex/evaluation/conversion.py:
20-98) — selected by a corpus content signature so the right rows
match whatever sf dir the harness runs at.  Projections here carry
identity/discrete columns only; continuous scores differ between
batched and per-doc BLAS in the last ulps and stay gated by
tests/test_parity.py::test_scores_match (1e-4) instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..config import DEFAULT, GLOBAL
from ..pipeline import build_graph, flagship_triples, kg_tables, \
    load_documents
# corpus-signature expression + SQL builder live in golden.py, shared
# with scripts/make_golden.py so the freeze side and the check side
# can never drift apart
from .golden import golden_doc_sql as _golden_sql


def _triples_identity(t):
    """Identity-key projection of the flat triples table (drop the
    fp score column; see module docstring)."""
    return t.select(
        "doc_key",
        F.col("head_idx").cast("long").alias("head_idx"),
        F.col("tail_idx").cast("long").alias("tail_idx"),
        "rel_type", "head_type", "tail_type", "head_key", "tail_key")


def kg_triples(spark, sf_dir):
    return _triples_identity(flagship_triples(spark, sf_dir, DEFAULT))


def kg_triples_global(spark, sf_dir):
    """F6/F9 'joint_global' model variant (ref jerex/models/__init__.py:
    9-20, joint_models.py:246-318) — same pipeline, global relation
    head instead of multi-instance."""
    return _triples_identity(flagship_triples(spark, sf_dir, GLOBAL))


def kg_mentions(spark, sf_dir):
    graph = build_graph(load_documents(spark, sf_dir), DEFAULT)
    m = kg_tables(graph)["mentions"]
    return m.select(
        "doc_key",
        *[F.col(c).cast("long").alias(c)
          for c in ("mention_idx", "sent_idx", "start", "end",
                    "sub_start", "sub_end")],
        "phrase")


def kg_entities(spark, sf_dir):
    graph = build_graph(load_documents(spark, sf_dir), DEFAULT)
    e = kg_tables(graph)["entities"]
    return e.select(
        "doc_key",
        F.col("entity_idx").cast("long").alias("entity_idx"),
        "type",
        F.size("mention_idxs").cast("long").alias("n_mentions"),
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
        "doc_key",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.size("mentions").cast("long").alias("n_mentions"),
        F.size("entities").cast("long").alias("n_entities"),
        F.size("triples").cast("long").alias("n_triples"),
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
SELECT d.doc_key, CAST(COALESCE(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       -- COALESCE inside: DuckDB's least() IGNORES nulls, so
       -- least(NULL, cap) would be cap, not NULL
       CAST(least(COALESCE(agg.raw, 0), {DEFAULT.max_spans_per_doc})
            AS BIGINT) AS n_spans
FROM (SELECT source || '/' || doc_id AS doc_key FROM documents) d
LEFT JOIN agg ON agg.doc_key = d.doc_key
"""
# ^ LEFT JOIN back to documents: an empty/whitespace-only doc yields no
#   tok rows, but the mapInPandas side still emits its (0, 0) row.


_TRIPLE_COLS = ["doc_key", "head_idx", "tail_idx", "rel_type",
                "head_type", "tail_type", "head_key", "tail_key"]

QUERIES = {
    "kg_triples": (kg_triples, _golden_sql("triples", _TRIPLE_COLS)),
    "kg_triples_global": (kg_triples_global,
                          _golden_sql("triples_global", _TRIPLE_COLS)),
    "kg_mentions": (kg_mentions, _golden_sql("mentions", [
        "doc_key", "mention_idx", "sent_idx", "start", "end",
        "sub_start", "sub_end", "phrase"])),
    "kg_entities": (kg_entities, _golden_sql("entities", [
        "doc_key", "entity_idx", "type", "n_mentions", "identity_key"])),
    "kg_doc_stats": (kg_doc_stats, _golden_sql("doc_stats", [
        "doc_key", "n_tokens", "n_spans", "n_mentions", "n_entities",
        "n_triples", "spans_capped", "mentions_capped", "pairs_capped"])),
    "kg_token_stats": (kg_token_stats, KG_TOKEN_STATS_SQL),
}
