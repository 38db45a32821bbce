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

from ..caching import persist_tracked as _persist
from ..config import DEFAULT, GLOBAL
from ..pipeline import build_graph, flagship_triples, kg_tables, \
    load_documents
# corpus-signature expression + SQL builder live in golden.py, shared
# with scripts/make_golden.py so the freeze side and the check side
# can never drift apart
from .golden import DOC_SIG_EXPR, GOLDEN_GLOB
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


# --- graph analytics over the constructed KG -------------------------------
# The north rule's "graph materialize" output must be QUERYABLE, not
# just written: these queries consume the emitted triple table itself.
# The Spark side derives from the live flagship extract; the DuckDB
# oracle runs the SAME derivation over the frozen golden triples
# (bitwise-equal tables per the kg_triples oracle), so any exact-
# integer graph statistic must agree.  All three are per-document
# graphs keyed by (doc_key, entity_idx): every join/agg is an
# equi-join / partial-aggregable groupBy on that key, never a global
# window, so at 100 TB a document's subgraph stays on one partition's
# worth of rows and the stages scale with the triple count.
#
# The triple/edge table is PERSISTED before any fan-out: a union or
# self-join duplicates its whole subtree — including the mapInPandas
# extract, the single most expensive stage — once per branch (Spark
# has no cross-branch CSE; measured 26.6s -> extract-once after the
# persist for kg_entity_degree at sf0.1).  In a production pipeline
# these queries would read the materialized triple table, where the
# persist is the scan cache.


def _golden_triples_derived(derivation: str) -> str:
    """DuckDB oracle fragment: signature-selected golden triples as CTE
    ``tr``, followed by ``derivation`` (a SELECT over ``tr``)."""
    return f"""
WITH sig AS (SELECT {DOC_SIG_EXPR} AS s FROM documents),
tr AS (
  SELECT g.doc_key, g.head_idx, g.tail_idx, g.rel_type,
         g.head_type, g.tail_type
  FROM read_parquet('{GOLDEN_GLOB}/*/golden_triples.parquet') g
  JOIN sig ON g.corpus_sig = sig.s)
{derivation}
"""


def _undirected(t):
    """(doc_key, e, nbr, is_out) — each triple contributes one out-edge
    row for its head and one in-edge row for its tail."""
    out_ = t.select("doc_key", F.col("head_idx").alias("e"),
                    F.col("tail_idx").alias("nbr"),
                    F.lit(1).alias("is_out"))
    in_ = t.select("doc_key", F.col("tail_idx").alias("e"),
                   F.col("head_idx").alias("nbr"),
                   F.lit(0).alias("is_out"))
    return out_.unionByName(in_)


def kg_entity_degree(spark, sf_dir):
    """(doc_key, entity_idx, n_out, n_in, out_neighbors, in_neighbors,
    degree) for every entity that participates in >= 1 emitted triple:
    triple counts by direction plus distinct-neighbor counts (degree =
    distinct undirected neighbors).  One groupBy on (doc_key, entity)."""
    u = _undirected(_persist(_triples_identity(
        flagship_triples(spark, sf_dir, DEFAULT))))
    return u.groupBy("doc_key", F.col("e").alias("entity_idx")).agg(
        F.sum("is_out").cast("long").alias("n_out"),
        F.sum(1 - F.col("is_out")).cast("long").alias("n_in"),
        F.count_distinct(F.when(F.col("is_out") == 1, F.col("nbr")))
        .cast("long").alias("out_neighbors"),
        F.count_distinct(F.when(F.col("is_out") == 0, F.col("nbr")))
        .cast("long").alias("in_neighbors"),
        F.count_distinct("nbr").cast("long").alias("degree"))


KG_ENTITY_DEGREE_SQL = _golden_triples_derived("""
, u AS (
  SELECT doc_key, head_idx AS e, tail_idx AS nbr, 1 AS is_out FROM tr
  UNION ALL
  SELECT doc_key, tail_idx AS e, head_idx AS nbr, 0 AS is_out FROM tr)
SELECT doc_key, CAST(e AS BIGINT) AS entity_idx,
       CAST(SUM(is_out) AS BIGINT) AS n_out,
       CAST(SUM(1 - is_out) AS BIGINT) AS n_in,
       CAST(COUNT(DISTINCT CASE WHEN is_out = 1 THEN nbr END)
            AS BIGINT) AS out_neighbors,
       CAST(COUNT(DISTINCT CASE WHEN is_out = 0 THEN nbr END)
            AS BIGINT) AS in_neighbors,
       CAST(COUNT(DISTINCT nbr) AS BIGINT) AS degree
FROM u GROUP BY doc_key, e
""")


def kg_twohop(spark, sf_dir):
    """(doc_key, entity_idx, n_1hop, n_2hop): distinct entities within
    1 and within <= 2 undirected hops (self excluded) in each
    document's triple graph — the neighborhood-expansion primitive of
    KG queries.  One self-join of the distinct undirected edge set on
    (doc_key, hop node); per-document graphs bound the fan-out."""
    t = _persist(_triples_identity(
        flagship_triples(spark, sf_dir, DEFAULT)))
    one = _persist(
        _undirected(t).select("doc_key", "e", "nbr").distinct())
    two = (one.alias("a")
           .join(one.alias("b"),
                 [F.col("a.doc_key") == F.col("b.doc_key"),
                  F.col("a.nbr") == F.col("b.e")])
           .select(F.col("a.doc_key").alias("doc_key"),
                   F.col("a.e").alias("e"),
                   F.col("b.nbr").alias("nbr")))
    reach = (one.unionByName(two)
             .filter(F.col("nbr") != F.col("e")).distinct())
    return (one.groupBy("doc_key", "e")
            .agg(F.count_distinct("nbr").cast("long").alias("n_1hop"))
            .join(reach.groupBy("doc_key", "e")
                  .agg(F.count("*").cast("long").alias("n_2hop")),
                  ["doc_key", "e"])
            .select("doc_key", F.col("e").cast("long").alias("entity_idx"),
                    "n_1hop", "n_2hop"))


KG_TWOHOP_SQL = _golden_triples_derived("""
, one AS (
  SELECT DISTINCT doc_key, e, nbr FROM (
    SELECT doc_key, head_idx AS e, tail_idx AS nbr FROM tr
    UNION ALL
    SELECT doc_key, tail_idx AS e, head_idx AS nbr FROM tr)),
two AS (
  SELECT a.doc_key, a.e, b.nbr
  FROM one a JOIN one b ON a.doc_key = b.doc_key AND a.nbr = b.e),
reach AS (
  SELECT DISTINCT doc_key, e, nbr
  FROM (SELECT * FROM one UNION ALL SELECT * FROM two)
  WHERE nbr <> e)
SELECT o.doc_key, CAST(o.e AS BIGINT) AS entity_idx,
       CAST(o.n_1hop AS BIGINT) AS n_1hop,
       CAST(r.n_2hop AS BIGINT) AS n_2hop
FROM (SELECT doc_key, e, COUNT(DISTINCT nbr) AS n_1hop
      FROM one GROUP BY doc_key, e) o
JOIN (SELECT doc_key, e, COUNT(*) AS n_2hop
      FROM reach GROUP BY doc_key, e) r
  ON o.doc_key = r.doc_key AND o.e = r.e
""")


def kg_rel_profile(spark, sf_dir):
    """(rel_type, head_type, tail_type, n_triples, n_docs): the schema
    profile of the constructed KG — which (subject-type, predicate,
    object-type) signatures the extractor actually emits and how widely
    (distinct supporting documents).  Low-cardinality partial agg."""
    t = _triples_identity(flagship_triples(spark, sf_dir, DEFAULT))
    return t.groupBy("rel_type", "head_type", "tail_type").agg(
        F.count("*").cast("long").alias("n_triples"),
        F.count_distinct("doc_key").cast("long").alias("n_docs"))


KG_REL_PROFILE_SQL = _golden_triples_derived("""
SELECT rel_type, head_type, tail_type,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT doc_key) AS BIGINT) AS n_docs
FROM tr GROUP BY rel_type, head_type, tail_type
""")


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
    "kg_entity_degree": (kg_entity_degree, KG_ENTITY_DEGREE_SQL),
    "kg_twohop": (kg_twohop, KG_TWOHOP_SQL),
    "kg_rel_profile": (kg_rel_profile, KG_REL_PROFILE_SQL),
}
