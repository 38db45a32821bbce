"""Golden-parquet oracle plumbing shared by queries and generators.

Queries whose semantics no closed-form SQL can reproduce (the
``mapInPandas`` KG extract; the approximate-by-construction ANN
queries, which at a FIXED corpus and default operating point are
deterministic) are oracle-checked against *golden tables* committed
under ``golden/<sf>/``: independent plain-Python/numpy implementations
frozen to parquet by scripts/make_golden.py, selected in DuckDB by a
corpus content signature.

The signature expressions are defined HERE, once, and imported by both
the oracle SQL builders (operators/kg.py, similarity.py, dedup.py) and
the generator (scripts/make_golden.py) — if the two sides computed the
signature from separately-maintained strings, any drift would make the
oracle join match zero golden rows for every corpus, failing with a
confusing empty-oracle symptom.
"""

from __future__ import annotations

import os

GOLDEN_GLOB = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "golden"))

# content signature of the documents table: md5 over the sorted
# (doc_key, text-md5) pairs.  Row counts cannot discriminate corpora
# (sf0.001 and sf0.01 both have 500 docs); content can.
DOC_SIG_EXPR = ("md5(string_agg(source || '/' || doc_id || ':' || "
                "md5(text), ',' ORDER BY source || '/' || doc_id))")

# content signature of the embeddings table: md5 over the sorted
# (vec_id, vector-text-md5) pairs.  CAST(FLOAT[] AS VARCHAR) is
# deterministic in DuckDB, and both the freeze side and the check side
# compute it in DuckDB over the same parquet, so the formatting is
# definitionally consistent.
EMB_SIG_EXPR = ("md5(string_agg(vec_id || ':' || "
                "md5(CAST(embedding AS VARCHAR)), ',' ORDER BY vec_id))")


def golden_doc_sql(table: str, cols: list[str]) -> str:
    """Oracle over committed golden parquet keyed by the DOCUMENTS
    corpus signature (the five kg_* flagship tables)."""
    sel = ", ".join(f"g.{c}" for c in cols)
    return f"""
WITH sig AS (SELECT {DOC_SIG_EXPR} AS s FROM documents)
SELECT {sel}
FROM read_parquet('{GOLDEN_GLOB}/*/golden_{table}.parquet') g
JOIN sig ON g.corpus_sig = sig.s
"""


def golden_emb_sql(table: str, cols: list[str]) -> str:
    """Oracle over committed golden parquet keyed by the EMBEDDINGS
    corpus signature (the ANN/near-dup queries)."""
    sel = ", ".join(f"g.{c}" for c in cols)
    return f"""
WITH sig AS (SELECT {EMB_SIG_EXPR} AS s FROM embeddings)
SELECT {sel}
FROM read_parquet('{GOLDEN_GLOB}/*/golden_{table}.parquet') g
JOIN sig ON g.emb_sig = sig.s
"""
