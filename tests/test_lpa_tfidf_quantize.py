"""kg_communities / tfidf_topk / emb_quantize: crafted-input
correctness plus the cross-engine determinism contracts.

End-to-end Spark-vs-DuckDB comparison at sf0.01 runs in
test_oracle.py's parametrized harness; these tests pin semantics on
inputs small enough to verify by hand — including the edge cases the
driver corpus can't contain (constant vectors, bridge graphs) — and
cross-check emb_quantize's fp-elementwise determinism claim by running
the DuckDB oracle on the same hostile corpus.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jerex_spark.operators.kg import LPA_ITERS, _communities_from
from jerex_spark.operators.similarity import EMB_QUANTIZE_SQL, \
    emb_quantize
from jerex_spark.operators.textops import tfidf_topk


def _triples_df(spark, rows):
    return spark.createDataFrame(
        [(d, h, t, "r", "ht", "tt", "hk", "tk") for d, h, t in rows],
        "doc_key string, head_idx long, tail_idx long, rel_type string,"
        " head_type string, tail_type string, head_key string,"
        " tail_key string")


def _lpa_ref(edges, iters=LPA_ITERS):
    """Independent driver-side reference: synchronous min-tie-break
    label propagation, plain dict/loop implementation."""
    und = {(a, b) for a, b in edges if a != b}
    und |= {(b, a) for a, b in und}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
    lbl = {v: v for v in nbrs}
    for _ in range(iters):
        new = {}
        for v in nbrs:
            cnt = Counter(lbl[u] for u in nbrs[v])
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lbl = new
    return lbl


def test_lpa_spark_matches_reference_exactly(spark):
    # triangle, two triangles bridged, chain, dups/reverse/self-loops:
    # the distributed synchronous trajectory must match the driver
    # reference EXACTLY (integer determinism contract, like pagerank)
    rows = ([("A", 0, 1), ("A", 1, 2), ("A", 2, 0)]
            + [("B", 0, 1), ("B", 1, 2), ("B", 2, 0),
               ("B", 10, 11), ("B", 11, 12), ("B", 12, 10),
               ("B", 2, 10)]                         # bridge
            + [("C", i, i + 1) for i in range(5)]
            + [("D", 7, 8), ("D", 8, 7), ("D", 7, 7)])
    got = {(r.doc_key, r.entity_idx): r.community
           for r in _communities_from(_triples_df(spark, rows)).collect()}
    per_doc = defaultdict(list)
    for d, h, t in rows:
        per_doc[d].append((h, t))
    want = {(d, v): c
            for d, es in per_doc.items()
            for v, c in _lpa_ref(es).items()}
    assert got == want


def test_lpa_triangle_converges_to_min_label():
    # K3 {5,6,7}: iter1 -> each takes min neighbor; iter2 onwards all 5
    assert _lpa_ref([(5, 6), (6, 7), (7, 5)]) == {5: 5, 6: 5, 7: 5}
    # 2-node component: both adopt the other's label, oscillation
    # resolves because min-tie-break is stable once labels agree
    r = _lpa_ref([(1, 2)])
    assert set(r) == {1, 2}


def test_tfidf_topk_crafted(spark, tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a a b", "a c"]),
    }), str(tmp_path / "documents.parquet"))
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df)
           for r in tfidf_topk(spark, str(tmp_path)).collect()}
    # d1: a(tf2) then b(tf1, df1); d2: tf ties 1-1, rarer c (df1)
    # beats a (df2)
    assert got == {(1, 1): ("a", 2, 2), (1, 2): ("b", 1, 1),
                   (2, 1): ("c", 1, 1), (2, 2): ("a", 1, 2)}


def _write_emb(tmp_path, vecs):
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), type=pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))


def test_emb_quantize_hand_checked(spark, tmp_path):
    _write_emb(tmp_path, [
        [0.0, 1.0, 2.0],      # lo=0 hi=2: q = [0, 127, 255]
        [5.0, 5.0],           # constant -> all zeros
        [-1.0, 1.0],          # lo=-1 hi=1: q = [0, 255]
    ])
    got = {r.vec_id: (r.n_dims, r.q_sum, r.q_nonzero, r.q_head)
           for r in emb_quantize(spark, str(tmp_path)).collect()}
    assert got == {0: (3, 382, 2, "0,127,255"),
                   1: (2, 0, 0, "0,0"),
                   2: (2, 255, 1, "0,255")}


def test_emb_quantize_duckdb_agrees_on_hostile_corpus(spark, tmp_path):
    # constant / negative / tiny-range / irrational-ish values: the
    # elementwise-IEEE determinism claim, checked on inputs the sf
    # corpora don't contain
    _write_emb(tmp_path, [
        [0.0, 1.0, 2.0], [5.0, 5.0], [-1.0, 1.0],
        [0.1, 0.2, 0.3, 0.7], [1e-8, 2e-8, 3e-8],
        [3.14159, 2.71828, 1.41421, 0.57721],
    ])
    srows = sorted(tuple(r) for r in
                   emb_quantize(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{tmp_path}/embeddings.parquet'")
    drows = sorted(tuple(r) for r in
                   con.execute(EMB_QUANTIZE_SQL).fetchall())
    assert srows == drows
