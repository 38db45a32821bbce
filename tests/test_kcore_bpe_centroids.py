"""kg_kcore / bpe_pair_counts / emb_centroids_q: crafted-input
correctness plus cross-engine determinism contracts.

End-to-end Spark-vs-DuckDB comparison at sf0.01 runs in
test_oracle.py's parametrized harness; these tests pin semantics on
hand-verifiable inputs — pendant peeling, paths that vanish, the
1-char-term sequence() hazard, positional pair multiplicity — and
cross-check emb_centroids_q against its DuckDB oracle on a hostile
corpus (constant vectors, negatives) the sf corpora don't contain.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from jerex_spark.operators.kg import KCORE_K, KCORE_ROUNDS, _kcore_from
from jerex_spark.operators.similarity import EMB_CENTROIDS_SQL, \
    emb_centroids_q
from jerex_spark.operators.textops import bpe_pair_counts


def _triples_df(spark, rows):
    return spark.createDataFrame(
        [(d, h, t, "r", "ht", "tt", "hk", "tk") for d, h, t in rows],
        "doc_key string, head_idx long, tail_idx long, rel_type string,"
        " head_type string, tail_type string, head_key string,"
        " tail_key string")


def _kcore_ref(edges, k=KCORE_K, rounds=KCORE_ROUNDS):
    """Independent driver-side reference: fixed-round degree-k pruning,
    plain set/loop implementation."""
    und = {(a, b) for a, b in edges if a != b}
    und |= {(b, a) for a, b in und}
    for _ in range(rounds):
        deg = Counter(a for a, _ in und)
        keep = {v for v, d in deg.items() if d >= k}
        und = {(a, b) for a, b in und if a in keep and b in keep}
    return dict(Counter(a for a, _ in und))


def test_kcore_ref_semantics():
    # triangle: all three survive the 2-core at degree 2
    assert _kcore_ref([(0, 1), (1, 2), (2, 0)]) == {0: 2, 1: 2, 2: 2}
    # triangle + pendant: pendant peeled, triangle intact
    assert _kcore_ref([(0, 1), (1, 2), (2, 0), (2, 9)]) \
        == {0: 2, 1: 2, 2: 2}
    # path: peels from both ends to nothing within 3 rounds
    assert _kcore_ref([(i, i + 1) for i in range(5)]) == {}
    # bridged triangles: the bridge is cyclically supported, all stay
    got = _kcore_ref([(0, 1), (1, 2), (2, 0),
                      (10, 11), (11, 12), (12, 10), (2, 10)])
    assert got == {0: 2, 1: 2, 2: 3, 10: 3, 11: 2, 12: 2}


def test_kcore_spark_matches_reference_exactly(spark):
    # per-doc graphs incl. dups/reverse/self-loops: the distributed
    # trajectory must match the driver reference EXACTLY
    per_doc = {
        "A": [(0, 1), (1, 2), (2, 0), (2, 9)],          # pendant
        "B": [(i, i + 1) for i in range(5)],            # vanishing path
        "C": [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10),
              (2, 10)],                                 # bridge
        "D": [(7, 8), (8, 7), (7, 7), (7, 9), (9, 8)],  # dups + loop
        "E": [(a, b) for a in range(4) for b in range(a + 1, 4)],  # K4
    }
    rows = [(d, h, t) for d, es in per_doc.items() for h, t in es]
    got = {(r.doc_key, r.entity_idx): r.core_deg
           for r in _kcore_from(_triples_df(spark, rows)).collect()}
    want = {(d, v): c
            for d, es in per_doc.items()
            for v, c in _kcore_ref(es).items()}
    assert got == want


def test_bpe_pair_counts_crafted(spark, tmp_path):
    # ab(tf2) contributes 'ab'x2; abc adds 'ab','bc'; 'aaa' checks
    # POSITIONAL multiplicity ('aa' twice in one term); 1-char terms
    # must contribute nothing (the sequence()-descends hazard)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["ab ab cd", "abc a b", "aaa"]),
    }), str(tmp_path / "documents.parquet"))
    got = [(r.pair, r.pair_count)
           for r in bpe_pair_counts(spark, str(tmp_path)).collect()]
    assert sorted(got) == [("aa", 2), ("ab", 3), ("bc", 1), ("cd", 1)]


def test_bpe_topk_boundary_tiebreak(spark, tmp_path):
    # k=2 with a count tie at the boundary: pair ASC decides ('bc'
    # beats 'cd'), deterministically
    pq.write_table(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["ab ab bc cd"]),
    }), str(tmp_path / "documents.parquet"))
    got = [(r.pair, r.pair_count)
           for r in bpe_pair_counts(spark, str(tmp_path), k=2).collect()]
    assert sorted(got) == [("ab", 2), ("bc", 1)]


def _write_emb(tmp_path, vecs, labels):
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))


def test_emb_centroids_hand_checked(spark, tmp_path):
    # label 0: q=[0,127,255] + [0,0,0]; label 1: q=[0,255,255]
    _write_emb(tmp_path,
               [[0.0, 1.0, 2.0], [5.0, 5.0, 5.0], [-1.0, 1.0, 1.0]],
               [0, 0, 1])
    got = {(r.label, r.dim): (r.q_sum, r.n_vecs)
           for r in emb_centroids_q(spark, str(tmp_path)).collect()}
    assert got == {(0, 0): (0, 2), (0, 1): (127, 2), (0, 2): (255, 2),
                   (1, 0): (0, 1), (1, 1): (255, 1), (1, 2): (255, 1)}


def test_emb_centroids_duckdb_agrees_on_hostile_corpus(spark, tmp_path):
    _write_emb(tmp_path,
               [[0.0, 1.0, 2.0], [5.0, 5.0, 5.0], [-1.0, 1.0, 1.0],
                [0.1, 0.2, 0.3], [1e-8, 2e-8, 3e-8],
                [3.14159, 2.71828, 1.41421]],
               [0, 0, 1, 1, 2, 2])
    srows = sorted(tuple(r) for r in
                   emb_centroids_q(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{tmp_path}/embeddings.parquet'")
    drows = sorted(tuple(r) for r in
                   con.execute(EMB_CENTROIDS_SQL).fetchall())
    assert srows == drows
