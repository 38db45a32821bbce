"""kg_bfs_dist / stratified_sample: crafted-input correctness plus the
determinism contracts.

End-to-end Spark-vs-DuckDB comparison at sf0.01 runs in
test_oracle.py's parametrized harness; these tests pin semantics the
driver corpus can't isolate — hop truncation past BFS_ROUNDS,
unreachable components, the retry-stability of the md5 sample draw —
against independent driver-side references.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

from jerex_spark.operators.kg import BFS_ROUNDS, _bfs_from
from jerex_spark.operators.packing import stratified_sample


def _triples_df(spark, rows):
    return spark.createDataFrame(
        [(d, h, t, "r", "ht", "tt", "hk", "tk") for d, h, t in rows],
        "doc_key string, head_idx long, tail_idx long, rel_type string,"
        " head_type string, tail_type string, head_key string,"
        " tail_key string")


def _bfs_ref(edges, rounds=BFS_ROUNDS):
    """Independent driver-side reference: BFS from the min node,
    plain dict/loop implementation."""
    und = {(a, b) for a, b in edges if a != b}
    und |= {(b, a) for a, b in und}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
    if not nbrs:
        return {}
    dist = {min(nbrs): 0}
    frontier = {min(nbrs)}
    for r in range(1, rounds + 1):
        frontier = {n for v in frontier for n in nbrs[v]
                    if n not in dist}
        for n in frontier:
            dist[n] = r
    return dist


def test_bfs_ref_semantics():
    # chain 0-1-2-3-4-5: hops truncate at BFS_ROUNDS=3
    assert _bfs_ref([(i, i + 1) for i in range(5)]) \
        == {0: 0, 1: 1, 2: 2, 3: 3}
    # disconnected component {10,11} is never reached from min node 0
    assert _bfs_ref([(0, 1), (10, 11)]) == {0: 0, 1: 1}
    # triangle + tail: all within 2 hops
    assert _bfs_ref([(0, 1), (1, 2), (2, 0), (2, 9)]) \
        == {0: 0, 1: 1, 2: 1, 9: 2}


def test_bfs_spark_matches_reference_exactly(spark):
    per_doc = {
        "A": [(i, i + 1) for i in range(6)],            # truncating chain
        "B": [(0, 1), (10, 11), (11, 12)],              # unreachable comp
        "C": [(0, 1), (1, 2), (2, 0), (2, 9)],          # triangle + tail
        "D": [(7, 8), (8, 7), (7, 7)],                  # dups + self-loop
    }
    rows = [(d, h, t) for d, es in per_doc.items() for h, t in es]
    got = {(r.doc_key, r.entity_idx): r.dist
           for r in _bfs_from(_triples_df(spark, rows)).collect()}
    want = {(d, v): c
            for d, es in per_doc.items()
            for v, c in _bfs_ref(es).items()}
    assert got == want


def _write_docs(tmp_path, langs):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(langs)), type=pa.int64()),
        "text": pa.array(["x"] * len(langs)),
        "lang": pa.array(langs),
    }), str(tmp_path / "documents.parquet"))


def test_stratified_sample_k_per_stratum_and_stability(spark, tmp_path):
    _write_docs(tmp_path, ["en"] * 30 + ["de"] * 10 + ["fr"] * 2)
    a = sorted(tuple(r) for r in
               stratified_sample(spark, str(tmp_path), k=5).collect())
    per_lang = defaultdict(list)
    for lang, doc_id, rk in a:
        per_lang[lang].append(rk)
    # k rows per stratum (capped by stratum size), ranks dense from 1
    assert sorted(per_lang["en"]) == [1, 2, 3, 4, 5]
    assert sorted(per_lang["de"]) == [1, 2, 3, 4, 5]
    assert sorted(per_lang["fr"]) == [1, 2]
    # retry-stable: a second run draws the identical rows
    b = sorted(tuple(r) for r in
               stratified_sample(spark, str(tmp_path), k=5).collect())
    assert a == b


def test_stratified_sample_survivors_stable_under_growth(spark,
                                                         tmp_path):
    # adding documents must not change which of the ORIGINAL docs rank
    # where relative to each other (the md5 order is per-doc static) —
    # new docs may interleave, but original relative order is fixed
    _write_docs(tmp_path, ["en"] * 20)
    big = sorted(
        (r.doc_id, r.rk)
        for r in stratified_sample(spark, str(tmp_path), k=20).collect())
    order_all = [d for d, _ in sorted(big, key=lambda x: x[1])]
    _write_docs(tmp_path, ["en"] * 12)      # rewrite: first 12 docs only
    small = stratified_sample(spark, str(tmp_path), k=20).collect()
    order_small = [r.doc_id for r in sorted(small, key=lambda r: r.rk)]
    assert [d for d in order_all if d < 12] == order_small
