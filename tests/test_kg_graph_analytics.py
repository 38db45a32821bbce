"""kg_triangles / kg_pagerank: crafted-graph correctness and the
integer fixed-point determinism contract.

The end-to-end oracle comparisons (Spark vs DuckDB over the golden
triples at sf0.001) run in test_oracle.py's parametrized harness;
these tests pin the operator semantics on graphs small enough to
verify by hand, plus cross-check the distributed PageRank against an
independent driver-side integer implementation (loop-ordered, no
DataFrames) — with parts-per-billion LONG arithmetic the two must
agree EXACTLY, at any parallelism.
"""

from __future__ import annotations

from collections import defaultdict

from jerex_spark.operators.kg import (
    PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_SCALE, _pagerank_from,
    _triangles_from)


def _triples_df(spark, rows):
    """rows: (doc_key, head_idx, tail_idx) -> minimal triple-identity
    DataFrame (the analytics only consume these three columns)."""
    return spark.createDataFrame(
        [(d, h, t, "r", "ht", "tt", "hk", "tk") for d, h, t in rows],
        "doc_key string, head_idx long, tail_idx long, rel_type string,"
        " head_type string, tail_type string, head_key string,"
        " tail_key string")


def _pagerank_ref(edges):
    """Independent driver-side reference: same integer recurrence,
    plain dict/loop implementation."""
    es = sorted({(s, t) for s, t in edges if s != t})
    if not es:
        return {}
    nodes = sorted({s for s, _ in es} | {t for _, t in es})
    n = len(nodes)
    out = defaultdict(int)
    innb = defaultdict(list)
    for s, t in es:
        out[s] += 1
        innb[t].append(s)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(PR_ITERS):
        dang = sum(r[v] for v in nodes if out[v] == 0)
        r = {u: ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE
                 // (PR_DAMP_DEN * n))
             + PR_DAMP_NUM * (sum(r[s] // out[s] for s in innb[u])
                              + dang // n) // PR_DAMP_DEN
             for u in nodes}
    return r


def test_triangles_crafted(spark):
    # doc A: K4 on {0,1,2,3} built from directed triples with dup and
    # reverse edges (must not double-count) -> 4 triangles, each node
    # in exactly 3; doc B: a path 0-1-2 -> no triangles, no rows
    k4 = [("A", a, b) for a in range(4) for b in range(4) if a != b]
    rows = k4 + [("A", 0, 1), ("A", 1, 0),            # dups + reverse
                 ("A", 2, 2),                          # self-loop
                 ("B", 0, 1), ("B", 1, 2)]
    got = {(r.doc_key, r.entity_idx): r.n_triangles
           for r in _triangles_from(_triples_df(spark, rows)).collect()}
    assert got == {("A", e): 3 for e in range(4)}


def test_triangles_single(spark):
    rows = [("D", 1, 2), ("D", 2, 3), ("D", 3, 1), ("D", 3, 4)]
    got = {(r.doc_key, r.entity_idx): r.n_triangles
           for r in _triangles_from(_triples_df(spark, rows)).collect()}
    assert got == {("D", 1): 1, ("D", 2): 1, ("D", 3): 1}


def test_pagerank_ref_properties():
    # star: 1->2, 1->3, 1->4 (2,3,4 dangling): sinks symmetric and
    # above the hub; mass conserved to within the floor-truncation
    # bias (<= (in_deg + 2) ppb per node per iteration)
    r = _pagerank_ref([(1, 2), (1, 3), (1, 4)])
    assert set(r) == {1, 2, 3, 4}
    assert r[2] == r[3] == r[4] > r[1]
    assert abs(sum(r.values()) - PR_SCALE) < 100 * PR_ITERS
    # 2-cycle: 0.5/0.5 is an exact fixed point of the integer map
    r2 = _pagerank_ref([(1, 2), (2, 1)])
    assert r2[1] == r2[2] == PR_SCALE // 2


def test_pagerank_spark_matches_reference_exactly(spark):
    # cycles, dangling nodes, duplicate edges, self-loops, a dense K4:
    # the distributed integer trajectory must match the driver-side
    # reference EXACTLY (this is the determinism contract — no fp)
    rows = ([("A", 1, 2), ("A", 2, 1), ("A", 1, 3)]
            + [("B", a, b) for a in range(4) for b in range(4) if a != b]
            + [("C", 7, 8), ("C", 7, 8), ("C", 8, 8)]
            + [("E", i, i + 1) for i in range(6)])       # chain
    got = {(r.doc_key, r.entity_idx): r.pagerank_ppb
           for r in _pagerank_from(_triples_df(spark, rows)).collect()}
    per_doc = defaultdict(list)
    for d, h, t in rows:
        per_doc[d].append((h, t))
    want = {(d, v): rank
            for d, es in per_doc.items()
            for v, rank in _pagerank_ref(es).items()}
    assert got == want


def test_pagerank_single_edge_hand_checked():
    # one triple 7->8: n=2, r0 = 5e8 each; iteration 1:
    #   dang = r(8) = 5e8
    #   r'(7) = 3e9 // 40 + 17 * (0 + 5e8 // 2) // 20
    #         = 75_000_000 + 17 * 250_000_000 // 20 = 287_500_000
    #   r'(8) = 75_000_000 + 17 * (5e8 // 1 + 250_000_000) // 20
    #         = 75_000_000 + 637_500_000 = 712_500_000
    r = _pagerank_ref([(7, 8)])
    one = {7: 287_500_000, 8: 712_500_000}
    # re-run remaining iterations by hand recurrence to the fixture
    cur = {7: PR_SCALE // 2, 8: PR_SCALE // 2}
    for _ in range(PR_ITERS):
        dang = cur[8]
        cur = {7: 75_000_000 + 17 * (dang // 2) // 20,
               8: 75_000_000 + 17 * (cur[7] + dang // 2) // 20}
    assert r == cur
    # and iteration 1 of that recurrence is the hand computation above
    assert (75_000_000 + 17 * (500_000_000 // 2) // 20
            == one[7]) and (75_000_000
                            + 17 * (500_000_000 + 250_000_000) // 20
                            == one[8])
