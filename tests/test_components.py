"""Connected components (operators/components.py): exact equality
with a plain union-find reference, convergence behavior on the
chain-shaped worst case, and the dedup_components keep-list contract.
"""
from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jerex_spark.operators.components import (
    connected_components, dedup_components)


def _uf_components(edges):
    """Union-find reference: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _spark_components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a: long, b: long")
    out = connected_components(df, "a", "b", **kw)
    return {r["id"]: r["component"] for r in out.collect()}


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=40)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_lists)
def test_matches_union_find_distributed(spark, edges):
    """driver_max_edges=0 forces the star alternation — the default
    driver fast-path shares union-find with this test's reference, so
    only the forced path is a non-circular check of the stars."""
    got = _spark_components(spark, edges, driver_max_edges=0)
    want = _uf_components([e for e in edges if e[0] != e[1]])
    assert got == want


def test_driver_fastpath_matches_distributed(spark):
    """Default (fast-path) and forced-distributed closures agree —
    same labels, same min-id representatives."""
    edges = [(5, 3), (3, 9), (20, 21), (7, 7), (1, 9), (30, 29)]
    fast = _spark_components(spark, edges)
    dist = _spark_components(spark, edges, driver_max_edges=0)
    assert fast == dist == {1: 1, 3: 1, 5: 1, 9: 1,
                            20: 20, 21: 20, 29: 29, 30: 29}


def test_chain_converges(spark):
    """A 64-node chain is label propagation's worst case (diameter 63
    rounds); the star alternation must collapse it in O(log n)."""
    edges = [(i, i + 1) for i in range(63)]
    got = _spark_components(spark, edges, driver_max_edges=0)
    assert got == {i: 0 for i in range(64)}


def test_round_cap_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(20)],
                               "a: long, b: long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, "a", "b", max_rounds=0,
                             driver_max_edges=0)


def test_dedup_components_keep_list(spark, sf001):
    """Every doc labeled; canonical = min doc_id of its cluster;
    keep-list size = number of distinct clusters."""
    rows = dedup_components(spark, sf001).collect()
    assert len(rows) == 500
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    for comp, members in by_comp.items():
        ids = [m["doc_id"] for m in members]
        assert comp == min(ids)
        assert all(m["component_size"] == len(ids) for m in members)
        assert [m["doc_id"] for m in members if m["is_canonical"]] == [comp]
    kept = sum(r["is_canonical"] for r in rows)
    assert kept == len(by_comp) < 500   # sf0.001 has real dup clusters


def test_corpus_curation_contract(spark, sf001):
    """Composed curation (operators/curation.py): filter verdict is
    exactly the lang/quality predicate; kept implies passed; each
    survivor cluster keeps exactly one member, the min doc_id; dropped
    docs carry their own id as a singleton label (no NULLs — the
    driver compare sorts row tuples)."""
    from jerex_spark.operators.curation import (
        CURATION_LANG, CURATION_MIN_QUALITY, corpus_curation)
    rows = corpus_curation(spark, sf001).collect()
    assert len(rows) == 500
    assert all(r["component_id"] is not None for r in rows)
    by_comp = {}
    for r in rows:
        assert r["passed_filter"] == (
            r["pred_lang"] == CURATION_LANG
            and r["quality"] >= CURATION_MIN_QUALITY)
        if not r["passed_filter"]:
            assert not r["kept"]
            assert r["component_id"] == r["doc_id"]
        else:
            by_comp.setdefault(r["component_id"], []).append(r)
    assert by_comp   # the operating point keeps a non-trivial subset
    for comp, members in by_comp.items():
        ids = sorted(m["doc_id"] for m in members)
        assert comp == ids[0]
        assert [m["doc_id"] for m in members if m["kept"]] == [comp]
