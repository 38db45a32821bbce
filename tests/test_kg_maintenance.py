"""Semantic properties of the cross-crawl KG-maintenance operators
(kg_delta_merge / kg_cooccur_pmi / kg_neg_samples) beyond the bitwise
DuckDB oracle in test_oracle.py: the oracle proves Spark == the golden
derivation; these pin the properties the DERIVATION itself must have
(uniform-without-self corruption, batch-partition accounting, PMI
marginal consistency)."""

from __future__ import annotations

import math

import pytest

from jerex_spark.operators.kg import (kg_cooccur_pmi, kg_delta_merge,
                                      kg_neg_samples)


@pytest.fixture(scope="module")
def merged(spark, sf0001):
    return kg_delta_merge(spark, sf0001).collect()


@pytest.fixture(scope="module")
def negs(spark, sf0001):
    return kg_neg_samples(spark, sf0001).collect()


def test_delta_merge_accounting(merged):
    assert merged, "no merged triples"
    statuses = set()
    for r in merged:
        assert r.n_base + r.n_delta == r.support
        assert 1 <= r.n_docs <= r.support
        expect = ("retained" if r.n_base and r.n_delta
                  else "added" if r.n_delta else "stale")
        assert r.status == expect
        statuses.add(r.status)
    # the md5 doc split must actually split: both batches populated
    assert {"added", "stale"} <= statuses or "retained" in statuses
    assert sum(r.n_base for r in merged) > 0
    assert sum(r.n_delta for r in merged) > 0


def test_delta_merge_identity_is_canonical(merged):
    # (subj, pred, obj) is the merge key — no duplicate identities
    keys = [(r.subj, r.pred, r.obj) for r in merged]
    assert len(keys) == len(set(keys))


def test_neg_samples_never_self_and_in_range(spark, sf0001, negs):
    from jerex_spark.operators.kg import kg_entities
    n_ent = {}
    for r in kg_entities(spark, sf0001).collect():
        n_ent[r.doc_key] = max(n_ent.get(r.doc_key, 0), r.entity_idx + 1)
    assert negs
    for r in negs:
        n = n_ent[r.doc_key]
        assert n >= 2
        if r.corrupted == "head":
            assert r.neg_head_idx != r.head_idx
            assert 0 <= r.neg_head_idx < n
            assert r.neg_tail_idx == r.tail_idx
        else:
            assert r.corrupted == "tail"
            assert r.neg_tail_idx != r.tail_idx
            assert 0 <= r.neg_tail_idx < n
            assert r.neg_head_idx == r.head_idx


def test_neg_samples_two_per_triple_and_filtered_flag(spark, sf0001,
                                                      negs):
    from jerex_spark.operators.kg import kg_triples
    pos = {(r.doc_key, r.head_idx, r.tail_idx, r.rel_type)
           for r in kg_triples(spark, sf0001).collect()}
    by_triple: dict[tuple, set] = {}
    for r in negs:
        by_triple.setdefault(
            (r.doc_key, r.head_idx, r.tail_idx, r.rel_type),
            set()).add(r.corrupted)
        is_pos = (r.doc_key, r.neg_head_idx, r.neg_tail_idx,
                  r.rel_type) in pos
        assert r.is_false_negative == is_pos
    assert all(v == {"head", "tail"} for v in by_triple.values())
    # every sampled triple is a real positive from a multi-entity doc
    assert set(by_triple) <= pos


def test_surface_components_resolution(spark, sf0001):
    from jerex_spark.operators.kg import kg_surface_components
    rows = kg_surface_components(spark, sf0001).collect()
    assert rows
    by_cluster: dict[str, list] = {}
    for r in rows:
        assert r.canonical <= r.surface  # canonical = min member
        assert r.is_canonical == (r.surface == r.canonical)
        by_cluster.setdefault(r.canonical, []).append(r)
    for canon, members in by_cluster.items():
        assert all(m.cluster_size == len(members) for m in members)
        assert canon in {m.surface for m in members}
        if len(members) > 1:
            # connectivity witness: every member shares an alias with
            # some other member (necessary condition of the closure)
            for m in members:
                aliases = set(m.surface.split("|"))
                assert any(aliases & set(o.surface.split("|"))
                           for o in members if o.surface != m.surface)
    # singletons with a unique alias set stay singleton clusters
    assert any(len(v) == 1 for v in by_cluster.values())


def test_cooccur_pmi_marginals(spark, sf0001):
    rows = kg_cooccur_pmi(spark, sf0001).collect()
    assert rows
    n_corpus = None
    for r in rows:
        assert r.surf_a < r.surf_b
        assert 1 <= r.c_ab <= min(r.c_a, r.c_b)
        # invert the pmi formula to recover one consistent N
        n = math.exp(r.pmi) * r.c_a * r.c_b / r.c_ab
        n = round(n)
        if n_corpus is None:
            n_corpus = n
        assert abs(n - n_corpus) <= 1  # 6dp rounding slack
