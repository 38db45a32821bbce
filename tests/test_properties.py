"""Property-based invariants (hypothesis) for the executor-local
kernels: clustering, tokenization offsets, sampling determinism.
These are the pieces whose edge cases a fixed fixture can miss
(SURVEY.md §5 test strategy)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jerex_spark.clustering import complete_linkage
from jerex_spark.config import DEFAULT
from jerex_spark.reference_executor import _complete_linkage_ref
from jerex_spark.tokenization import tokenize_document


@st.composite
def dist_matrices(draw):
    n = draw(st.integers(min_value=0, max_value=10))
    # coarse value grid -> plenty of exact ties to stress tie-breaking
    vals = draw(st.lists(
        st.sampled_from([0.0, 0.05, 0.1, 0.2, 0.5, 0.9]),
        min_size=n * (n - 1) // 2, max_size=n * (n - 1) // 2))
    m = np.zeros((n, n), dtype=np.float32)
    if n > 1:
        m[np.triu_indices(n, 1)] = vals
    return m


@settings(max_examples=200, deadline=None)
@given(dist_matrices(), st.sampled_from([0.05, 0.15, 0.3, 0.6]))
def test_complete_linkage_properties(dist, threshold):
    clusters = complete_linkage(dist, threshold)
    n = dist.shape[0]
    # exact partition of range(n)
    flat = sorted(m for c in clusters for m in c)
    assert flat == list(range(n))
    # members sorted, clusters ordered by min member
    assert all(c == sorted(c) for c in clusters)
    assert [c[0] for c in clusters] == sorted(c[0] for c in clusters)
    # complete-link guarantee: max intra-cluster distance < threshold
    for c in clusters:
        for i in c:
            for j in c:
                if i < j:
                    assert dist[i, j] < threshold
    # agreement with the independent reference implementation
    assert clusters == _complete_linkage_ref(dist, threshold)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abcz .", min_size=0, max_size=12),
                min_size=0, max_size=8))
def test_tokenization_offset_invariants(words):
    text = " ".join(words)
    tok = tokenize_document(text, DEFAULT)
    n = len(tok.phrases)
    assert len(tok.sub_start) == len(tok.sub_end) == n
    for i in range(n):
        # every token owns a non-empty, in-bounds sub-word range
        assert 0 <= tok.sub_start[i] < tok.sub_end[i] \
            <= len(tok.encoding)
        if i:
            assert tok.sub_start[i] >= tok.sub_end[i - 1]
    # sentence structure partitions the token sequence
    assert sum(len(s) for s in tok.sentences) == n
    # determinism (distributed replay)
    tok2 = tokenize_document(text, DEFAULT)
    assert tok.encoding == tok2.encoding
    assert tok.phrases == tok2.phrases


@settings(max_examples=80, deadline=None)
@given(st.integers(min_value=2, max_value=12),
       st.integers(min_value=0, max_value=10**9))
def test_negative_relation_sampling_invariants(n_entities, salt):
    from jerex_spark.sampling import sample_negative_relations
    gold = {(0, 1)} if n_entities >= 2 else set()
    neg = sample_negative_relations(f"doc{salt}", n_entities, gold,
                                    neg_count=7)
    assert len(neg) == len(set(neg))                 # no duplicates
    assert all(a != b for a, b in neg)               # ordered pairs only
    assert not (set(neg) & gold)                     # never gold
    assert all(0 <= a < n_entities and 0 <= b < n_entities
               for a, b in neg)
    # deterministic replay per doc key
    assert neg == sample_negative_relations(f"doc{salt}", n_entities,
                                            gold, neg_count=7)
