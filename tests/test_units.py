"""T1 unit tests — pure-Python operator semantics (no Spark).

Each case pins a reference behavior cited in SURVEY.md §2 /
FIXTURES.md §5.
"""

from __future__ import annotations

import numpy as np
import pytest

from jerex_spark import scoring
from jerex_spark.clustering import complete_linkage
from jerex_spark.config import DEFAULT as cfg
from jerex_spark.reference_executor import _complete_linkage_ref
from jerex_spark.tokenization import (encode_token, enumerate_spans,
                                      tokenize_document)
from jerex_spark.weights import load_weights


def test_span_enumeration_count():
    # count = sum over sentences of sum_{k=1..10} max(0, len-k+1)
    # (ref sampling_common.py:77-98)
    doc = tokenize_document("a b c d e. f g h i j k l m n o p q r s t u v")
    lens = [len(s) for s in doc.sentences]
    expect = sum(max(0, n - k + 1) for n in lens
                 for k in range(1, cfg.max_span_size + 1))
    assert len(enumerate_spans(doc)) == expect


def test_spans_stay_intra_sentence():
    doc = tokenize_document("a b. c d.")
    for s, e, s_i in enumerate_spans(doc):
        assert doc.tok_sent_idx[s] == doc.tok_sent_idx[e - 1] == s_i


def test_subword_offsets_end_exclusive():
    # two coordinate systems (ref entities.py:97-98, 157-166)
    doc = tokenize_document("abcdefgh xy")
    # "abcdefgh" -> 2 chunks of 4; "xy" -> 1 chunk
    assert (doc.sub_start[0], doc.sub_end[0]) == (0, 2)
    assert (doc.sub_start[1], doc.sub_end[1]) == (2, 3)
    assert len(doc.encoding) == 3


def test_empty_token_unk_fallback():
    # ref datasets.py:94-95
    assert encode_token("") == [cfg.unk_id]


def test_edit_distance_known_values():
    # ref jerex/util.py:93-106
    assert scoring.edit_distance("kitten", "sitting") == 3
    assert scoring.edit_distance("", "abc") == 3
    assert scoring.edit_distance("same", "same") == 0


def test_token_distance_rule():
    # max(0, second.start - (first.end - 1)): the reference subtracts
    # the first mention's LAST token index, so adjacent mentions are at
    # distance 1 (ref sampling_common.py:297-315)
    assert scoring.token_distance(5, 9) == 5
    assert scoring.token_distance(5, 5) == 1   # adjacent
    assert scoring.token_distance(5, 3) == 0   # overlap clamps to 0


def test_context_pool_adjacent_is_zero():
    # adjacent/overlapping -> zero context vector
    # (ref relation_classification_multi_instance.py:78)
    h = np.ones((10, 4), dtype=np.float32)
    assert scoring.context_pool(h, 5, 5, 4).sum() == 0
    assert scoring.context_pool(h, 6, 4, 4).sum() == 0
    assert scoring.context_pool(h, 4, 6, 4).sum() == 4


def test_complete_linkage_chain_break():
    # chain a-b close, b-c close, a-c far: complete linkage refuses the
    # 3-merge (max pairwise distance governs) — ref misc.py:93-158
    d = np.zeros((3, 3), dtype=np.float32)
    d[0, 1] = 0.05
    d[1, 2] = 0.05
    d[0, 2] = 0.9
    got = complete_linkage(d, threshold=0.15)
    assert got == [[0, 1], [2]]   # deterministic tie-break: (0,1) first


def test_complete_linkage_singleton_and_empty():
    assert complete_linkage(np.zeros((0, 0), dtype=np.float32), 0.1) == []
    assert complete_linkage(np.zeros((1, 1), dtype=np.float32), 0.1) == [[0]]


@pytest.mark.parametrize("n", [2, 5, 8, 12])
def test_complete_linkage_impls_agree(n):
    # the Spark-side and reference-side implementations are independent;
    # they must agree on random matrices
    rng = np.random.default_rng(n)
    d = np.zeros((n, n), dtype=np.float32)
    iu = np.triu_indices(n, 1)
    d[iu] = rng.uniform(0, 0.4, size=len(iu[0])).astype(np.float32)
    a = complete_linkage(d, 0.15)
    b = _complete_linkage_ref(d, 0.15)
    assert a == b


def test_argmax_tie_lowest_index():
    # ref joint_models.py:227 torch argmax tie semantics
    x = np.array([[1.0, 1.0, 0.5]])
    assert int(np.argmax(x[0])) == 0


def test_encoder_deterministic_and_shapes():
    w = load_weights(cfg)
    h1 = scoring.encode([5, 6, 7], w, cfg)
    h2 = scoring.encode([5, 6, 7], w, cfg)
    assert h1.shape == (3, cfg.hidden_size)
    assert h1.dtype == np.float32
    np.testing.assert_array_equal(h1, h2)
    assert scoring.encode([], w, cfg).shape == (0, cfg.hidden_size)


def test_weights_frozen_across_loads():
    import jerex_spark.weights as W
    W._CACHE.clear()
    a = load_weights(cfg)
    W._CACHE.clear()
    b = load_weights(cfg)
    np.testing.assert_array_equal(a.men_w1, b.men_w1)
    np.testing.assert_array_equal(a.rel_w2, b.rel_w2)


def test_weight_artifact_roundtrip(tmp_path):
    """The frozen artifact survives a save/load through .npz — swapping
    in real checkpoint weights is a file change, not a code change."""
    from jerex_spark import scoring
    from jerex_spark.weights import load_weights_npz, save_weights
    w = load_weights(cfg)
    p = str(tmp_path / "artifact.npz")
    save_weights(w, p)
    w2 = load_weights_npz(p)
    np.testing.assert_array_equal(w.men_w1, w2.men_w1)
    np.testing.assert_array_equal(w.rel_b2, w2.rel_b2)
    assert w.men_b2 == w2.men_b2
    x = np.random.default_rng(1).random((7, cfg.hidden_size),
                                        dtype=np.float32)
    s = np.ones(7, dtype=int)
    np.testing.assert_array_equal(scoring.mention_logits(x, s, w),
                                  scoring.mention_logits(x, s, w2))
    # F6/F9 global-variant weights roundtrip too
    np.testing.assert_array_equal(w.pair_w, w2.pair_w)
    t = np.zeros(7, dtype=int)
    pr = scoring.entity_pair_global_repr(x, x, t, t, w)
    pr2 = scoring.entity_pair_global_repr(x, x, t, t, w2)
    np.testing.assert_array_equal(
        scoring.relation_logits_global(pr, w),
        scoring.relation_logits_global(pr2, w2))


def test_lsh_schedule_derivation():
    """(bands, bits) auto-derivation: bits keep buckets ~constant as n
    grows, bands restore the design recall; explicit overrides and the
    small-n floors pass through untouched."""
    from jerex_spark.operators.similarity import (MAX_BANDS, lsh_schedule)
    # small-n operating points are the measured defaults (floors)
    assert lsh_schedule(500, 0.45, min_bands=16) == (16, 4)
    assert lsh_schedule(500, 0.4, min_bands=24) == (24, 4)
    # 10x corpus: bits grow so bucket size stays ~TARGET_BUCKET_ROWS,
    # bands grow to keep pairs at the design cosine recalled
    bands1, bits1 = lsh_schedule(5000, 0.45, min_bands=16)
    assert bits1 == 7 and bands1 == 61
    bands2, bits2 = lsh_schedule(50000, 0.45, min_bands=16)
    assert bits2 > bits1 and bands2 <= MAX_BANDS
    # explicit overrides are never second-guessed
    assert lsh_schedule(10 ** 9, 0.45, n_bands=8, band_bits=4) == (8, 4)
    # bits override alone still derives bands for that bits choice
    bands3, bits3 = lsh_schedule(5000, 0.45, band_bits=4, min_bands=16)
    assert bits3 == 4 and bands3 == 16
