"""Property-based coverage of the (n_bands, band_bits) auto-schedule
(operators/similarity.py:178) — the piece that decides join cost and
recall for every corpus size without a manual dial.

The invariants the rest of the repo relies on:

  1. the band count NEVER exceeds MAX_BANDS (plane matmul width and
     band-join fan-out are linear in bands);
  2. whenever the schedule stays silent, its own recall model puts the
     design-cosine pair above DESIGN_RECALL — silence means the pin
     held;
  3. whenever the pin could not be held, a warning was emitted —
     degradation is never silent (the repo's caps-are-logged rule);
  4. code length is monotone non-decreasing in corpus size at a fixed
     design cosine (buckets must not grow quadratically with n);
  5. explicit overrides pass through verbatim.
"""
from __future__ import annotations

import math
import warnings

from hypothesis import given, settings
from hypothesis import strategies as st

from jerex_spark.operators.similarity import (
    BAND_BITS, DESIGN_RECALL, MAX_BANDS, lsh_schedule)


def _recall(cos: float, bands: int, bits: int) -> float:
    p_bit = 1.0 - math.acos(max(-1.0, min(1.0, cos))) / math.pi
    return 1.0 - (1.0 - p_bit ** bits) ** bands


@settings(max_examples=300, deadline=None)
@given(n=st.integers(1, 2_000_000_000),
       cos=st.floats(-0.99, 0.99, allow_nan=False))
def test_auto_schedule_bounds_and_recall(n, cos):
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bands, bits = lsh_schedule(n, design_cos=cos)
    assert 1 <= bands <= MAX_BANDS
    assert bits >= 1
    capped = any("cannot reach recall" in str(w.message) for w in caught)
    if not capped:
        # silence (or a bucket-growth warning alone) means the pin held
        assert _recall(cos, bands, bits) >= DESIGN_RECALL - 1e-9
    else:
        # the pin is unreachable at ANY bits >= BAND_BITS within the
        # cap — the schedule must be at the cap, flooring the codes
        assert bands == MAX_BANDS
        assert bits == BAND_BITS
        assert _recall(cos, MAX_BANDS, BAND_BITS) < DESIGN_RECALL


@settings(max_examples=100, deadline=None)
@given(cos=st.floats(0.05, 0.95, allow_nan=False),
       ns=st.lists(st.integers(1, 2_000_000_000), min_size=2, max_size=6))
def test_code_length_monotone_in_corpus_size(cos, ns):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bits = [lsh_schedule(n, design_cos=cos)[1] for n in sorted(ns)]
    assert bits == sorted(bits)


@settings(max_examples=100, deadline=None)
@given(n=st.integers(1, 10_000_000),
       bands=st.integers(1, 512), bits=st.integers(1, 64))
def test_explicit_overrides_verbatim(n, bands, bits):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert lsh_schedule(n, design_cos=0.4, n_bands=bands,
                            band_bits=bits) == (bands, bits)


def test_bucket_growth_warning_names_the_tradeoff():
    """Past the cap boundary the schedule shortens codes and says so;
    the warning carries the grown bucket estimate (actionable for a
    reader sizing the join)."""
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bands, bits = lsh_schedule(100_000_000, design_cos=0.4)
    assert bands <= MAX_BANDS
    assert bits < math.ceil(math.log2(100_000_000 / 64))  # shortened
    msgs = [str(w.message) for w in caught]
    assert any("shortened codes" in m and "bucket rows" in m for m in msgs)
    # and the returned schedule still meets the pin per the model
    assert _recall(0.4, bands, bits) >= DESIGN_RECALL - 1e-9
