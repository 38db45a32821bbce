"""Corpus-preparation filters (operators/corpusprep.py): crafted-input
semantics the oracle comparison can't see (it only proves Spark ==
DuckDB, not that either implements the intended filter), plus
determinism and stratum-mass invariants."""

import hashlib
import tempfile

import pandas as pd
import pytest

from jerex_spark.operators.corpusprep import (DUP_FRAC_MAX, EMAIL_TOKEN,
                                              MIN_GRAMS_FOR_FLAG, PHONE_TOKEN,
                                              REBALANCE_SALT, decontaminate,
                                              doc_repetition, lang_rebalance,
                                              pii_scrub)
from jerex_spark.operators.packing import SPLIT_SALT, TRAIN_LT, VALID_LT


def _bucket(doc_id: int, salt: str, mod: int) -> int:
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    return int(h[:4], 16) % mod


def _split_of(doc_id: int) -> str:
    b = _bucket(doc_id, SPLIT_SALT, 1000)
    return ("train" if b < TRAIN_LT
            else "valid" if b < VALID_LT else "test")


@pytest.fixture()
def tmp_corpus():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _write(spark, d, rows):
    spark.createDataFrame(pd.DataFrame(rows)).write.mode(
        "overwrite").parquet(f"{d}/documents.parquet")


def test_decontaminate_flags_shared_5gram(spark, tmp_corpus):
    """A train doc sharing a 5-gram with a test doc is contaminated;
    a disjoint train doc is not.  Split membership is derived from the
    same md5 math as hash_split, so the crafted corpus is stable."""
    test_id = next(i for i in range(10000) if _split_of(i) == "test")
    tr = [i for i in range(10000)
          if _split_of(i) == "train"][:2]
    leak = "alpha beta gamma delta epsilon"
    rows = {
        "doc_id": [test_id, tr[0], tr[1]],
        "text": [f"held out {leak} benchmark prompt",
                 f"training page with {leak} copied verbatim",
                 "completely unrelated training words only here"],
    }
    _write(spark, tmp_corpus, rows)
    out = {r["doc_id"]: r for r in
           decontaminate(spark, tmp_corpus).collect()}
    assert set(out) == set(tr)            # train rows only
    assert out[tr[0]]["contaminated"] and out[tr[0]]["n_overlap"] >= 1
    assert not out[tr[1]]["contaminated"]
    assert out[tr[1]]["n_overlap"] == 0
    for r in out.values():
        assert 0 <= r["n_overlap"] <= r["n_shingles"]


def test_decontaminate_short_doc_trivially_clean(spark, tmp_corpus):
    """A train doc too short to shingle appears with zeros, not
    dropped (the LEFT-join zero-row contract)."""
    tr = [i for i in range(10000) if _split_of(i) == "train"][:1]
    _write(spark, tmp_corpus,
           {"doc_id": tr, "text": ["too short"]})
    rows = decontaminate(spark, tmp_corpus).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_shingles"], r["n_overlap"], r["contaminated"]) == (0, 0,
                                                                    False)


def test_doc_repetition_crafted(spark, tmp_corpus):
    uniq = " ".join(f"w{i}" for i in range(21))   # 20 grams, all distinct
    _write(spark, tmp_corpus, {
        "doc_id": [1, 2, 3, 4],
        "text": [" ".join(["x"] * 25),             # 24 grams, 1 distinct
                 uniq,
                 "solo",                           # no 2-grams
                 "a b c d e"],                     # 4 grams — below the
    })                                             # flag's mass floor
    out = {r["doc_id"]: r for r in
           doc_repetition(spark, tmp_corpus).collect()}
    r1 = out[1]
    assert (r1["n_grams"], r1["n_distinct"], r1["top_count"]) == (24, 1, 24)
    assert r1["top_frac"] == 1.0 and r1["repetitive"]
    r2 = out[2]
    assert r2["dup_frac"] == 0.0 and not r2["repetitive"]
    r3 = out[3]
    assert (r3["n_grams"], r3["dup_frac"], r3["repetitive"]) == (0, 0.0,
                                                                 False)
    # short docs have pigeonhole-high top_frac but sit below the floor
    assert out[4]["top_frac"] >= 0.25 and not out[4]["repetitive"]
    assert 0 < DUP_FRAC_MAX < 1 and MIN_GRAMS_FOR_FLAG > 4


def test_lang_rebalance_mass_and_determinism(spark, sf001):
    rows = lang_rebalance(spark, sf001).collect()
    again = {(r["doc_id"], r["keep"]) for r in
             lang_rebalance(spark, sf001).collect()}
    assert {(r["doc_id"], r["keep"]) for r in rows} == again
    assert len(rows) == 500

    totals, kept = {}, {}
    for r in rows:
        totals[r["pred_lang"]] = totals.get(r["pred_lang"], 0) + r["n_tokens"]
        if r["keep"]:
            kept[r["pred_lang"]] = kept.get(r["pred_lang"], 0) + r["n_tokens"]
    mn = min(totals.values())
    # the min-mass stratum is kept whole (bucket < 65536 always)
    min_lang = min(totals, key=totals.get)
    assert kept[min_lang] == totals[min_lang]
    # every stratum's kept mass is ~min (unbiased estimator; generous
    # band for a 500-doc draw)
    for lang, k in kept.items():
        assert 0.5 * mn <= k <= 1.6 * mn, (lang, k, mn)
    # keep bit replays from public math: bucket * T < 65536 * min
    for r in rows:
        b = _bucket(r["doc_id"], REBALANCE_SALT, 65536)
        assert r["bucket"] == b
        assert r["keep"] == (b * totals[r["pred_lang"]] < 65536 * mn)


def test_pii_scrub_crafted(spark, tmp_corpus):
    _write(spark, tmp_corpus, {
        "doc_id": [1, 2, 3],
        "text": ["contact jane.doe+spam@example.co.uk or bob@x.io now",
                 "call +1 (555) 010-4477 or 555 010 9999 today",
                 "no pii in this row at all"],
    })
    out = {r["doc_id"]: r for r in pii_scrub(spark, tmp_corpus).collect()}
    r1 = out[1]
    assert r1["n_emails"] == 2 and r1["n_phones"] == 0
    assert r1["scrubbed"] == f"contact {EMAIL_TOKEN} or {EMAIL_TOKEN} now"
    r2 = out[2]
    assert r2["n_emails"] == 0 and r2["n_phones"] == 2
    assert "555" not in r2["scrubbed"]
    assert r2["scrubbed"].count(PHONE_TOKEN) == 2
    r3 = out[3]
    assert (r3["n_emails"], r3["n_phones"]) == (0, 0)
    assert r3["scrubbed"] == "no pii in this row at all"


def test_pii_scrub_zero_shuffle_plan(spark, sf001):
    plan = (pii_scrub(spark, sf001)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_repeated_spans_crafted(spark, tmp_corpus):
    """Cross-doc shared 5-gram flags one window per doc; an internal
    run of identical tokens merges consecutive windows into one
    maximal span; a unique doc emits nothing; short docs emit
    nothing."""
    shared = "alpha beta gamma delta epsilon"
    _write(spark, tmp_corpus, {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [f"{shared} zeta1",          # window 0 shared, window 1 unique
                 f"{shared} eta2",           # same shared window 0
                 "r r r r r r r",            # 3 windows, all the same gram
                 "u1 u2 u3 u4 u5 u6 u7",     # all unique
                 "tiny doc"],                # < k tokens: no windows
    })
    from jerex_spark.operators.corpusprep import repeated_spans
    out = repeated_spans(spark, tmp_corpus).collect()
    spans = {r["doc_id"]: r for r in out}
    assert sorted(spans) == [1, 2, 3]
    for d in (1, 2):
        r = spans[d]
        assert (r["span_start"], r["span_end"]) == (0, 4)
        assert r["n_windows"] == 1
        # "alpha..epsilon" occurs twice corpus-wide
        assert r["max_occurrences"] == 2
    r3 = spans[3]
    # windows at pos 0,1,2 all hash the same gram -> one merged span
    # covering the whole 7-token run; the gram occurs 3x corpus-wide
    assert (r3["span_start"], r3["span_end"]) == (0, 6)
    assert r3["n_windows"] == 3
    assert r3["max_occurrences"] == 3


def test_repeated_spans_merges_only_adjacent(spark, tmp_corpus):
    """Two repeated regions separated by unique tokens stay two
    spans (the break condition is pos - lag(pos) > 1)."""
    a = "a1 a2 a3 a4 a5"
    b = "b1 b2 b3 b4 b5"
    _write(spark, tmp_corpus, {
        "doc_id": [1, 2, 3],
        "text": [f"{a} gap1 gap2 gap3 gap4 gap5 {b}",
                 a, b],
    })
    from jerex_spark.operators.corpusprep import repeated_spans
    rows = sorted(
        ((r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
         for r in repeated_spans(spark, tmp_corpus).collect()))
    # doc 1: tokens 0-4 = a (window pos 0), tokens 10-14 = b (pos 10);
    # intervening windows straddle the gap and are unique
    assert rows == [(1, 0, 4, 1), (1, 10, 14, 1),
                    (2, 0, 4, 1), (3, 0, 4, 1)]


def test_vocab_topk_tiebreak_and_plan(spark, tmp_corpus):
    """The cut at n is deterministic (count DESC, tok ASC) and the
    physical plan is TakeOrderedAndProject — per-partition heaps, not
    a global Sort of the vocabulary."""
    from jerex_spark.operators.textops import vocab_topk
    # b and c tie at 2 occurrences; n=2 must keep a (3x) and b (tie
    # broken by token string), never c
    _write(spark, tmp_corpus, {
        "doc_id": [1, 2],
        "text": ["a b c a", "a c b"],
    })
    rows = vocab_topk(spark, tmp_corpus, n=2).collect()
    got = {r["tok"]: (r["n_occurrences"], r["n_docs"]) for r in rows}
    assert got == {"a": (3, 2), "b": (2, 2)}
    plan = (vocab_topk(spark, tmp_corpus)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan, plan
