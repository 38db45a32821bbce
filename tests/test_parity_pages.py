"""T2b: triple parity on the PAGES corpus — multi-sentence documents
(the driver `documents` table has no sentence punctuation, so this is
the only end-to-end exercise of intra-sentence span restriction,
cross-sentence distances, and sentence indexing against the reference
executor)."""

from __future__ import annotations

import pytest

from jerex_spark.corpus import make_pages
from jerex_spark.extract import extract_graph
from jerex_spark.pipeline import kg_tables
from jerex_spark.reference_executor import run_document, triple_identity

N_PAGES = 150


@pytest.fixture(scope="module")
def pages():
    return make_pages(N_PAGES)


@pytest.fixture(scope="module")
def golden(pages):
    return {r.url: run_document(r.url, r.text)
            for r in pages.itertuples(index=False)}


@pytest.fixture(scope="module")
def spark_graph(spark, pages):
    pdf = pages[["url", "text"]].rename(columns={"url": "doc_key"})
    g = extract_graph(spark.createDataFrame(pdf)).persist()
    g.count()
    yield g
    g.unpersist()


def test_multisentence_fixture_is_real(golden, pages):
    # the corpus really exercises multi-sentence docs and mentions
    assert pages.text.str.count(r"\.").gt(1).any()
    n_mentions = sum(len(r.mentions) for r in golden.values())
    n_triples = sum(len(r.triples) for r in golden.values())
    assert n_mentions > 100 and n_triples > 10
    sents = {m["sent_idx"] for r in golden.values() for m in r.mentions}
    assert len(sents) > 1   # mentions in non-first sentences


def test_pages_triple_parity(spark_graph, golden):
    spark_set = set()
    for r in kg_tables(spark_graph)["triples"].collect():
        spark_set.add((
            r.doc_key,
            tuple((s.start, s.end) for s in r.head_key), r.head_type,
            tuple((s.start, s.end) for s in r.tail_key), r.tail_type,
            r.rel_type))
    gold = {triple_identity(k, t)
            for k, res in golden.items() for t in res.triples}
    assert spark_set == gold


def test_pages_mention_parity_with_sentences(spark_graph, golden):
    spark_m = {(r.doc_key, r.start, r.end, r.sent_idx)
               for r in kg_tables(spark_graph)["mentions"].collect()}
    gold_m = {(k, m["start"], m["end"], m["sent_idx"])
              for k, res in golden.items() for m in res.mentions}
    assert spark_m == gold_m


def test_cap_path_parity(spark):
    """Documents dense enough to exceed max_mentions_per_doc exercise
    the score-ordered cap + tie-break identically on both sides."""
    texts = {
        f"cap/{i}": " ".join(f"tok{(j + i) % 7}" for j in range(1500))
        for i in range(4)}
    golden = {k: run_document(k, t) for k, t in texts.items()}
    assert any(len(r.mentions) == 128 for r in golden.values()), \
        "fixture does not hit the cap"
    pdf_rows = [(k, t) for k, t in texts.items()]
    g = extract_graph(spark.createDataFrame(pdf_rows, ["doc_key", "text"]))
    spark_m = {(r.doc_key, r.start, r.end, round(r.score, 4))
               for r in kg_tables(g)["mentions"].collect()}
    gold_m = {(k, m["start"], m["end"], round(m["score"], 4))
              for k, res in golden.items() for m in res.mentions}
    assert spark_m == gold_m


def test_truncation_flags_logged_not_silent(spark):
    """SURVEY §7.3 item 4: per-doc caps set truncation flags — a dense
    1500-token doc caps spans/mentions/pairs and says so; a small doc
    does not."""
    rows = [("dense", " ".join(f"tok{j % 7}" for j in range(1500))),
            ("small", "alpha beta gamma")]
    g = {r.doc_key: r for r in extract_graph(
        spark.createDataFrame(rows, ["doc_key", "text"])).collect()}
    d = g["dense"].truncated
    # default max_rel_pairs (16384) exceeds the max reachable pair
    # count (128 mentions -> <=128 entities -> 16256 pairs), so only
    # spans/mentions can cap under DEFAULT
    assert d.spans and d.mentions and not d.pairs
    s = g["small"].truncated
    assert not (s.spans or s.mentions or s.pairs)

    # pairs flag: exercised under a tightened budget on a doc with
    # many DISTINCT-phrase entities (same-phrase mentions coref-merge
    # into one entity, so the dense doc above has <2 entities)
    import dataclasses

    from jerex_spark.config import DEFAULT
    tight = dataclasses.replace(DEFAULT, max_rel_pairs_per_doc=5)
    rows2 = [("multi", " ".join(f"t{j}" for j in range(3000))),
             ("small", "alpha beta gamma")]
    g2 = {r.doc_key: r for r in extract_graph(
        spark.createDataFrame(rows2, ["doc_key", "text"]), tight)
        .collect()}
    assert len(g2["multi"].entities) >= 2
    assert g2["multi"].truncated.pairs
    assert not g2["small"].truncated.pairs
