"""Cross-engine exercise of the INTRA-SENTENCE span restriction.

The driver corpus has no sentence punctuation (every doc is one
sentence), so its oracle rows never distinguish the sentence-aware
closed forms from the whole-doc ones.  This suite writes a
MULTI-SENTENCE documents table (the synthetic pages corpus, which ends
every sentence with '.') plus hand-picked edge docs, then runs the
same Spark-vs-DuckDB query pairs the driver runs:

* ``kg_token_stats`` — the real mapInPandas tokenizer vs the SQL
  closed form (the only cross-engine view into the UDF black box)
* ``p1_span_candidates`` / ``p1_spans_rel`` — the relational P1 pair

and asserts the restriction actually bites (fewer spans than the
whole-doc formula would give).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

EDGE_DOCS = [
    "one two three. four five! six? seven",      # 4 sentences, mixed EOS
    "single sentence with no punctuation at all",
    "a. b. c. d.",                               # 1-token sentences
    "trailing period ends the doc.",
    "double  spaced   tokens. and a second sentence.",
    "",                                          # empty doc: (0, 0) row
    "   ",                                       # whitespace-only doc
]


@pytest.fixture(scope="module")
def sent_dir(tmp_path_factory):
    from jerex_spark.corpus import make_page
    rows = [{"doc_id": i, "source": "pages", "lang": "en",
             "text": make_page(i)["text"]} for i in range(60)]
    for j, t in enumerate(EDGE_DOCS):
        rows.append({"doc_id": 60 + j, "source": "pages", "lang": "en",
                     "text": t})
    d = str(tmp_path_factory.mktemp("sentcorpus"))
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"),
                                  index=False)
    return d


@pytest.fixture(scope="module")
def sent_ddb(sent_dir):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sent_dir}/documents.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _compare(sdf, con, sql, name):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), name
    assert len(srows) == len(drows), (
        f"{name}: rowcount spark={len(srows)} duckdb={len(drows)}")
    assert _rowset(srows, scols) == _rowset(drows, dcols), name
    return srows


def test_kg_token_stats_multisentence(spark, sent_dir, sent_ddb):
    """Real tokenizer (UDF) vs SQL closed form on 2+-sentence docs."""
    from jerex_spark.config import DEFAULT
    from jerex_spark.operators.kg import KG_TOKEN_STATS_SQL, kg_token_stats
    rows = _compare(kg_token_stats(spark, sent_dir), sent_ddb,
                    KG_TOKEN_STATS_SQL, "kg_token_stats")
    # the restriction must bite: for some doc, per-sentence spans <
    # the whole-doc closed form
    S = DEFAULT.max_span_size
    bit = 0
    for _, n_tok, n_spans in rows:
        k = min(S, n_tok)
        whole = k * (n_tok + 1) - k * (k + 1) // 2
        assert n_spans <= whole
        if n_spans < min(whole, DEFAULT.max_spans_per_doc):
            bit += 1
    assert bit >= 50, f"only {bit} docs exercised the restriction"


def test_p1_pair_multisentence(spark, sent_dir, sent_ddb):
    from jerex_spark.operators.textops import (P1_COUNT_SQL, P1_SPANS_SQL,
                                               p1_span_candidates,
                                               p1_spans_rel)
    _compare(p1_span_candidates(spark, sent_dir), sent_ddb,
             P1_COUNT_SQL, "p1_span_candidates")
    spans = _compare(p1_spans_rel(spark, sent_dir), sent_ddb,
                     P1_SPANS_SQL, "p1_spans_rel")
    # edge doc 62 = 'a. b. c. d.' -> 4 sentences of 1 token: exactly
    # 4 size-1 spans, none larger
    d62 = [(s, e) for d, s, e in spans if d == 62]
    assert sorted(d62) == [(0, 1), (1, 2), (2, 3), (3, 4)]
    # edge doc 60: sentences of 3/2/1/1 tokens -> no span crosses a
    # sentence boundary (boundaries after token 3, 5, 6)
    d60 = [(s, e) for d, s, e in spans if d == 60]
    for s, e in d60:
        assert not (s < 3 < e or s < 5 < e or s < 6 < e), (s, e)


def test_spark_python_sentence_agreement(spark, sent_dir):
    """The Catalyst sentence splitter (_sent_tok_arrays) must agree
    with the Python tokenizer's split_sentences on every doc."""
    from jerex_spark.operators.textops import _sent_tok_arrays
    from jerex_spark.tokenization import split_sentences
    df = (spark.read.parquet(f"{sent_dir}/documents.parquet")
          .select("doc_id", "text", _sent_tok_arrays().alias("sents"))
          .collect())
    for r in df:
        assert [list(x) for x in r.sents] == split_sentences(r.text), \
            r.doc_id
