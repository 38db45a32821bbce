"""Text-analysis operators over the documents table.

Covers the relationally-expressible slices of the KG pipeline (span
candidate enumeration P1, ref sampling_common.py:77-98) plus the
training-data-pipeline text ops: token counting, quality scoring,
language-ID heuristic, document fingerprinting, simhash.  Every
operator is pure JVM-side Catalyst expressions (no Python UDFs) with a
DuckDB oracle.

The P1 queries are SENTENCE-AWARE (the span enumeration's key
semantic, ref sampling_common.py:85-96: spans never cross sentence
boundaries): Spark splits sentences with the tokenizer's own lookbehind
regex, DuckDB (no lookbehind in RE2) derives sentence ids from a
running sum of end-of-sentence token flags — equivalent because a
sentence break occurs exactly after a token ending in [.!?].  On the
punctuation-free driver corpus both degenerate to the whole-doc form;
tests/test_oracle_sentences.py runs the same pairs cross-engine on a
multi-sentence corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..config import DEFAULT as CFG

def _toks():
    return F.split(F.col("text"), " ")


# tokenization.split_sentences equivalents (JVM-side):
# sentences -> per-sentence token arrays, empties dropped
def _sent_tok_arrays():
    return F.filter(
        F.transform(F.split(F.col("text"), r"(?<=[.!?])\s+"),
                    lambda s: F.filter(F.split(s, r"\s+"),
                                       lambda x: x != "")),
        lambda a: F.size(a) > 0)


_EOS_SENT_SQL = """
tok AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS idx, unnest(l) AS t
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS l
        FROM documents)),
sent_ids AS (
  SELECT doc_id, idx,
         COALESCE(SUM(CASE WHEN regexp_matches(t, '[.!?]$')
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY idx
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS sent_id
  FROM tok),
sent AS (
  SELECT doc_id, sent_id, MIN(idx) AS base, COUNT(*) AS n
  FROM sent_ids GROUP BY doc_id, sent_id)
"""


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- P1 closed form: candidate span count per document ------------------
def p1_span_candidates(spark, sf_dir):
    """Per-sentence size-1..max_span_size closed form, summed per doc
    (spans never cross sentences — the P1 restriction)."""
    lens = _sent_tok_arrays()
    n_tokens = F.aggregate(lens, F.lit(0),
                           lambda a, s: a + F.size(s))

    def term(a, s):
        n = F.size(s)
        k = F.least(F.lit(CFG.max_span_size), n)
        return a + (k * (n + 1) - (k * (k + 1) / 2)).cast("long")

    n_spans = F.aggregate(lens, F.lit(0).cast("long"), term)
    return _docs(spark, sf_dir).select(
        "doc_id", n_tokens.alias("n_tokens"), n_spans.alias("n_spans"))


P1_COUNT_SQL = f"""
WITH {_EOS_SENT_SQL},
agg AS (
  SELECT doc_id, SUM(n) AS n_tokens,
         SUM(least({CFG.max_span_size}, n) * (n + 1)
             - least({CFG.max_span_size}, n)
               * (least({CFG.max_span_size}, n) + 1) // 2) AS raw
  FROM sent GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(agg.n_tokens, 0) AS INT) AS n_tokens,
       CAST(COALESCE(agg.raw, 0) AS BIGINT) AS n_spans
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""
# ^ LEFT JOIN back to documents: an empty/whitespace-only doc yields no
#   tok rows, but the Spark twin still emits its (0, 0) row — without
#   the join the doc vanishes from the oracle side only.


# --- P1 relational: exploded span table (sizes 1..3), intra-sentence ----
def p1_spans_rel(spark, sf_dir):
    from pyspark.sql.window import Window
    d = _docs(spark, sf_dir).select(
        "doc_id", _sent_tok_arrays().alias("sents"))
    s = (d.select("doc_id",
                  F.posexplode("sents").alias("sent_id", "stoks"))
         .select("doc_id", "sent_id", F.size("stoks").alias("n")))
    w = (Window.partitionBy("doc_id").orderBy("sent_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    s = s.withColumn("base", F.coalesce(F.sum("n").over(w), F.lit(0)))
    return (s.select("doc_id", "base", "n",
                     F.explode(F.sequence(F.lit(1), F.lit(3)))
                     .alias("size"))
            .filter(F.col("size") <= F.col("n"))
            .select("doc_id", "size",
                    F.explode(F.sequence(
                        F.col("base"),
                        F.col("base") + F.col("n") - F.col("size")))
                    .alias("start"))
            .select("doc_id", "start",
                    (F.col("start") + F.col("size")).alias("end")))


P1_SPANS_SQL = f"""
WITH {_EOS_SENT_SQL},
spans AS (
  SELECT doc_id, base, sz.size AS size,
         unnest(generate_series(0, n - sz.size)) AS off
  FROM sent, (SELECT unnest(generate_series(1, 3)) AS size) sz
  WHERE n >= sz.size)
SELECT doc_id, base + off AS start, base + off + size AS "end"
FROM spans
"""


# --- flat token table (two-coordinate bookkeeping lives in the UDF
#     stage; this is the relational projection) --------------------------
def tokens_flat(spark, sf_dir):
    return (_docs(spark, sf_dir)
            .select("doc_id", F.posexplode(_toks()).alias("tok_idx", "phrase")))


TOKENS_SQL = """
SELECT doc_id,
       generate_subscripts(string_split(text, ' '), 1) - 1 AS tok_idx,
       unnest(string_split(text, ' ')) AS phrase
FROM documents
"""


# --- token counting: whitespace + word-regex --------------------------
def token_count(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(_toks()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+"), 0))
        .alias("n_word_tokens"),
        F.length("text").alias("n_chars"))


TOKEN_COUNT_SQL = """
SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
       length(text) AS n_chars
FROM documents
"""


# --- corpus vocabulary: top-k tokens (tokenizer-prep) -------------------
VOCAB_TOPK_N = 256


def vocab_topk(spark, sf_dir, n: int = VOCAB_TOPK_N):
    """(tok, n_occurrences, n_docs): the corpus's top-``n`` whitespace
    tokens by total occurrence count — the seed-vocabulary scan a
    BPE/WordPiece tokenizer build starts from.  Ties at the cut break
    deterministically by token string (count DESC, tok ASC), so the
    selected set is identical across engines and retries.  The plan is
    one partial-aggregable groupBy followed by TakeOrderedAndProject —
    per-partition top-n then a driver merge of n-row heaps, never a
    global sort of the vocabulary: safe at any corpus size."""
    toks = (_docs(spark, sf_dir)
            .select("doc_id", F.explode(_toks()).alias("tok")))
    counts = toks.groupBy("tok").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"))
    return (counts
            .orderBy(F.col("n_occurrences").desc(), F.col("tok").asc())
            .limit(n))


VOCAB_TOPK_SQL = f"""
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY n_occurrences DESC, tok ASC
LIMIT {VOCAB_TOPK_N}
"""


# --- quality scoring: stopword ratio + length --------------------------
_STOPWORDS = ("the", "key", "scan", "join", "row")


def _quality_parts():
    """(n_tokens, n_stopwords) Columns over ``text``."""
    toks = _toks()
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return F.size(toks), n_stop


def quality_expr():
    """The quality score as a bare Column over ``text`` — lets composed
    pipelines (operators/curation.py) fold it into an existing
    documents scan instead of joining ``quality_score``'s output."""
    n, n_stop = _quality_parts()
    return F.round(0.5 * (n_stop / n)
                   + 0.5 * F.least(F.lit(1.0), n / F.lit(100.0)), 4)


def quality_score(spark, sf_dir):
    n, n_stop = _quality_parts()
    return _docs(spark, sf_dir).select(
        "doc_id", n.alias("n_tokens"), n_stop.alias("n_stopwords"),
        F.round(n_stop / n, 4).alias("stop_ratio"),
        quality_expr().alias("quality"))


QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
x AS (
  SELECT doc_id, len(l) AS n_tokens,
         len(list_filter(l, t -> list_contains({list(_STOPWORDS)}, t)))
           AS n_stopwords
  FROM t)
SELECT doc_id, n_tokens, n_stopwords,
       ROUND(n_stopwords / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
       ROUND(0.5 * n_stopwords / CAST(n_tokens AS DOUBLE)
             + 0.5 * least(1.0, n_tokens / 100.0), 4) AS quality
FROM x
"""


# --- language-ID: marker-ngram count heuristic --------------------------
_LANG_MARKERS = [("en", "th"), ("de", "ch"), ("es", "rt"), ("fr", "re")]


def _marker_count(col, marker):
    return ((F.length(col) - F.length(F.replace(col, F.lit(marker),
                                                F.lit(""))))
            / len(marker)).cast("long")


def _lang_argmax(scores):
    """Argmax over {lang: score Column} with deterministic priority
    order on ties (earlier _LANG_MARKERS entry wins)."""
    pred = F.lit("unk")
    best = F.lit(-1).cast("long")
    for lang, _ in _LANG_MARKERS:
        cond = scores[lang] > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, scores[lang]).otherwise(best)
    return pred


def pred_lang_expr():
    """Predicted language as a bare Column over ``text`` (same
    expression ``langid_ngram`` projects) — for single-scan
    composition in operators/curation.py."""
    return _lang_argmax({lang: _marker_count(F.col("text"), m)
                         for lang, m in _LANG_MARKERS})


def langid_ngram(spark, sf_dir):
    d = _docs(spark, sf_dir)
    cols = [_marker_count(F.col("text"), m).alias(f"s_{lang}")
            for lang, m in _LANG_MARKERS]
    d = d.select("doc_id", "lang", *cols)
    pred = _lang_argmax({lang: F.col(f"s_{lang}")
                         for lang, _ in _LANG_MARKERS})
    return d.select("doc_id", "lang", *[f"s_{lang}" for lang, _ in
                                        _LANG_MARKERS], pred.alias("pred"))


def _langid_sql():
    score = {lang: f"CAST((length(text) - length(replace(text, '{m}', '')))"
                   f" / {len(m)} AS BIGINT)"
             for lang, m in _LANG_MARKERS}
    cols = ",\n       ".join(f"{v} AS s_{k}" for k, v in score.items())
    # same priority order as the Spark loop: later langs win only on >
    langs = [lang for lang, _ in _LANG_MARKERS]
    pred = "CASE"
    for i, lang in enumerate(reversed(langs)):
        others = [x for x in langs if langs.index(x) < langs.index(lang)]
        cond = " AND ".join([f"s_{lang} > s_{o}" for o in others]) or "TRUE"
        pred += f" WHEN {cond} THEN '{lang}'"
    pred += " END"
    return (f"WITH x AS (SELECT doc_id, lang,\n       {cols}\n"
            f"FROM documents)\n"
            f"SELECT doc_id, lang, s_en, s_de, s_es, s_fr, {pred} AS pred "
            f"FROM x")


# --- document fingerprint: bottom-k sketch over 3-gram shingles --------
def fingerprint_bottomk(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("l"))
    # pre-filter: size("l") >= 3 BEFORE the transform — on a shorter doc
    # sequence(0, size-3) is descending and slice(l, 0, 3) raises; the
    # DuckDB oracle applies the same len(l) >= 3 guard
    sh = (d.filter(F.size("l") >= 3)
          .select("doc_id",
                  F.explode(F.transform(
                      F.sequence(F.lit(0), F.size("l") - 3),
                      lambda i: F.concat_ws(" ", F.slice("l", i + 1, 3))))
                  .alias("shingle")))
    return sh.groupBy("doc_id").agg(
        F.concat_ws("|", F.slice(F.array_sort(
            F.collect_set(F.md5("shingle"))), 1, 4)).alias("fingerprint"),
        F.countDistinct("shingle").alias("n_shingles"))


FINGERPRINT_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (SELECT doc_id,
              array_to_string(l[i + 1:i + 3], ' ') AS shingle
       FROM (SELECT doc_id, l,
                    unnest(generate_series(0, len(l) - 3)) AS i
             FROM t WHERE len(l) >= 3)),
u AS (SELECT DISTINCT doc_id, md5(shingle) AS h FROM sh)
SELECT doc_id,
       array_to_string(list_sort(list(h))[1:4], '|') AS fingerprint,
       COUNT(*) AS n_shingles
FROM u GROUP BY doc_id
"""


# --- simhash (32-bit) over whitespace tokens ----------------------------
def simhash32(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(_toks()).alias("tok_idx", "tok"))
    d = d.select("doc_id", F.md5("tok").alias("h"),
                 F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
    bit = F.expr(
        "shiftright(instr('0123456789abcdef', "
        "substring(h, cast(b div 4 as int) + 1, 1)) - 1, "
        "cast(3 - b % 4 as int)) & 1")
    d = d.select("doc_id", "b", (2 * bit - 1).alias("c"))
    per_bit = d.groupBy("doc_id", "b").agg(
        F.when(F.sum("c") >= 0, 1).otherwise(0).alias("sbit"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.expr("shiftleft(cast(sbit as bigint), cast(b as int))"))
        .alias("simhash"))


SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
bits AS (
  SELECT doc_id, b.b,
         ((strpos('0123456789abcdef',
                  substr(h, CAST(b.b // 4 AS INT) + 1, 1)) - 1)
          >> CAST(3 - b.b % 4 AS INT)) & 1 AS bit
  FROM tok, (SELECT unnest(generate_series(0, 31)) AS b) b),
per_bit AS (
  SELECT doc_id, b,
         CASE WHEN SUM(2 * bit - 1) >= 0 THEN 1 ELSE 0 END AS sbit
  FROM bits GROUP BY doc_id, b)
SELECT doc_id,
       CAST(SUM(CAST(sbit AS BIGINT) << CAST(b AS INT)) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
"""


# --- per-language corpus profile ----------------------------------------
def lang_profile(spark, sf_dir):
    return _docs(spark, sf_dir).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(F.avg(F.size(_toks())), 2).alias("avg_tokens"))


LANG_PROFILE_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       ROUND(AVG(len(string_split(text, ' '))), 2) AS avg_tokens
FROM documents GROUP BY lang
"""


# --- multimodal plumbing: opaque binary payload + typed metadata --------
def mm_binary_meta(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    return d.select(
        "doc_id", F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"))


MM_META_SQL = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


# --- J1/J2/F10 relational form: coref candidate pairs over gazetteer
#     mentions with token-distance and edit-distance features ------------
_GAZ = ("scan", "join", "merge", "stream", "window")


def j1_coref_pairs_rel(spark, sf_dir):
    toks = (_docs(spark, sf_dir)
            .select("doc_id", F.posexplode(_toks())
                    .alias("tok_idx", "phrase"))
            .filter(F.col("phrase").isin(*_GAZ)))
    a = toks.select("doc_id", F.col("tok_idx").alias("i1"),
                    F.col("phrase").alias("p1"))
    b = toks.select("doc_id", F.col("tok_idx").alias("i2"),
                    F.col("phrase").alias("p2"))
    return (a.join(b, "doc_id")
            .filter(F.col("i1") < F.col("i2"))
            .select("doc_id", "i1", "i2", "p1", "p2",
                    # F10 (ref sampling_common.py:297-315): distance to
                    # the first mention's LAST token; size-1 spans ->
                    # i2 - (i1 + 1) + 1 = i2 - i1
                    (F.col("i2") - F.col("i1")).alias("tok_dist"),
                    F.levenshtein("p1", "p2").alias("edit_dist")))


J1_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS tok_idx,
         unnest(string_split(text, ' ')) AS phrase
  FROM documents),
m AS (SELECT * FROM toks WHERE phrase IN {_GAZ})
SELECT a.doc_id, a.tok_idx AS i1, b.tok_idx AS i2,
       a.phrase AS p1, b.phrase AS p2,
       b.tok_idx - a.tok_idx AS tok_dist,
       levenshtein(a.phrase, b.phrase) AS edit_dist
FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.tok_idx < b.tok_idx
"""


# --- tf-idf distinctive terms: per-doc top-k by (tf DESC, df ASC) -------
TFIDF_TOPK_K = 3


def tfidf_topk(spark, sf_dir, k: int = TFIDF_TOPK_K):
    """(doc_id, term, tf, df, rank): each document's ``k`` most
    distinctive whitespace terms under the integer tf-idf dominance
    order — term frequency DESC, then document frequency ASC (rarer
    wins), then term ASC.  This is the ordering tf·idf induces at equal
    tf (idf is strictly decreasing in df); the fp idf value itself is
    deliberately NOT emitted — ln() is not reproducible bitwise across
    engines, and the consumer can compute any idf variant from the
    exact (tf, df, corpus size) integers this row carries.

    Plan: one partial-aggregable groupBy for tf, one for df (both
    shuffle on bounded-cardinality keys), an equi-join on term, and a
    per-doc top-k window PARTITIONED BY doc_id — never a global
    window/sort, so at 100 TB the per-doc heap stays partition-local
    and the df table scales with the vocabulary, not the corpus."""
    from pyspark.sql.window import Window
    tf = (_docs(spark, sf_dir)
          .select("doc_id", F.explode(_toks()).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    # tf rows are distinct (doc, term), so df = row count per term
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (tf.join(df_, "term")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df",
                    F.col("rank").cast("long").alias("rank")))


TFIDF_TOPK_SQL = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY doc_id, term),
dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank
FROM (SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, dfr.df ASC,
                                         tf.term ASC) AS rank
      FROM tf JOIN dfr USING (term))
WHERE rank <= {TFIDF_TOPK_K}
"""


# --- BPE merge-candidate scan: corpus-weighted symbol-pair counts -------
BPE_TOPK = 20


def bpe_pair_counts(spark, sf_dir, k: int = BPE_TOPK):
    """(pair, pair_count): the corpus's ``k`` most frequent adjacent
    character pairs inside whitespace terms, each occurrence weighted
    by the term's corpus frequency — the candidate-scoring step of one
    BPE vocabulary-learning iteration (Sennrich et al. 2016), the op a
    training-data pipeline runs to fit its tokenizer.

    Scale shape: the pair explosion runs over the DISTINCT term table
    (vocabulary-sized — Zipf keeps it tiny relative to the corpus)
    with the corpus weight carried as an integer column, so corpus
    growth only deepens the first partial-aggregable groupBy; the
    explode and the second groupBy scale with the vocabulary.  Top-k is
    a global orderBy+limit — Spark plans TakeOrderedAndProject
    (per-partition heaps, no global sort/window).  Determinism: counts
    are exact integers; the k-boundary tie-breaks by pair ASC.

    Guard: ``sequence(1, n)`` in Spark DESCENDS for n < 1 (it would
    fabricate positions for 1-char terms), so terms shorter than 2
    chars are filtered before the explode."""
    tf = (_docs(spark, sf_dir)
          .select(F.explode(_toks()).alias("term"))
          .filter(F.col("term") != "")
          .groupBy("term").agg(F.count("*").alias("tcnt")))
    pairs = (tf.filter(F.length("term") >= 2)
             .select("tcnt", F.explode(F.expr(
                 "transform(sequence(1, char_length(term) - 1),"
                 " i -> substring(term, i, 2))")).alias("pair")))
    return (pairs.groupBy("pair")
            .agg(F.sum("tcnt").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
            .limit(k))


BPE_PAIR_SQL = f"""
WITH tf AS (
  SELECT term, COUNT(*) AS tcnt
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY term),
pr AS (
  SELECT substring(term, unnest(generate_series(1, length(term) - 1)),
                   2) AS pair,
         tcnt
  FROM tf WHERE length(term) >= 2)
SELECT pair, CAST(SUM(tcnt) AS BIGINT) AS pair_count
FROM pr GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT {BPE_TOPK}
"""


QUERIES = {
    "p1_span_candidates": (p1_span_candidates, P1_COUNT_SQL),
    "j1_coref_pairs_rel": (j1_coref_pairs_rel, J1_SQL),
    "p1_spans_rel": (p1_spans_rel, P1_SPANS_SQL),
    "tokens_flat": (tokens_flat, TOKENS_SQL),
    "token_count": (token_count, TOKEN_COUNT_SQL),
    "quality_score": (quality_score, QUALITY_SQL),
    "vocab_topk": (vocab_topk, VOCAB_TOPK_SQL),
    "tfidf_topk": (tfidf_topk, TFIDF_TOPK_SQL),
    "bpe_pair_counts": (bpe_pair_counts, BPE_PAIR_SQL),
    "langid_ngram": (langid_ngram, _langid_sql()),
    "fingerprint_bottomk": (fingerprint_bottomk, FINGERPRINT_SQL),
    "simhash32": (simhash32, SIMHASH_SQL),
    "lang_profile": (lang_profile, LANG_PROFILE_SQL),
    "mm_binary_meta": (mm_binary_meta, MM_META_SQL),
}
