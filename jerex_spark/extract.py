"""Spark extract stage: documents -> (mentions, entities, triples).

The JEREX core (SURVEY.md §7.1 step 3) as ONE fused ``mapInPandas``
operator: per Arrow batch, all scoring-head matmuls are executed once
across every document in the batch (span scoring, coref scoring,
mention-pair scoring are batch-level matrix ops with per-doc segment
reductions) — no per-row Python in the hot path.  Per-doc work that is
inherently sequential (tokenization, complete-linkage clustering over
<=~max_mentions mentions) stays tiny and executor-local.

Every stage is intra-document (ref jerex pairing is all per-doc —
SURVEY.md §2.3), so this stage is embarrassingly parallel: zero
shuffles, linear scaling with cores/executors.  Skew (long docs, hot
hosts) is handled by the salted repartition applied by the caller
(pipeline.py) before this operator.

Output is one nested row per document (doc graph); ``explode_*``
helpers project the flat mentions / entities / triples tables
(FIXTURES.md §3 schemas).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import scoring
from .clustering import complete_linkage
from .config import DEFAULT, PipelineConfig
from .tokenization import tokenize_document
from .weights import load_weights

DOC_GRAPH_SCHEMA = (
    "doc_key string, n_tokens int, n_spans int, "
    "mentions array<struct<mention_idx:int, sent_idx:int, start:int, "
    "end:int, sub_start:int, sub_end:int, phrase:string, score:double>>, "
    "entities array<struct<entity_idx:int, type:string, type_score:double, "
    "mention_idxs:array<int>, spans:array<struct<start:int, end:int>>>>, "
    "triples array<struct<head_idx:int, tail_idx:int, rel_type:string, "
    "score:double>>, "
    # per-doc cap truncation flags (SURVEY.md §7.3 item 4: caps are
    # logged, never silent) — consumers can count/alert on capped docs
    "truncated struct<spans:boolean, mentions:boolean, pairs:boolean>"
)


def _doc_candidates(text: str, cfg: PipelineConfig):
    """Tokenize one doc and enumerate intra-sentence span candidates
    (P1, ref sampling_common.py:77-98), capped at max_spans_per_doc.

    Returns (tok, starts, ends, sent_idx) as int64 arrays, in the same
    enumeration order as the reference (per sentence, size-major)."""
    tok = tokenize_document(text, cfg)
    st_parts, en_parts, si_parts = [], [], []
    base = 0
    for s_i, sent in enumerate(tok.sentences):
        n = len(sent)
        for size in range(1, cfg.max_span_size + 1):
            if n - size + 1 <= 0:
                break
            s = np.arange(base, base + n - size + 1, dtype=np.int64)
            st_parts.append(s)
            en_parts.append(s + size)
            si_parts.append(np.full(len(s), s_i, dtype=np.int64))
        base += n
    if not st_parts:
        z = np.zeros(0, dtype=np.int64)
        return tok, z, z, z, False
    all_starts = np.concatenate(st_parts)
    capped = len(all_starts) > cfg.max_spans_per_doc
    starts = all_starts[: cfg.max_spans_per_doc]
    ends = np.concatenate(en_parts)[: cfg.max_spans_per_doc]
    sent_idx = np.concatenate(si_parts)[: cfg.max_spans_per_doc]
    return tok, starts, ends, sent_idx, capped


def _extract_batch(pdf: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    w = load_weights(cfg)
    d = cfg.hidden_size
    docs = []           # per-doc dict state
    tokpools = []       # batch-level accumulators -> one pooling /
    span_starts = []    # matmul over the whole Arrow batch
    span_sizes = []
    span_off = 0
    tok_off = 0
    for doc_key, text in zip(pdf["doc_key"], pdf["text"]):
        tok, starts, ends, sent_idx, spans_capped = _doc_candidates(
            text or "", cfg)
        h = scoring.encode(tok.encoding, w, cfg)
        st = {"doc_key": doc_key, "tok": tok, "h": h,
              "starts": starts, "ends": ends, "sent_idx": sent_idx,
              "span_off": span_off, "spans_capped": spans_capped,
              "pairs_capped": False}
        span_off += len(starts)
        if len(starts):
            tok_ss = np.asarray(tok.sub_start, dtype=np.int64)
            tok_se = np.asarray(tok.sub_end, dtype=np.int64)
            ss = tok_ss[starts]
            se = tok_se[ends - 1]
            # per-token max now; the power-of-two window max runs ONCE
            # over the whole batch below
            tokpools.append(scoring.token_maxpool(h, tok_ss, tok_se))
            span_starts.append(starts + tok_off)
            span_sizes.append(ends - starts)
            tok_off += len(tok_ss)
            st["sub_s"], st["sub_e"] = ss, se
        docs.append(st)

    # A1 span pooling + F2 mention scoring, each ONE call per batch.
    # Hierarchical pooling (per-token max, then exact power-of-two
    # window max) gives the same values as the direct sub-word gather
    # at ~10x less memory traffic; batching the window max over the
    # concatenated token pools is bit-identical to per-doc calls —
    # every gather a span performs stays inside its own doc's rows
    # (start + size - 1 never crosses the doc end), so the sparse-table
    # levels' cross-doc rows are computed but never read.
    if tokpools:
        all_reprs = scoring.span_maxpool_windows(
            np.concatenate(tokpools), np.concatenate(span_starts),
            np.concatenate(span_sizes), cfg.max_span_size)
        all_probs = scoring.sigmoid(scoring.mention_logits(
            all_reprs, np.concatenate(span_sizes), w))
    else:
        all_reprs = np.zeros((0, d), dtype=np.float32)
        all_probs = np.zeros(0, dtype=np.float32)

    # per-doc threshold filter + cap (P2) — vectorized
    cor_m1, cor_m2, cor_bk = [], [], []
    cor_n = 0
    for st in docs:
        tok = st["tok"]
        ns = len(st["starts"])
        off = st["span_off"]
        probs = all_probs[off:off + ns]
        kept = np.where(probs >= cfg.mention_threshold)[0]
        st["mentions_capped"] = len(kept) > cfg.max_mentions_per_doc
        if len(kept) > cfg.max_mentions_per_doc:
            # cap keeps highest scores, ties by (start, end)
            order = np.lexsort((st["ends"][kept], st["starts"][kept],
                                -probs[kept]))
            kept = kept[order[: cfg.max_mentions_per_doc]]
        if len(kept):
            kept = kept[np.lexsort((st["ends"][kept], st["starts"][kept]))]
        ms = []
        for m_i, i in enumerate(kept):
            s, e = int(st["starts"][i]), int(st["ends"][i])
            ms.append({"mention_idx": m_i, "sent_idx": int(st["sent_idx"][i]),
                       "start": s, "end": e,
                       "sub_start": int(st["sub_s"][i]),
                       "sub_end": int(st["sub_e"][i]),
                       "phrase": " ".join(tok.phrases[s:e]),
                       "score": float(probs[i])})
        st["mentions"] = ms
        # parallel column arrays for the relations stage (gathered once
        # here instead of np.fromiter over the dicts per doc there);
        # zero-span docs never set sub_s/sub_e (kept is empty then)
        z = np.zeros(0, dtype=np.int64)
        st["m_start"] = st["starts"][kept]
        st["m_end"] = st["ends"][kept]
        st["m_ss"] = st.get("sub_s", z)[kept]
        st["m_se"] = st.get("sub_e", z)[kept]
        st["m_sent"] = st["sent_idx"][kept]
        st["mrepr"] = (all_reprs[off:off + ns][kept]
                       if len(kept) else np.zeros((0, d), dtype=np.float32))
        # J1/J2: upper-triangle coref pairs — vectorized gathers; only
        # the edit-distance DP stays a (memoized) per-pair loop
        nm = len(ms)
        st["cor_off"] = cor_n
        if nm > 1:
            iu, ju = scoring.triu_pairs(nm)
            phrases = [m["phrase"] for m in ms]
            cor_bk.append(np.fromiter(
                (min(scoring.edit_distance(phrases[i], phrases[j]),
                     cfg.edit_dist_buckets - 1)
                 for i, j in zip(iu, ju)), np.int64, count=len(iu)))
            cor_m1.append(st["mrepr"][iu])
            cor_m2.append(st["mrepr"][ju])
            cor_n += len(iu)

    # F3 coref scoring: one matmul over every pair in the batch
    if cor_n:
        cor_sims = scoring.sigmoid(scoring.coref_logits(
            np.concatenate(cor_m1), np.concatenate(cor_m2),
            np.concatenate(cor_bk), w))
    else:
        cor_sims = np.zeros(0, dtype=np.float32)

    # C1 clustering + A2/F4 entity pooling/typing (batch matmul)
    ent_reprs_acc = []
    ent_off = 0
    for st in docs:
        nm = len(st["mentions"])
        dist = np.zeros((nm, nm), dtype=np.float32)
        if nm > 1:
            k = st["cor_off"]
            n_pairs = nm * (nm - 1) // 2
            iu = scoring.triu_pairs(nm)
            dist[iu] = 1.0 - cor_sims[k:k + n_pairs]
        clusters = complete_linkage(dist, 1.0 - cfg.coref_threshold)
        st["clusters"] = clusters
        st["ent_off"] = ent_off
        ent_off += len(clusters)
        for c in clusters:
            ent_reprs_acc.append(st["mrepr"][c].max(axis=0, keepdims=True))
    if ent_reprs_acc:
        all_ent = np.concatenate(ent_reprs_acc)
        et_logits = scoring.entity_type_logits(all_ent, w)
        et_probs = scoring.softmax(et_logits, axis=1)
        et_arg = np.argmax(et_logits, axis=1)   # ties -> lowest index (F4)
    else:
        all_ent = np.zeros((0, d), dtype=np.float32)
        et_probs = np.zeros((0, len(cfg.entity_types)), dtype=np.float32)
        et_arg = np.zeros(0, dtype=np.int64)

    # entity materialization (shared by both relation modes)
    for st in docs:
        clusters = st.get("clusters", [])
        st["entities"] = [{
            "entity_idx": e_i,
            "type": cfg.entity_types[int(et_arg[st["ent_off"] + e_i])],
            "type_score": float(
                et_probs[st["ent_off"] + e_i,
                         int(et_arg[st["ent_off"] + e_i])]),
            "mention_idxs": [int(m) for m in c],
            "spans": sorted((st["mentions"][m]["start"],
                             st["mentions"][m]["end"]) for m in c),
        } for e_i, c in enumerate(clusters)]
        st["triples"] = []

    if cfg.relation_mode == "global":
        _relations_global(docs, all_ent, et_arg, cfg, w)
    else:
        _relations_multi_instance(docs, all_ent, cfg, w)

    return pd.DataFrame({
        "doc_key": [st["doc_key"] for st in docs],
        "n_tokens": [len(st["tok"].phrases) for st in docs],
        "n_spans": [len(st["starts"]) for st in docs],
        "mentions": [st["mentions"] for st in docs],
        "entities": [st["entities"] for st in docs],
        "triples": [st["triples"] for st in docs],
        "truncated": [{"spans": bool(st["spans_capped"]),
                       "mentions": bool(st.get("mentions_capped", False)),
                       "pairs": bool(st["pairs_capped"])}
                      for st in docs],
    })


def _relations_multi_instance(docs: list, all_ent: np.ndarray,
                              cfg: PipelineConfig, w) -> None:
    """F5/F7/F8 + A3/A4: mention-pair expansion with multi-instance
    max-pool (ref relation_classification_multi_instance.py:59-105,
    joint_models.py:202-244), batch-accumulated into single matmuls.

    Fully vectorized: mention-pair indices come from repeat/tile over
    the cluster index arrays, the A4 context pools run as ONE segmented
    ``maximum.reduceat`` over the gathered sub-word windows (identical
    fp32 values to the per-pair slice-max — max is order-insensitive),
    and all distance buckets are array expressions.  No per-mention-pair
    Python; row order matches the reference loop exactly (entity pairs
    row-major, then head-cluster-major mention pairs)."""
    mp_ctx, mp_m1, mp_m2, mp_pair, mp_td, mp_sd = [], [], [], [], [], []
    mp_counts = []       # mention pairs per entity pair (segment sizes)
    pair_meta = []       # (doc_i, head_entity_idx, tail_entity_idx)
    ht, tt = [], []
    for doc_i, st in enumerate(docs):
        clusters = st.get("clusters", [])
        ne = len(clusters)
        if ne < 2:
            continue
        m_start, m_end = st["m_start"], st["m_end"]
        m_ss, m_se, m_sent = st["m_ss"], st["m_se"], st["m_sent"]
        carr = [np.asarray(c, dtype=np.int64) for c in clusters]
        # ordered entity pairs (a != b), row-major, budget-capped —
        # identical to the reference's nested loop with decrementing
        # budget
        pairs = [(a, b) for a in range(ne) for b in range(ne)
                 if a != b][: cfg.max_rel_pairs_per_doc]
        st["pairs_capped"] = ne * (ne - 1) > cfg.max_rel_pairs_per_doc
        off = st["ent_off"]
        etypes = np.fromiter(
            (cfg.entity_types.index(e["type"]) for e in st["entities"]),
            np.int64, ne)
        # mention-pair index arrays: head-cluster-major within each pair
        mi_idx = np.concatenate(
            [np.repeat(carr[a], len(carr[b])) for a, b in pairs])
        mj_idx = np.concatenate(
            [np.tile(carr[b], len(carr[a])) for a, b in pairs])
        counts = np.fromiter(
            (len(carr[a]) * len(carr[b]) for a, b in pairs),
            np.int64, len(pairs))
        # A4 context pool: max over sub-words strictly between the two
        # mentions; zero where adjacent/overlapping.  Sparse-table
        # window max (power-of-two levels over h, O(T log T) once per
        # doc, O(1) per pair) — a flat gather of all windows is
        # O(sum window lengths) and blows memory on long docs with
        # many entity pairs (windows here span whole documents, unlike
        # mention spans)
        lo = np.minimum(m_se[mi_idx], m_se[mj_idx])
        hi = np.maximum(m_ss[mi_idx], m_ss[mj_idx])
        ctx = np.zeros((len(mi_idx), cfg.hidden_size), dtype=np.float32)
        valid = hi > lo
        if valid.any():
            sizes_v = (hi - lo)[valid]
            ctx[valid] = scoring.span_maxpool_windows(
                st["h"], lo[valid], sizes_v, int(sizes_v.max()))
        mp_ctx.append(ctx)
        mp_m1.append(st["mrepr"][mi_idx])
        mp_m2.append(st["mrepr"][mj_idx])
        # F5 entity-pair repr: its F7 weight block is evaluated at the
        # ENTITY-pair level and the (n_pairs, d) result repeated per
        # mention pair — repeating the 2d-wide input multiplied the
        # same rows len(cluster_a) x len(cluster_b) times
        a_idx = np.fromiter((a for a, _ in pairs), np.int64, len(pairs))
        b_idx = np.fromiter((b for _, b in pairs), np.int64, len(pairs))
        ep = np.concatenate(
            [all_ent[off + a_idx], all_ent[off + b_idx]], axis=1)
        mp_pair.append(np.repeat(scoring.pair_block(ep, w), counts,
                                 axis=0))
        # F10 distances: ref sampling_common.py:297-315 — distance to
        # the first mention's LAST token (end - 1), adjacent -> 1
        td = np.maximum(0, np.maximum(m_start[mi_idx], m_start[mj_idx])
                        - np.minimum(m_end[mi_idx], m_end[mj_idx]) + 1)
        mp_td.append(np.minimum(td, cfg.token_dist_buckets - 1))
        sd = np.abs(m_sent[mi_idx] - m_sent[mj_idx])
        mp_sd.append(np.minimum(sd, cfg.sent_dist_buckets - 1))
        mp_counts.append(counts)
        pair_meta.extend((doc_i, a, b) for a, b in pairs)
        ht.append(etypes[a_idx])
        tt.append(etypes[b_idx])

    # F7 + A3 + F8: batch matmuls with segment max-pool
    if pair_meta:
        mp = scoring.mention_pair_repr(
            np.concatenate(mp_ctx), np.concatenate(mp_m1),
            np.concatenate(mp_m2), None,
            np.concatenate(mp_td), np.concatenate(mp_sd), w,
            pair_term=np.concatenate(mp_pair))
        counts = np.concatenate(mp_counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pooled = np.maximum.reduceat(mp, starts, axis=0)
        rel_probs = scoring.sigmoid(scoring.relation_logits(
            pooled, np.concatenate(ht), np.concatenate(tt), w))
        _emit_triples(docs, pair_meta, rel_probs, cfg)


def _relations_global(docs: list, all_ent: np.ndarray, et_arg: np.ndarray,
                      cfg: PipelineConfig, w) -> None:
    """F6/F9: the 'joint_global' model variant — entity-pair repr from
    pooled entity reprs + type embeddings, single linear relation head;
    no mention-pair expansion (ref joint_models.py:246-318,
    entity_pair_representation.py:6-27,
    relation_classification_global.py:10-13; pair enumeration
    misc.py:59-89 = all ordered pairs a != b)."""
    g_h, g_t, g_ht, g_tt = [], [], [], []
    pair_meta = []       # (doc_i, head_entity_idx, tail_entity_idx)
    for doc_i, st in enumerate(docs):
        ne = len(st.get("clusters", []))
        if ne < 2:
            continue
        st["pairs_capped"] = ne * (ne - 1) > cfg.max_rel_pairs_per_doc
        off = st["ent_off"]
        pair_budget = cfg.max_rel_pairs_per_doc
        for a in range(ne):
            for b in range(ne):
                if a == b:
                    continue
                if pair_budget <= 0:
                    break
                pair_budget -= 1
                pair_meta.append((doc_i, a, b))
                g_h.append(all_ent[off + a])
                g_t.append(all_ent[off + b])
                g_ht.append(int(et_arg[off + a]))
                g_tt.append(int(et_arg[off + b]))
    if pair_meta:
        reprs = scoring.entity_pair_global_repr(
            np.stack(g_h), np.stack(g_t),
            np.asarray(g_ht), np.asarray(g_tt), w)
        rel_probs = scoring.sigmoid(scoring.relation_logits_global(reprs, w))
        _emit_triples(docs, pair_meta, rel_probs, cfg)


def _emit_triples(docs: list, pair_meta: list, rel_probs: np.ndarray,
                  cfg: PipelineConfig) -> None:
    hit_pair, hit_type = np.where(rel_probs >= cfg.rel_threshold)
    for p_i, r_i in zip(hit_pair, hit_type):
        di, a, b = pair_meta[p_i]
        docs[di]["triples"].append({
            "head_idx": a, "tail_idx": b,
            "rel_type": cfg.relation_types[r_i],
            "score": float(rel_probs[p_i, r_i])})


def extract_graph(documents: DataFrame,
                  cfg: PipelineConfig = DEFAULT,
                  passthrough: tuple[str, ...] = ()) -> DataFrame:
    """documents(doc_key string, text string) -> nested doc-graph rows.

    The caller controls partitioning (see pipeline.salted_repartition);
    this operator itself is shuffle-free.

    ``passthrough`` names extra input columns copied verbatim onto the
    output rows (the batch preserves row order, so this is a positional
    copy, no join).  The streaming path uses it to keep the event-time
    column (warc_ts) riding with each extracted graph so a downstream
    watermarked/windowed sink needs no stream-stream join to recover
    it.
    """
    schema = DOC_GRAPH_SCHEMA
    for c in passthrough:
        schema += f", {c} {documents.schema[c].dataType.simpleString()}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                out = _extract_batch(pdf, cfg)
                for c in passthrough:
                    out[c] = pdf[c].to_numpy()
                yield out

    return documents.select("doc_key", "text", *passthrough).mapInPandas(
        run, schema=schema)


def explode_mentions(graph: DataFrame) -> DataFrame:
    m = F.explode("mentions").alias("m")
    return graph.select("doc_key", m).select(
        "doc_key", "m.mention_idx", "m.sent_idx", "m.start", "m.end",
        "m.sub_start", "m.sub_end", "m.phrase", "m.score")


def explode_entities(graph: DataFrame) -> DataFrame:
    e = F.explode("entities").alias("e")
    return graph.select("doc_key", e).select(
        "doc_key", "e.entity_idx", "e.type", "e.type_score",
        "e.mention_idxs", "e.spans")


def explode_triples(graph: DataFrame) -> DataFrame:
    """Flat triples with eval-identity keys (head/tail span set + type,
    ref jerex/evaluation/conversion.py:13-17,64-79)."""
    t = F.explode("triples").alias("t")
    flat = graph.select("doc_key", F.col("entities").alias("ents"), t)
    return flat.select(
        "doc_key", "t.head_idx", "t.tail_idx", "t.rel_type", "t.score",
        F.element_at("ents", F.col("t.head_idx") + 1)["spans"]
        .alias("head_key"),
        F.element_at("ents", F.col("t.tail_idx") + 1)["spans"]
        .alias("tail_key"),
        F.element_at("ents", F.col("t.head_idx") + 1)["type"]
        .alias("head_type"),
        F.element_at("ents", F.col("t.tail_idx") + 1)["type"]
        .alias("tail_type"),
    )
