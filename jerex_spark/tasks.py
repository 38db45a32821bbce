"""The five independently-runnable sub-task models (N5 inference).

The reference registers five sub-task models alongside the two joint
models (ref jerex/models/__init__.py:9-20, classification_models.py:
23-262): each consumes GOLD upstream structure (mentions / clusters /
entity pairs from the annotation, built by sampling_classify.py) and
runs ONE scoring head — the per-component evaluation harness of the
paper's ablations.  Here each task is a distributed operator: the
task_samples table (sampling.task_samples) joined per document with
the frozen scoring heads (scoring.py), executed as one mapInPandas
over the gold documents — same Arrow-batched, shuffle-free shape as
the joint extract.

Every task emits flat per-item predictions so the five-layer
evaluation (evaluation.micro_prf) scores any of them directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import scoring
from .config import DEFAULT, PipelineConfig
from .extract import _doc_candidates
from .tokenization import tokenize_document
from .weights import load_weights

TASK_OUTPUT_SCHEMAS = {
    "mention_localization":
        "doc_key string, start int, end int, score double, pred int",
    "coreference_resolution":
        "doc_key string, m1 int, m2 int, score double, pred int",
    "entity_classification":
        "doc_key string, entity_idx int, type string, type_score double",
    "relation_classification_global":
        "doc_key string, head int, tail int, rel_type string, "
        "score double",
    "relation_classification_multi_instance":
        "doc_key string, head int, tail int, rel_type string, "
        "score double",
}


def _doc_mention_reprs(tok, ments, w, cfg):
    """Span max-pool reprs for gold mention spans (A1 over h)."""
    h = scoring.encode(tok.encoding, w, cfg)
    ss = np.fromiter((tok.sub_start[s] for s, _ in ments), np.int64,
                     len(ments))
    se = np.fromiter((tok.sub_end[e - 1] for _, e in ments), np.int64,
                     len(ments))
    return h, scoring.span_maxpool(h, ss, se), ss, se


def _run_mention(row, w, cfg):
    """MentionLocalizationModel (ref classification_models.py:23-63):
    F2 over every candidate span of the document.  Span enumeration is
    shared with the joint pipeline (extract._doc_candidates) — one
    enumerator, one place for the intra-sentence / cap semantics."""
    tok, starts, ends, _sent_idx, _capped = _doc_candidates(row.text, cfg)
    if not len(starts):
        return
    h = scoring.encode(tok.encoding, w, cfg)
    ss = np.asarray(tok.sub_start, dtype=np.int64)[starts]
    se = np.asarray(tok.sub_end, dtype=np.int64)[ends - 1]
    reprs = scoring.span_maxpool(h, ss, se)
    probs = scoring.sigmoid(
        scoring.mention_logits(reprs, ends - starts, w))
    for s, e, p in zip(starts, ends, probs):
        yield (row.doc_key, int(s), int(e), float(p),
               int(p >= cfg.mention_threshold))


def _run_coref(row, w, cfg):
    """CoreferenceResolutionModel (ref classification_models.py:65-116):
    F3 over all pairs of GOLD mentions."""
    ments = [(m["start"], m["end"]) for m in row.mentions]
    if len(ments) < 2:
        return
    tok = tokenize_document(row.text, cfg)
    _, mrepr, _, _ = _doc_mention_reprs(tok, ments, w, cfg)
    iu, ju = np.triu_indices(len(ments), 1)
    phr = [" ".join(tok.phrases[s:e]) for s, e in ments]
    eds = np.fromiter(
        (min(scoring.edit_distance(phr[i], phr[j]),
             cfg.edit_dist_buckets - 1) for i, j in zip(iu, ju)),
        np.int64, len(iu))
    probs = scoring.sigmoid(
        scoring.coref_logits(mrepr[iu], mrepr[ju], eds, w))
    for i, j, p in zip(iu, ju, probs):
        yield (row.doc_key, int(i), int(j), float(p),
               int(p >= cfg.coref_threshold))


def _entity_reprs(row, w, cfg):
    ments = [(m["start"], m["end"]) for m in row.mentions]
    clusters = [list(c) for c in row.clusters]
    if not clusters:
        return None
    tok = tokenize_document(row.text, cfg)
    h, mrepr, ss, se = _doc_mention_reprs(tok, ments, w, cfg)
    ent = np.stack([mrepr[c].max(axis=0) for c in clusters])
    return tok, h, mrepr, ss, se, ments, clusters, ent


def _run_entity(row, w, cfg):
    """EntityClassificationModel (ref classification_models.py:118-157):
    F4 over GOLD clusters."""
    r = _entity_reprs(row, w, cfg)
    if r is None:
        return
    *_, ent = r
    logits = scoring.entity_type_logits(ent, w)
    probs = scoring.softmax(logits, axis=1)
    arg = np.argmax(logits, axis=1)
    for e_i, t in enumerate(arg):
        yield (row.doc_key, e_i, cfg.entity_types[int(t)],
               float(probs[e_i, int(t)]))


def _gold_pairs(row, cfg):
    """Ordered gold-entity pairs, budget-capped (same enumeration as
    the joint models)."""
    ne = len(row.clusters)
    return [(a, b) for a in range(ne) for b in range(ne)
            if a != b][: cfg.max_rel_pairs_per_doc]


def _run_rel_global(row, w, cfg):
    """RelClassificationGlobal (ref classification_models.py:222-262):
    F6 + F9 over gold entities with GOLD types."""
    r = _entity_reprs(row, w, cfg)
    if r is None:
        return
    *_, ent = r
    pairs = _gold_pairs(row, cfg)
    if not pairs:
        return
    tids = [cfg.entity_types.index(t) for t in row.types]
    a_idx = np.fromiter((a for a, _ in pairs), np.int64, len(pairs))
    b_idx = np.fromiter((b for _, b in pairs), np.int64, len(pairs))
    reprs = scoring.entity_pair_global_repr(
        ent[a_idx], ent[b_idx],
        np.asarray([tids[a] for a in a_idx]),
        np.asarray([tids[b] for b in b_idx]), w)
    probs = scoring.sigmoid(scoring.relation_logits_global(reprs, w))
    hp, ht = np.where(probs >= cfg.rel_threshold)
    for p_i, r_i in zip(hp, ht):
        a, b = pairs[p_i]
        yield (row.doc_key, a, b, cfg.relation_types[r_i],
               float(probs[p_i, r_i]))


def _run_rel_mi(row, w, cfg):
    """RelClassificationMultiInstanceModel (ref classification_models.
    py:159-220): F5/F7/F8 + A3/A4 over gold entities/mentions with
    GOLD types."""
    r = _entity_reprs(row, w, cfg)
    if r is None:
        return
    tok, h, mrepr, ss, se, ments, clusters, ent = r
    pairs = _gold_pairs(row, cfg)
    if not pairs:
        return
    sent_idx = [m["sent_idx"] for m in row.mentions]
    tids = [cfg.entity_types.index(t) for t in row.types]
    carr = [np.asarray(c, dtype=np.int64) for c in clusters]
    mi_idx = np.concatenate(
        [np.repeat(carr[a], len(carr[b])) for a, b in pairs])
    mj_idx = np.concatenate(
        [np.tile(carr[b], len(carr[a])) for a, b in pairs])
    counts = np.fromiter((len(carr[a]) * len(carr[b]) for a, b in pairs),
                         np.int64, len(pairs))
    m_start = np.fromiter((s for s, _ in ments), np.int64, len(ments))
    m_end = np.fromiter((e for _, e in ments), np.int64, len(ments))
    m_sent = np.asarray(sent_idx, dtype=np.int64)
    lo = np.minimum(se[mi_idx], se[mj_idx])
    hi = np.maximum(ss[mi_idx], ss[mj_idx])
    ctx = np.zeros((len(mi_idx), cfg.hidden_size), dtype=np.float32)
    valid = hi > lo
    if valid.any():
        sizes_v = (hi - lo)[valid]
        ctx[valid] = scoring.span_maxpool_windows(
            h, lo[valid], sizes_v, int(sizes_v.max()))
    td = np.minimum(np.maximum(
        0, np.maximum(m_start[mi_idx], m_start[mj_idx])
        - np.minimum(m_end[mi_idx], m_end[mj_idx]) + 1),
        cfg.token_dist_buckets - 1)
    sd = np.minimum(np.abs(m_sent[mi_idx] - m_sent[mj_idx]),
                    cfg.sent_dist_buckets - 1)
    a_idx = np.fromiter((a for a, _ in pairs), np.int64, len(pairs))
    b_idx = np.fromiter((b for _, b in pairs), np.int64, len(pairs))
    ep = np.concatenate([ent[a_idx], ent[b_idx]], axis=1)
    mp = scoring.mention_pair_repr(
        ctx, mrepr[mi_idx], mrepr[mj_idx], None, td, sd, w,
        pair_term=np.repeat(scoring.pair_block(ep, w), counts, axis=0))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pooled = np.maximum.reduceat(mp, starts, axis=0)
    probs = scoring.sigmoid(scoring.relation_logits(
        pooled, np.asarray([tids[a] for a in a_idx]),
        np.asarray([tids[b] for b in b_idx]), w))
    hp, ht = np.where(probs >= cfg.rel_threshold)
    for p_i, r_i in zip(hp, ht):
        a, b = pairs[p_i]
        yield (row.doc_key, a, b, cfg.relation_types[r_i],
               float(probs[p_i, r_i]))


_RUNNERS = {
    "mention_localization": _run_mention,
    "coreference_resolution": _run_coref,
    "entity_classification": _run_entity,
    "relation_classification_global": _run_rel_global,
    "relation_classification_multi_instance": _run_rel_mi,
}


def run_task(gold_df: DataFrame, task: str,
             cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """gold documents DataFrame (doc_key, text, mentions, clusters,
    types, relations — sampling.task_samples gold schema) -> flat
    per-item predictions for one sub-task model.  Shuffle-free
    mapInPandas; the caller controls partitioning."""
    runner = _RUNNERS[task]
    schema = TASK_OUTPUT_SCHEMAS[task]
    cols = [f.split()[0] for f in schema.split(", ")]

    def run(batches) -> Iterator[pd.DataFrame]:
        w = load_weights(cfg)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                out.extend(runner(row, w, cfg) or [])
            yield pd.DataFrame(out, columns=cols)

    return gold_df.select("doc_key", "text", "mentions", "clusters",
                          "types", "relations").mapInPandas(run, schema)
