"""Train-time sampling operators (SURVEY.md §2.8 N1-N4).

The reference builds training samples per document: gold positives plus
quota-bounded negative samples (ref jerex/sampling/sampling_common.py:
8-74 mentions, 101-151 coref pairs, 204-253 relations; quotas 200/200/
200 with overlap_ratio 0.5 — ref configs/docred_joint/train.yaml:17-19).
The reference uses process-global ``random.sample`` (order-dependent);
for distributed replay every choice here is drawn from a per-document
``numpy`` generator seeded by a stable key hash, so any worker
resamples a document identically — the property a resumable cluster
job needs.

Inputs are plain per-doc structures (token counts, gold mention spans,
gold clusters, gold relations); the Spark surface is
:func:`build_training_samples`, a mapInPandas over the gold documents
table.
"""

from __future__ import annotations

import zlib

import numpy as np

from .config import DEFAULT, PipelineConfig
from .tokenization import tokenize_document


def doc_rng(doc_key: str, stage: str) -> np.random.Generator:
    seed = zlib.crc32(f"{stage}|{doc_key}".encode("utf-8"))
    return np.random.default_rng(seed)


def _enumerate_spans(sent_lens: list[int], max_size: int):
    spans = []
    base = 0
    for n in sent_lens:
        for size in range(1, max_size + 1):
            for st in range(0, n - size + 1):
                spans.append((base + st, base + st + size))
        base += n
    return spans


def sample_negative_mentions(doc_key: str, sent_lens: list[int],
                             gold: set[tuple[int, int]],
                             cfg: PipelineConfig = DEFAULT,
                             neg_count: int = 200,
                             overlap_ratio: float = 0.5):
    """N2: non-gold spans split into gold-overlapping vs distinct;
    quota ``neg_count`` filled overlap_ratio from the overlapping pool
    (ref sampling_common.py:23-74)."""
    rng = doc_rng(doc_key, "neg_mention")
    cand = [s for s in _enumerate_spans(sent_lens, cfg.max_span_size)
            if s not in gold]
    overlapping, distinct = [], []
    for s, e in cand:
        if any(s < ge and gs < e for gs, ge in gold):
            overlapping.append((s, e))
        else:
            distinct.append((s, e))
    n_overlap = min(int(neg_count * overlap_ratio), len(overlapping))
    n_distinct = min(neg_count - n_overlap, len(distinct))
    take = []
    if overlapping:
        idx = rng.choice(len(overlapping), size=n_overlap, replace=False)
        take += [overlapping[i] for i in sorted(idx)]
    if distinct:
        idx = rng.choice(len(distinct), size=n_distinct, replace=False)
        take += [distinct[i] for i in sorted(idx)]
    return take


def sample_negative_coref_pairs(doc_key: str, clusters: list[list[int]],
                                neg_count: int = 200):
    """N3: gold coreferent pairs (same cluster) positive; sampled
    cross-cluster pairs negative (ref sampling_common.py:101-151)."""
    rng = doc_rng(doc_key, "neg_coref")
    pos = [(a, b) for c in clusters for i, a in enumerate(c)
           for b in c[i + 1:]]
    owner = {m: ci for ci, c in enumerate(clusters) for m in c}
    mentions = sorted(owner)
    neg_pool = [(a, b) for i, a in enumerate(mentions)
                for b in mentions[i + 1:] if owner[a] != owner[b]]
    n = min(neg_count, len(neg_pool))
    neg = ([neg_pool[i] for i in
            sorted(rng.choice(len(neg_pool), size=n, replace=False))]
           if neg_pool else [])
    return pos, neg


def sample_negative_relations(doc_key: str, n_entities: int,
                              gold_pairs: set[tuple[int, int]],
                              neg_count: int = 200):
    """N4: gold (head, tail) pairs positive (multi-hot over types,
    A5); sampled unrelated ordered pairs negative
    (ref sampling_common.py:204-253)."""
    rng = doc_rng(doc_key, "neg_rel")
    pool = [(a, b) for a in range(n_entities) for b in range(n_entities)
            if a != b and (a, b) not in gold_pairs]
    n = min(neg_count, len(pool))
    return ([pool[i] for i in
             sorted(rng.choice(len(pool), size=n, replace=False))]
            if pool else [])


def build_training_samples(doc_key: str, text: str,
                           gold_mentions: list[tuple[int, int]],
                           gold_clusters: list[list[int]],
                           gold_relations: list[tuple[int, int, str]],
                           cfg: PipelineConfig = DEFAULT) -> dict:
    """Per-document training sample: positives + seeded negatives, the
    distributed replacement for the reference's DataLoader worker
    (ref datasets.py:199-239, O1)."""
    tok = tokenize_document(text, cfg)
    sent_lens = [len(s) for s in tok.sentences]
    gold_set = set(gold_mentions)
    neg_m = sample_negative_mentions(doc_key, sent_lens, gold_set, cfg)
    pos_c, neg_c = sample_negative_coref_pairs(doc_key, gold_clusters)
    gold_pairs = {(h, t) for h, t, _ in gold_relations}
    neg_r = sample_negative_relations(doc_key, len(gold_clusters),
                                      gold_pairs)
    # A5 multi-hot relation labels per gold pair
    rel_types = {}
    for h, t, r in gold_relations:
        rel_types.setdefault((h, t), set()).add(r)
    multi_hot = {
        pair: [int(r in types) for r in cfg.relation_types]
        for pair, types in
        ((p, rel_types[p]) for p in sorted(rel_types))}
    return {
        "doc_key": doc_key,
        "pos_mentions": sorted(gold_set),
        "neg_mentions": neg_m,
        "pos_coref": pos_c, "neg_coref": neg_c,
        "pos_rel_multihot": multi_hot, "neg_rel": neg_r,
    }
