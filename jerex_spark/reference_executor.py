"""Plain-Python reference executor (golden side of parity tests, T2).

A direct, loop-oriented transcription of the reference's joint
inference dataflow (ref jerex/models/joint_models.py:202-244 and
jerex/evaluation/conversion.py:20-98; traced in SURVEY.md §3.1 steps
4-6), driven by the same frozen weight artifact as the Spark pipeline:

  tokenize -> span candidates -> encoder -> span max-pool -> mention
  score/threshold -> coref pairs (+edit distance) -> coref score ->
  complete-linkage clustering -> entity pool/typing -> ordered entity
  pairs -> mention-pair expansion (+context/distances) -> MI relation
  scoring -> thresholds -> (mentions, entities, triples).

It shares only the leaf scoring math (scoring.py) with the Spark side;
pipeline structure — candidate enumeration, thresholds, pairing,
clustering, multi-instance pooling, conversion, identity keys — is
implemented independently here, so the parity test is a real
end-to-end check of those semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import scoring
from .config import DEFAULT, PipelineConfig
from .tokenization import tokenize_document
from .weights import load_weights


@dataclass
class DocResult:
    doc_key: str
    mentions: list = field(default_factory=list)   # dicts
    entities: list = field(default_factory=list)
    triples: list = field(default_factory=list)
    # per-doc stats + cap-truncation flags, same semantics as the Spark
    # side's (n_tokens, n_spans, truncated) columns (extract.py
    # DOC_GRAPH_SCHEMA) — golden side of the kg_doc_stats oracle
    n_tokens: int = 0
    n_spans: int = 0
    spans_capped: bool = False
    mentions_capped: bool = False
    pairs_capped: bool = False
    # per-category smallest distance of any score from the decision
    # boundary it was compared against: mention/coref/rel thresholds,
    # entity-type argmax top-2 logit gap, mention-cap-boundary score
    # gap.  The golden-oracle freezer (scripts/make_golden.py) asserts
    # each exceeds the measured cross-engine drift for that score
    # family, so a corpus that could flip a frozen identity row under
    # batched-vs-per-doc BLAS last-ulp differences is rejected at
    # generation time instead of committed as flaky.
    margins: dict = field(default_factory=lambda: {
        "mention": float("inf"), "coref": float("inf"),
        "enttype": float("inf"), "rel": float("inf")})


def _complete_linkage_ref(dist: np.ndarray, threshold: float) -> list[list[int]]:
    """Independent complete-linkage implementation (cross-checks
    clustering.py).  Maintains a cluster-level distance matrix and
    updates it with the max rule on each merge."""
    n = dist.shape[0]
    if n == 0:
        return []
    sym = np.full((n, n), np.inf, dtype=np.float64)
    for i in range(n):
        sym[i, i] = 0.0
        for j in range(i + 1, n):
            sym[i, j] = sym[j, i] = dist[i, j]
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    cd = sym.copy()
    active = set(range(n))
    while len(active) > 1:
        best_key = None
        best_pair = None
        for a in sorted(active):
            for b in sorted(active):
                if b <= a:
                    continue
                key = (cd[a, b], members[a][0], members[b][0])
                if best_key is None or key < best_key:
                    best_key = key
                    best_pair = (a, b)
        if best_key is None or best_key[0] >= threshold:
            break
        a, b = best_pair
        # complete linkage: d(a∪b, c) = max(d(a,c), d(b,c))
        for c in active:
            if c not in (a, b):
                m = max(cd[a, c], cd[b, c])
                cd[a, c] = cd[c, a] = m
        members[a] = sorted(members[a] + members[b])
        active.discard(b)
    clusters = [members[a] for a in active]
    clusters.sort(key=lambda c: c[0])
    return clusters


def run_document(doc_key: str, text: str,
                 cfg: PipelineConfig = DEFAULT) -> DocResult:
    w = load_weights(cfg)
    res = DocResult(doc_key=doc_key)
    tok = tokenize_document(text, cfg)
    n_tok = len(tok.phrases)
    res.n_tokens = n_tok
    if n_tok == 0:
        return res

    # span candidates: intra-sentence, size 1..max_span_size
    spans = []
    base = 0
    for s_i, sent in enumerate(tok.sentences):
        for size in range(1, cfg.max_span_size + 1):
            for st in range(0, len(sent) - size + 1):
                spans.append((base + st, base + st + size, s_i))
        base += len(sent)
    res.spans_capped = len(spans) > cfg.max_spans_per_doc
    spans = spans[: cfg.max_spans_per_doc]
    res.n_spans = len(spans)
    if not spans:
        return res

    h = scoring.encode(tok.encoding, w, cfg)
    sub_s = np.array([tok.sub_start[s] for s, _, _ in spans])
    sub_e = np.array([tok.sub_end[e - 1] for _, e, _ in spans])
    sizes = np.array([e - s for s, e, _ in spans])
    reprs = scoring.span_maxpool(h, sub_s, sub_e)
    logits = scoring.mention_logits(reprs, sizes, w)
    probs = scoring.sigmoid(logits)

    res.margins["mention"] = min(
        res.margins["mention"],
        float(np.abs(probs - cfg.mention_threshold).min()))
    kept = [i for i in range(len(spans))
            if probs[i] >= cfg.mention_threshold]
    res.mentions_capped = len(kept) > cfg.max_mentions_per_doc
    # cap, keeping highest scores (deterministic tie-break on span)
    kept.sort(key=lambda i: (-float(probs[i]), spans[i][0], spans[i][1]))
    if res.mentions_capped:
        # score gap across the truncation boundary: near-equal scores
        # there could reorder (and so swap the kept set) under drift
        res.margins["mention"] = min(
            res.margins["mention"],
            abs(float(probs[kept[cfg.max_mentions_per_doc - 1]])
                - float(probs[kept[cfg.max_mentions_per_doc]])))
    kept = kept[: cfg.max_mentions_per_doc]
    kept.sort(key=lambda i: (spans[i][0], spans[i][1]))
    if not kept:
        return res

    mentions = []
    for m_i, i in enumerate(kept):
        s, e, s_i = spans[i]
        mentions.append({
            "mention_idx": m_i, "sent_idx": s_i, "start": s, "end": e,
            "sub_start": int(sub_s[i]), "sub_end": int(sub_e[i]),
            "phrase": " ".join(tok.phrases[s:e]),
            "score": float(probs[i]), "repr": reprs[i],
        })
    res.mentions = mentions
    nm = len(mentions)

    # coref: upper-triangle ordered pairs (i, j), i < j (SURVEY §2.5)
    dist = np.zeros((nm, nm), dtype=np.float32)
    if nm > 1:
        i_idx, j_idx, buckets = [], [], []
        for i in range(nm):
            for j in range(i + 1, nm):
                ed = scoring.edit_distance(mentions[i]["phrase"],
                                           mentions[j]["phrase"])
                buckets.append(min(ed, cfg.edit_dist_buckets - 1))
                i_idx.append(i)
                j_idx.append(j)
        m1 = np.stack([mentions[i]["repr"] for i in i_idx])
        m2 = np.stack([mentions[j]["repr"] for j in j_idx])
        sims = scoring.sigmoid(
            scoring.coref_logits(m1, m2, np.array(buckets), w))
        res.margins["coref"] = min(
            res.margins["coref"],
            float(np.abs(sims - cfg.coref_threshold).min()))
        for k in range(len(i_idx)):
            dist[i_idx[k], j_idx[k]] = 1.0 - sims[k]
    clusters = _complete_linkage_ref(dist, 1.0 - cfg.coref_threshold)

    # entity pooling + typing
    ent_reprs = np.stack([
        np.max(np.stack([mentions[m]["repr"] for m in c]), axis=0)
        for c in clusters])
    et_logits = scoring.entity_type_logits(ent_reprs, w)
    et_probs = scoring.softmax(et_logits, axis=1)
    if et_logits.shape[1] > 1:
        # argmax top-2 gap: the entity TYPE is part of the triple
        # identity, so a near-tie could flip it under drift
        srt = np.sort(et_logits, axis=1)
        res.margins["enttype"] = min(
            res.margins["enttype"], float((srt[:, -1] - srt[:, -2]).min()))
    for e_i, c in enumerate(clusters):
        t = int(np.argmax(et_logits[e_i]))   # lowest index on ties
        res.entities.append({
            "entity_idx": e_i,
            "type": cfg.entity_types[t],
            "type_score": float(et_probs[e_i, t]),
            "mentions": sorted((mentions[m]["start"], mentions[m]["end"])
                               for m in c),
            "mention_idxs": list(c),
        })

    ne = len(clusters)
    if ne < 2:
        return res
    res.pairs_capped = ne * (ne - 1) > cfg.max_rel_pairs_per_doc
    types = np.array([cfg.entity_types.index(e["type"])
                      for e in res.entities])
    d = cfg.hidden_size

    if cfg.relation_mode == "global":
        # joint_global variant (ref joint_models.py:246-318): entity-pair
        # repr F6 + single linear head F9, all ordered pairs a != b
        # (ref misc.py:59-89)
        pair_budget = cfg.max_rel_pairs_per_doc
        for a in range(ne):
            for b in range(ne):
                if a == b:
                    continue
                if pair_budget <= 0:
                    break
                pair_budget -= 1
                pr = scoring.entity_pair_global_repr(
                    ent_reprs[a:a + 1], ent_reprs[b:b + 1],
                    types[a:a + 1], types[b:b + 1], w)
                rp = scoring.sigmoid(
                    scoring.relation_logits_global(pr, w))[0]
                res.margins["rel"] = min(
                    res.margins["rel"],
                    float(np.abs(rp - cfg.rel_threshold).min()))
                for r_i, p in enumerate(rp):
                    if p >= cfg.rel_threshold:
                        res.triples.append({
                            "head_idx": a, "tail_idx": b,
                            "rel_type": cfg.relation_types[r_i],
                            "score": float(p),
                            "head_key": res.entities[a]["mentions"],
                            "tail_key": res.entities[b]["mentions"],
                            "head_type": res.entities[a]["type"],
                            "tail_type": res.entities[b]["type"],
                        })
        return res

    pair_budget = cfg.max_rel_pairs_per_doc
    for a in range(ne):
        for b in range(ne):
            if a == b:
                continue
            if pair_budget <= 0:
                break
            pair_budget -= 1
            pair_repr = np.concatenate([ent_reprs[a], ent_reprs[b]])
            mp_rows = []
            for mi in clusters[a]:
                for mj in clusters[b]:
                    A, B = mentions[mi], mentions[mj]
                    lo = min(A["sub_end"], B["sub_end"])
                    hi = max(A["sub_start"], B["sub_start"])
                    ctx = (h[lo:hi].max(axis=0) if hi > lo
                           else np.zeros(d, dtype=np.float32))
                    # ref sampling_common.py:297-315: second.start -
                    # (first.end - 1); first = earlier-starting mention.
                    # max/min form is equivalent after the 0-clamp.
                    td = max(0, max(A["start"], B["start"])
                             - min(A["end"], B["end"]) + 1)
                    sd = abs(A["sent_idx"] - B["sent_idx"])
                    mp_rows.append((ctx, A["repr"], B["repr"],
                                    min(td, cfg.token_dist_buckets - 1),
                                    min(sd, cfg.sent_dist_buckets - 1)))
            mp = scoring.mention_pair_repr(
                np.stack([r[0] for r in mp_rows]),
                np.stack([r[1] for r in mp_rows]),
                np.stack([r[2] for r in mp_rows]),
                np.tile(pair_repr, (len(mp_rows), 1)),
                np.array([r[3] for r in mp_rows]),
                np.array([r[4] for r in mp_rows]), w)
            pooled = mp.max(axis=0, keepdims=True)   # A3 multi-instance max
            rl = scoring.relation_logits(
                pooled, types[a:a + 1], types[b:b + 1], w)
            rp = scoring.sigmoid(rl)[0]
            res.margins["rel"] = min(
                res.margins["rel"],
                float(np.abs(rp - cfg.rel_threshold).min()))
            for r_i, p in enumerate(rp):
                if p >= cfg.rel_threshold:
                    res.triples.append({
                        "head_idx": a, "tail_idx": b,
                        "rel_type": cfg.relation_types[r_i],
                        "score": float(p),
                        "head_key": res.entities[a]["mentions"],
                        "tail_key": res.entities[b]["mentions"],
                        "head_type": res.entities[a]["type"],
                        "tail_type": res.entities[b]["type"],
                    })
    return res


def triple_identity(doc_key: str, t: dict) -> tuple:
    """Eval identity of a triple (ref jerex/evaluation/conversion.py:13-17,
    64-79): (head cluster span set, head type, tail set, tail type, rel)."""
    return (doc_key,
            tuple(map(tuple, t["head_key"])), t["head_type"],
            tuple(map(tuple, t["tail_key"])), t["tail_type"],
            t["rel_type"])


def store_predictions_ref(results: list[DocResult], texts: dict[str, str],
                          cfg: PipelineConfig = DEFAULT) -> list[dict]:
    """Reference-layout per-document prediction dicts — the plain-Python
    twin of graph.export_predictions_json, mirroring the key shapes of
    ref jerex/evaluation/joint_evaluator.py:111-135 store_predictions:
    tokens (token phrases), mentions [{start, end}], entities
    [{mentions: [mention idx], type}], relations [{head, tail, type}].
    Used as the golden file for the S7 sink parity test."""
    out = []
    for res in results:
        tok = tokenize_document(texts[res.doc_key], cfg)
        out.append({
            "doc_key": res.doc_key,
            "tokens": list(tok.phrases),
            "mentions": [{"start": m["start"], "end": m["end"]}
                         for m in res.mentions],
            "entities": [{"mentions": e["mention_idxs"], "type": e["type"]}
                         for e in res.entities],
            "relations": [{"head": t["head_idx"], "tail": t["tail_idx"],
                           "type": t["rel_type"]} for t in res.triples],
        })
    return out
