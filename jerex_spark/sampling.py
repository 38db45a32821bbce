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


# --- N5: per-task sample builders -------------------------------------
# The reference trains/evaluates five independent sub-task models
# (ref jerex/models/__init__.py:9-20, README.md:71-72), each with its
# own sample builder in jerex/sampling/sampling_classify.py:12-262.
# These are the Arrow-native equivalents: no padded tensors (ragged
# ArrayType columns replace mention/context masks), same positives,
# same quota-bounded seeded negatives, same feature set per task.

def mention_classify_sample(doc_key: str, text: str,
                            gold_mentions: list[tuple[int, int]],
                            cfg: PipelineConfig = DEFAULT,
                            train: bool = True) -> dict:
    """'mention_localization' samples
    (ref sampling_classify.py:128-174): train = gold spans (label 1) +
    quota/overlap-sampled negative spans (label 0); inference = every
    candidate span, unlabeled."""
    tok = tokenize_document(text, cfg)
    sent_lens = [len(s) for s in tok.sentences]
    if train:
        gold_set = set(gold_mentions)
        neg = sample_negative_mentions(doc_key, sent_lens, gold_set, cfg)
        spans = sorted(gold_set) + neg
        labels = [1] * len(gold_set) + [0] * len(neg)
    else:
        spans = _enumerate_spans(sent_lens, cfg.max_span_size)
        labels = [None] * len(spans)
    return {"doc_key": doc_key,
            "spans": spans,
            "sizes": [e - s for s, e in spans],
            "labels": labels}


def coref_classify_sample(doc_key: str, text: str,
                          gold_mentions: list[tuple[int, int]],
                          gold_clusters: list[list[int]],
                          cfg: PipelineConfig = DEFAULT,
                          train: bool = True) -> dict:
    """'coreference_resolution' samples
    (ref sampling_classify.py:200-262): pairs of gold mentions with
    edit-distance feature; train = gold coreferent pairs (label 1) +
    sampled cross-cluster pairs (label 0); inference = all pairs."""
    from .scoring import edit_distance
    tok = tokenize_document(text, cfg)

    def phrase(m):
        s, e = gold_mentions[m]
        return " ".join(tok.phrases[s:e])

    if train:
        pos, neg = sample_negative_coref_pairs(doc_key, gold_clusters)
        pairs = pos + neg
        labels = [1] * len(pos) + [0] * len(neg)
    else:
        n = len(gold_mentions)
        pairs = [(a, b) for a in range(n) for b in range(a + 1, n)]
        labels = [None] * len(pairs)
    eds = [min(edit_distance(phrase(a), phrase(b)),
               cfg.edit_dist_buckets - 1) for a, b in pairs]
    return {"doc_key": doc_key, "pairs": pairs, "eds": eds,
            "labels": labels}


def entity_classify_sample(doc_key: str,
                           gold_clusters: list[list[int]],
                           gold_types: list[str],
                           cfg: PipelineConfig = DEFAULT) -> dict:
    """'entity_classification' samples
    (ref sampling_classify.py:176-198): gold entity clusters (mention
    index lists) with their gold type labels — same sample for train
    and inference (entities are given, only the type is predicted)."""
    return {"doc_key": doc_key,
            "clusters": [list(c) for c in gold_clusters],
            "type_ids": [cfg.entity_types.index(t) for t in gold_types]}


def _rel_pos_neg(doc_key: str, gold_clusters, gold_relations,
                 cfg: PipelineConfig):
    """gold_relations items are (head, tail, rel) or (head, tail, rel,
    evidence) — evidence is the DocRED gold evidence-sentence index
    list (ref datasets.py:140-159 _parse_relations keeps it on every
    Relation; entities.py:341-374).  Returns (pairs, multi-hot labels,
    per-pair evidence) — evidence is the sorted union over the pair's
    gold relations, empty for sampled negatives."""
    rel_types: dict = {}
    rel_ev: dict = {}
    for rel in gold_relations:
        h, t, r = rel[0], rel[1], rel[2]
        ev = rel[3] if len(rel) > 3 and rel[3] is not None else []
        rel_types.setdefault((h, t), set()).add(r)
        rel_ev.setdefault((h, t), set()).update(ev)
    pos_pairs = sorted(rel_types)
    multi_hot = [[int(r in rel_types[p]) for r in cfg.relation_types]
                 for p in pos_pairs]
    evidence = [sorted(rel_ev[p]) for p in pos_pairs]
    neg = sample_negative_relations(doc_key, len(gold_clusters),
                                    set(pos_pairs))
    zeros = [[0] * len(cfg.relation_types)] * len(neg)
    return (pos_pairs + neg, multi_hot + zeros,
            evidence + [[] for _ in neg])


def rel_classify_global_sample(doc_key: str,
                               gold_clusters: list[list[int]],
                               gold_types: list[str],
                               gold_relations: list[tuple[int, int, str]],
                               cfg: PipelineConfig = DEFAULT) -> dict:
    """'relation_classification_global' samples
    (ref sampling_classify.py:12-82 create_rel_global_tensors path):
    ordered entity pairs — gold pairs with multi-hot labels plus
    strong negatives (pairs of labeled entities) — with head/tail
    entity-type ids (the F6 meta features) and the gold evidence
    sentence ids per positive pair."""
    pairs, labels, evidence = _rel_pos_neg(doc_key, gold_clusters,
                                           gold_relations, cfg)
    tids = [cfg.entity_types.index(t) for t in gold_types]
    return {"doc_key": doc_key, "pairs": pairs, "labels_multihot": labels,
            "evidence": evidence,
            "head_type_ids": [tids[a] for a, _ in pairs],
            "tail_type_ids": [tids[b] for _, b in pairs]}


def rel_classify_mi_sample(doc_key: str, text: str,
                           gold_mentions: list[tuple[int, int]],
                           gold_sent_idx: list[int],
                           gold_clusters: list[list[int]],
                           gold_relations: list[tuple[int, int, str]],
                           cfg: PipelineConfig = DEFAULT) -> dict:
    """'relation_classification_multi_instance' samples
    (ref sampling_classify.py:12-82 create_rel_mi_tensors path): same
    pos/neg entity pairs as the global task, expanded to mention pairs
    with the F10 token/sentence distance features and the A4 context
    window bounds (sub-word coords come from the shared tokenizer)."""
    tok = tokenize_document(text, cfg)
    pairs, labels, evidence = _rel_pos_neg(doc_key, gold_clusters,
                                           gold_relations, cfg)
    mp_rows = []        # (pair_idx, mi, mj, tok_dist, sent_dist)
    for p_i, (a, b) in enumerate(pairs):
        for mi in gold_clusters[a]:
            for mj in gold_clusters[b]:
                (s1, e1), (s2, e2) = gold_mentions[mi], gold_mentions[mj]
                # ref sampling_common.py:297-315: distance to the first
                # mention's LAST token
                td = max(0, max(s1, s2) - min(e1, e2) + 1)
                sd = abs(gold_sent_idx[mi] - gold_sent_idx[mj])
                mp_rows.append((p_i, mi, mj,
                                min(td, cfg.token_dist_buckets - 1),
                                min(sd, cfg.sent_dist_buckets - 1)))
    return {"doc_key": doc_key, "pairs": pairs, "labels_multihot": labels,
            "evidence": evidence,
            "n_tokens": len(tok.phrases), "mention_pairs": mp_rows}


TASK_SAMPLE_BUILDERS = {
    "mention_localization": mention_classify_sample,
    "coreference_resolution": coref_classify_sample,
    "entity_classification": entity_classify_sample,
    "relation_classification_global": rel_classify_global_sample,
    "relation_classification_multi_instance": rel_classify_mi_sample,
}


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
    gold_pairs = {(r[0], r[1]) for r in gold_relations}
    neg_r = sample_negative_relations(doc_key, len(gold_clusters),
                                      gold_pairs)
    # A5 multi-hot relation labels + gold evidence sentences per pair
    rel_types: dict = {}
    rel_ev: dict = {}
    for rel in gold_relations:
        h, t, r = rel[0], rel[1], rel[2]
        rel_types.setdefault((h, t), set()).add(r)
        rel_ev.setdefault((h, t), set()).update(
            rel[3] if len(rel) > 3 and rel[3] is not None else [])
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
        "pos_rel_evidence": {p: sorted(rel_ev[p])
                             for p in sorted(rel_ev)},
    }

# --- N5 Spark surface: distributed per-task sample tables ---------------
# Gold table schema (FIXTURES.md-style annotations):
#   doc_key string, text string,
#   mentions  array<struct<start:int, end:int, sent_idx:int>>,
#   clusters  array<array<int>>,
#   types     array<string>,
#   relations array<struct<head:int, tail:int, rel:string,
#                          evidence:array<int>>>   (evidence optional —
#                          DocRED gold evidence sentence ids, ref
#                          datasets.py:140-159)
# One mapInPandas per task; each output row is one sample ITEM (span /
# pair / cluster), so the result is a flat, shuffle-friendly training
# table — the distributed replacement for the reference's per-task
# DataLoader (ref sampling_classify.py:12-262).

_TASK_SCHEMAS = {
    "mention_localization":
        "doc_key string, start int, end int, size int, label int",
    "coreference_resolution":
        "doc_key string, m1 int, m2 int, ed int, label int",
    "entity_classification":
        "doc_key string, entity_idx int, mention_idxs array<int>, "
        "type_id int",
    "relation_classification_global":
        "doc_key string, head int, tail int, head_type_id int, "
        "tail_type_id int, labels array<int>, evidence array<int>",
    "relation_classification_multi_instance":
        "doc_key string, head int, tail int, pair_idx int, m1 int, "
        "m2 int, tok_dist int, sent_dist int, labels array<int>, "
        "evidence array<int>",
}


def _task_rows(task: str, row, cfg: PipelineConfig, train: bool):
    ments = [(m["start"], m["end"]) for m in row.mentions]
    sent_idx = [m["sent_idx"] for m in row.mentions]
    clusters = [list(c) for c in row.clusters]

    def _ev(r):
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        ev = d.get("evidence")
        # Arrow hands struct fields over as numpy arrays (no bool())
        return [] if ev is None else [int(x) for x in ev]

    rels = [(r["head"], r["tail"], r["rel"], _ev(r))
            for r in row.relations]
    if task == "mention_localization":
        s = mention_classify_sample(row.doc_key, row.text, ments, cfg,
                                    train=train)
        for (a, b), sz, lb in zip(s["spans"], s["sizes"], s["labels"]):
            yield (row.doc_key, a, b, sz, lb)
    elif task == "coreference_resolution":
        s = coref_classify_sample(row.doc_key, row.text, ments, clusters,
                                  cfg, train=train)
        for (a, b), ed, lb in zip(s["pairs"], s["eds"], s["labels"]):
            yield (row.doc_key, a, b, ed, lb)
    elif task == "entity_classification":
        s = entity_classify_sample(row.doc_key, clusters, list(row.types),
                                   cfg)
        for e_i, (c, t) in enumerate(zip(s["clusters"], s["type_ids"])):
            yield (row.doc_key, e_i, c, t)
    elif task == "relation_classification_global":
        s = rel_classify_global_sample(row.doc_key, clusters,
                                       list(row.types), rels, cfg)
        for (a, b), ht, tt, lb, ev in zip(s["pairs"], s["head_type_ids"],
                                          s["tail_type_ids"],
                                          s["labels_multihot"],
                                          s["evidence"]):
            yield (row.doc_key, a, b, ht, tt, lb, ev)
    elif task == "relation_classification_multi_instance":
        s = rel_classify_mi_sample(row.doc_key, row.text, ments, sent_idx,
                                   clusters, rels, cfg)
        for p_i, mi, mj, td, sd in s["mention_pairs"]:
            a, b = s["pairs"][p_i]
            yield (row.doc_key, a, b, p_i, mi, mj, td, sd,
                   s["labels_multihot"][p_i], s["evidence"][p_i])
    else:
        raise ValueError(f"unknown task {task!r}")


def task_samples(gold_df, task: str, cfg: PipelineConfig = DEFAULT,
                 train: bool = True):
    """gold documents DataFrame -> flat per-task sample DataFrame.

    Embarrassingly parallel (every sample derives from one document and
    a doc-key-seeded RNG), so the operator is shuffle-free; the caller
    controls partitioning."""
    import pandas as pd

    schema = _TASK_SCHEMAS[task]
    cols = [f.split()[0] for f in schema.split(", ")]

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                out.extend(_task_rows(task, row, cfg, train))
            yield pd.DataFrame(out, columns=cols)

    return gold_df.select("doc_key", "text", "mentions", "clusters",
                          "types", "relations").mapInPandas(run, schema)
