"""Frozen deterministic surrogate scoring artifact.

The reference consumes a trained BERT + four scoring heads
(/root/reference/jerex/models/modules/*.py).  torch is not available
here and "matching the reference at corpus scale" means *frozen
weights*, so the rebuild loads a versioned numpy weight artifact.  This
module generates that artifact deterministically from a seed: the same
head architectures as the reference (two-layer MLPs over concatenated
span / pair / meta-embedding features — SURVEY.md §2.6 F2-F8), with a
few structurally-crafted rows so the frozen model behaves like a
plausible extractor (coref score decays with edit distance, mention
score decays with span size) instead of pure noise.

Swapping in real JEREX checkpoint weights is a weight-file change, not
a code change: every consumer goes through :class:`SurrogateWeights`.

Both the plain-Python reference executor (reference_executor.py) and
the Spark pipeline (extract.py) load THIS artifact, so triple parity
tests exercise candidate generation, thresholds, clustering, pairing,
multi-instance pooling, conversion and dedup end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .config import DEFAULT, PipelineConfig


@dataclass(frozen=True)
class SurrogateWeights:
    # encoder
    tok_emb: np.ndarray       # (V, d)
    pos_emb: np.ndarray       # (max_positions, d)
    enc_w: np.ndarray         # (d, d)
    # mention head (ref mention_localization.py:14-22)
    size_emb: np.ndarray      # (max_span_size + 1, m)
    men_w1: np.ndarray        # (d + m, d)
    men_b1: np.ndarray        # (d,)
    men_w2: np.ndarray        # (d,)
    men_b2: float
    # coref head (ref coreference_resolution.py:36-50)
    ed_emb: np.ndarray        # (edit_dist_buckets, m)
    cor_w1: np.ndarray        # (2d + m, d)
    cor_b1: np.ndarray        # (d,)
    cor_w2: np.ndarray        # (d,)
    cor_b2: float
    # entity head (ref entity_classification.py:13-17)
    ent_w1: np.ndarray        # (d, d)
    ent_b1: np.ndarray        # (d,)
    ent_w2: np.ndarray        # (d, n_entity_types)
    ent_b2: np.ndarray        # (n_entity_types,)
    # relation head, multi-instance (ref relation_classification_multi_instance.py)
    tdist_emb: np.ndarray     # (token_dist_buckets, m)
    sdist_emb: np.ndarray     # (sent_dist_buckets, m)
    etype_emb: np.ndarray     # (n_entity_types, m)
    mp_w: np.ndarray          # (5d + 2m, d)   mention-pair repr (F7)
    mp_b: np.ndarray          # (d,)
    rel_w1: np.ndarray        # (d + 2m, d)
    rel_b1: np.ndarray        # (d,)
    rel_w2: np.ndarray        # (d, n_rel_types)
    rel_b2: np.ndarray        # (n_rel_types,)
    # relation head, global variant (F6/F9)
    # (ref entity_pair_representation.py:6-27: Linear(2d + 2m -> d),
    #  ref relation_classification_global.py:10-13: Linear(d -> n_rel))
    pair_w: np.ndarray        # (2d + 2m, d)   entity-pair repr (F6)
    pair_b: np.ndarray        # (d,)
    relg_w: np.ndarray        # (d, n_rel_types)  global rel head (F9)
    relg_b: np.ndarray        # (n_rel_types,)


_CACHE: dict[int, SurrogateWeights] = {}

_FIELDS = [f for f in SurrogateWeights.__dataclass_fields__]


def save_weights(w: SurrogateWeights, path: str) -> None:
    """Persist the artifact as .npz — the versioned weight file a real
    deployment ships (a trained JEREX checkpoint exported to these
    arrays drops in here with no code change)."""
    np.savez(path, **{f: np.asarray(getattr(w, f)) for f in _FIELDS})


def load_weights_npz(path: str) -> SurrogateWeights:
    """Load a weight artifact from file (counterpart of save_weights)."""
    z = np.load(path)
    kw = {}
    for f in _FIELDS:
        a = z[f]
        kw[f] = float(a) if a.ndim == 0 else a.astype(np.float32)
    return SurrogateWeights(**kw)


def load_weights(cfg: PipelineConfig = DEFAULT) -> SurrogateWeights:
    """Build (and memoize) the frozen artifact for ``cfg.weight_seed``."""
    if cfg.weight_seed in _CACHE:
        return _CACHE[cfg.weight_seed]
    d, m = cfg.hidden_size, cfg.meta_embedding_size
    n_et, n_rt = len(cfg.entity_types), len(cfg.relation_types)
    rng = np.random.default_rng(cfg.weight_seed)

    def mat(*shape, scale=None):
        s = scale if scale is not None else 1.0 / np.sqrt(shape[0])
        return (rng.standard_normal(shape) * s).astype(np.float32)

    tok_emb = mat(cfg.vocab_size, d, scale=1.0)
    pos_emb = mat(cfg.max_positions, d, scale=0.1)
    enc_w = mat(d, d)

    # --- mention head: logit = base + noise(span) - size penalty ---
    size_emb = mat(cfg.max_span_size + 1, m, scale=0.05)
    size_emb[:, 0] = np.arange(cfg.max_span_size + 1, dtype=np.float32)
    men_w1 = mat(d + m, d, scale=0.3)
    men_b1 = np.zeros(d, dtype=np.float32)
    # hidden unit 0 reads size ramp exclusively
    men_w1[:, 0] = 0.0
    men_w1[d, 0] = 1.0
    men_w2 = mat(d, scale=0.6).reshape(d)
    men_w2[0] = -1.1          # size penalty
    men_b2 = float(-4.9)      # calibrated: ~5-8 mentions/doc on the corpus

    # --- coref head: logit = base + noise - edit-distance penalty ---
    ed_emb = mat(cfg.edit_dist_buckets, m, scale=0.05)
    ed_emb[:, 0] = np.arange(cfg.edit_dist_buckets, dtype=np.float32)
    cor_w1 = mat(2 * d + m, d, scale=0.2)
    cor_b1 = np.zeros(d, dtype=np.float32)
    cor_w1[:, 0] = 0.0
    cor_w1[2 * d, 0] = 1.0
    cor_w2 = mat(d, scale=0.15).reshape(d)
    cor_w2[0] = -2.5          # edit-distance penalty
    cor_b2 = float(3.2)       # identical phrases: sigmoid(~3.2)=0.96

    ent_w1 = mat(d, d)
    ent_b1 = np.zeros(d, dtype=np.float32)
    ent_w2 = mat(d, n_et)
    ent_b2 = np.zeros(n_et, dtype=np.float32)

    tdist_emb = mat(cfg.token_dist_buckets, m, scale=0.05)
    sdist_emb = mat(cfg.sent_dist_buckets, m, scale=0.05)
    etype_emb = mat(n_et, m, scale=0.3)
    mp_w = mat(5 * d + 2 * m, d, scale=0.15)
    mp_b = np.zeros(d, dtype=np.float32)
    rel_w1 = mat(d + 2 * m, d, scale=0.3)
    rel_b1 = np.zeros(d, dtype=np.float32)
    rel_w2 = mat(d, n_rt, scale=0.3)
    rel_b2 = np.full(n_rt, -5.2, dtype=np.float32)

    pair_w = mat(2 * d + 2 * m, d, scale=0.2)
    pair_b = np.zeros(d, dtype=np.float32)
    relg_w = mat(d, n_rt, scale=0.3)
    # calibrated: ~0.5 triples/doc under the global head on the corpus
    relg_b = np.full(n_rt, -3.2, dtype=np.float32)

    w = SurrogateWeights(
        tok_emb=tok_emb, pos_emb=pos_emb, enc_w=enc_w,
        size_emb=size_emb, men_w1=men_w1, men_b1=men_b1, men_w2=men_w2,
        men_b2=men_b2, ed_emb=ed_emb, cor_w1=cor_w1, cor_b1=cor_b1,
        cor_w2=cor_w2, cor_b2=cor_b2, ent_w1=ent_w1, ent_b1=ent_b1,
        ent_w2=ent_w2, ent_b2=ent_b2, tdist_emb=tdist_emb,
        sdist_emb=sdist_emb, etype_emb=etype_emb, mp_w=mp_w, mp_b=mp_b,
        rel_w1=rel_w1, rel_b1=rel_b1, rel_w2=rel_w2, rel_b2=rel_b2,
        pair_w=pair_w, pair_b=pair_b, relg_w=relg_w, relg_b=relg_b,
    )
    _CACHE[cfg.weight_seed] = w
    return w
