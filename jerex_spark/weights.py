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
a code change: every consumer goes through :class:`SurrogateWeights`,
and :func:`load_jerex_state_dict` maps a checkpoint's state_dict (the
reference's exact layer names, torch Linear layout) onto this layout —
tested end-to-end in tests/test_checkpoint_swap.py.  ``bert.*``
encoder tensors, when the checkpoint carries them, load into the numpy
BERT forward (bert_numpy.py) and replace the surrogate encoder — the
swap covers the full model, not just the heads.

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
    # real BERT encoder (bert_numpy.BertWeights) — None runs the
    # surrogate encoder; set when a checkpoint's bert.* tensors were
    # exported into the artifact (scoring.encode dispatches on this)
    bert: object | None = None


_CACHE: dict[int, SurrogateWeights] = {}

# head/embedding array fields (the generic save/load path); the
# optional nested encoder is flattened separately by bert_numpy
_FIELDS = [f for f in SurrogateWeights.__dataclass_fields__
           if f != "bert"]


def save_weights(w: SurrogateWeights, path: str) -> None:
    """Persist the artifact as .npz — the versioned weight file a real
    deployment ships (a trained JEREX checkpoint exported to these
    arrays drops in here with no code change)."""
    arrs = {f: np.asarray(getattr(w, f)) for f in _FIELDS}
    if w.bert is not None:
        from .bert_numpy import bert_to_npz_dict
        arrs.update(bert_to_npz_dict(w.bert))
    np.savez(path, **arrs)


def load_weights_npz(path: str) -> SurrogateWeights:
    """Load a weight artifact from file (counterpart of save_weights)."""
    from .bert_numpy import bert_from_npz
    z = np.load(path)
    kw = {}
    for f in _FIELDS:
        a = z[f]
        kw[f] = float(a) if a.ndim == 0 else a.astype(np.float32)
    kw["bert"] = bert_from_npz(z)
    return SurrogateWeights(**kw)


_PATH_CACHE: dict[str, SurrogateWeights] = {}


def load_weights(cfg: PipelineConfig = DEFAULT) -> SurrogateWeights:
    """Resolve the frozen artifact for ``cfg``: a weight FILE when
    ``cfg.weights_path`` is set (e.g. a converted JEREX checkpoint —
    see load_jerex_state_dict), else the seeded surrogate.  Both are
    memoized per process, so executors pay the load once."""
    if cfg.weights_path is not None:
        hit = _PATH_CACHE.get(cfg.weights_path)
        if hit is None:
            hit = _PATH_CACHE[cfg.weights_path] = load_weights_npz(
                cfg.weights_path)
        return hit
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


# --- real JEREX checkpoint -> SurrogateWeights -------------------------
# torch state_dict key -> (SurrogateWeights field(s), kind).  Key names
# are the reference's module attribute paths (ref jerex/models/
# joint_models.py:32-41,156-175,256-270 composed with the layer names
# in models/modules/mention_localization.py:14-22,
# coreference_resolution.py:36-50, entity_classification.py:13-17,
# entity_pair_representation.py:6-27,
# relation_classification_multi_instance.py:59-105,
# relation_classification_global.py:10-13).  torch nn.Linear stores
# weight as (out, in); our matmuls are x @ W with W (in, out), so
# Linear weights transpose on load.  nn.Embedding weight is (count, m)
# on both sides.
_JEREX_HEAD_MAP = {
    # MentionLocalization
    "mention_localization.linear.weight": ("men_w1", "linear_w"),
    "mention_localization.linear.bias": ("men_b1", "bias"),
    "mention_localization.mention_classifier.weight": ("men_w2", "vec_w"),
    "mention_localization.mention_classifier.bias": ("men_b2", "scalar"),
    "mention_localization.size_embeddings.weight": ("size_emb", "emb"),
    # CoreferenceResolution
    "coreference_resolution.coref_linear.weight": ("cor_w1", "linear_w"),
    "coreference_resolution.coref_linear.bias": ("cor_b1", "bias"),
    "coreference_resolution.coref_classifier.weight": ("cor_w2", "vec_w"),
    "coreference_resolution.coref_classifier.bias": ("cor_b2", "scalar"),
    "coreference_resolution.coref_ed_embeddings.weight": ("ed_emb", "emb"),
    # EntityClassification
    "entity_classification.linear.weight": ("ent_w1", "linear_w"),
    "entity_classification.linear.bias": ("ent_b1", "bias"),
    "entity_classification.entity_classifier.weight": ("ent_w2", "linear_w"),
    "entity_classification.entity_classifier.bias": ("ent_b2", "bias"),
    # RelationClassificationMultiInstance
    "relation_classification.pair_linear.weight": ("mp_w", "linear_w"),
    "relation_classification.pair_linear.bias": ("mp_b", "bias"),
    "relation_classification.rel_linear.weight": ("rel_w1", "linear_w"),
    "relation_classification.rel_linear.bias": ("rel_b1", "bias"),
    "relation_classification.token_distance_embeddings.weight":
        ("tdist_emb", "emb"),
    "relation_classification.sentence_distance_embeddings.weight":
        ("sdist_emb", "emb"),
    "relation_classification.entity_type_embeddings.weight":
        ("etype_emb", "emb"),
    # EntityPairRepresentation (JointGlobalModel only)
    "entity_pair_representation.entity_pair_linear.weight":
        ("pair_w", "linear_w"),
    "entity_pair_representation.entity_pair_linear.bias":
        ("pair_b", "bias"),
    "entity_pair_representation.entity_embeddings.weight":
        ("etype_emb", "emb"),
}
# relation_classification.rel_classifier exists in BOTH model variants
# with the same shape (n_rel_types, hidden); which SurrogateWeights
# slot it fills depends on the variant, detected by pair_linear's
# presence (MI) vs entity_pair_representation's (global).


def load_jerex_state_dict(sd: dict, cfg: PipelineConfig = DEFAULT,
                          base: SurrogateWeights | None = None
                          ) -> tuple[SurrogateWeights, dict]:
    """Map a JEREX checkpoint ``state_dict`` (torch tensor / numpy
    array values under the reference's exact key names) onto the
    SurrogateWeights layout.  Returns (weights, report) where report
    lists ``consumed`` keys (heads AND, when present, the ``bert.*``
    encoder — bert_numpy implements the BERT inference forward, so a
    checkpoint's learned encoder drives the pipeline for real; only
    ``bert.pooler.*`` is ignored, unused at inference) and
    ``kept_surrogate`` fields (heads absent from this checkpoint
    variant).

    Every consumed tensor is shape-checked against the cfg-derived
    expectation; a mismatch raises instead of silently mis-mapping —
    loading a real DocRED checkpoint therefore needs
    ``cfg.hidden_size=768`` and the DocRED type ontology, which are
    plain config values.
    """
    import numpy as _np

    def arr(v):
        a = getattr(v, "detach", lambda: v)()
        a = getattr(a, "numpy", lambda: a)()
        return _np.asarray(a, dtype=np.float32)

    fields = dict()
    consumed, ignored = [], []
    mi = "relation_classification.pair_linear.weight" in sd
    glob = ("entity_pair_representation.entity_pair_linear.weight" in sd)
    if (mi and glob and "entity_pair_representation.entity_embeddings."
            "weight" in sd
            and "relation_classification.entity_type_embeddings.weight"
            in sd):
        raise ValueError(
            "state_dict carries BOTH variants' entity-type embeddings; "
            "a JEREX checkpoint is one model — refusing to guess")
    bert_keys = {}
    for key, v in sd.items():
        if key.startswith("bert."):
            if key.startswith("bert.pooler."):
                ignored.append(key)   # unused at inference (ref uses
            else:                     # last_hidden_state only)
                bert_keys[key] = v
            continue
        if key == "relation_classification.rel_classifier.weight":
            fields["rel_w2" if mi else "relg_w"] = arr(v).T
            consumed.append(key)
            continue
        if key == "relation_classification.rel_classifier.bias":
            fields["rel_b2" if mi else "relg_b"] = arr(v)
            consumed.append(key)
            continue
        if key not in _JEREX_HEAD_MAP:
            raise ValueError(f"unrecognized state_dict key {key!r} — "
                             f"not a JEREX head or bert.* parameter")
        name, kind = _JEREX_HEAD_MAP[key]
        a = arr(v)
        if kind == "linear_w":
            fields[name] = a.T
        elif kind == "vec_w":           # (1, d) classifier row
            fields[name] = a.reshape(-1)
        elif kind == "scalar":          # (1,) bias
            # float fields skip the later shape check, so validate here:
            # a multi-element "bias" must raise, not truncate to [0]
            if a.size != 1:
                raise ValueError(
                    f"shape mismatch for {name}: checkpoint "
                    f"{tuple(a.shape)} vs expected scalar (1,)")
            fields[name] = float(a.reshape(-1)[0])
        else:                           # embedding (count, m)
            fields[name] = a
        consumed.append(key)

    # bert.* encoder: consumed for real when the checkpoint carries one
    # (bert_numpy implements the inference forward); heads then run on
    # the checkpoint's OWN contextual vectors — the full model swap
    bert_w = None
    if bert_keys:
        from .bert_numpy import bert_from_state_dict
        bert_w = bert_from_state_dict(bert_keys, cfg.bert_num_heads)
        if cfg.wordpiece_vocab is None:
            # real-encoder fidelity is this path's whole purpose: the
            # crc32 surrogate tokenizer produces ids that are
            # MEANINGLESS indexes into a real embedding table (encode
            # raises outright if they exceed the vocab).  Legitimate
            # only for synthetic checkpoints in tests.
            import warnings
            warnings.warn(
                "bert.* encoder loaded but cfg.wordpiece_vocab is not "
                "set: the crc32 surrogate tokenizer's ids do not index "
                "this checkpoint's embedding table meaningfully — set "
                "cfg.wordpiece_vocab to the checkpoint's vocab.txt for "
                "faithful output", stacklevel=2)
        if bert_w.tok.shape[1] != cfg.hidden_size:
            raise ValueError(
                f"bert hidden size {bert_w.tok.shape[1]} != "
                f"cfg.hidden_size {cfg.hidden_size} — the heads consume "
                f"the encoder's vectors; set cfg.hidden_size to the "
                f"checkpoint's")
        consumed += sorted(bert_keys)

    base = base if base is not None else load_weights(cfg)
    expect = {f: getattr(base, f) for f in _FIELDS}
    for name, a in fields.items():
        want = expect[name]
        if isinstance(want, float):
            continue
        if tuple(a.shape) != tuple(want.shape):
            raise ValueError(
                f"shape mismatch for {name}: checkpoint "
                f"{tuple(a.shape)} vs cfg-derived {tuple(want.shape)} — "
                f"set cfg geometry (hidden_size / meta_embedding_size / "
                f"type ontology / bucket counts) to the checkpoint's")
    kept = [f for f in _FIELDS if f not in fields]
    merged = SurrogateWeights(**{**expect, **fields},
                              bert=bert_w if bert_w is not None
                              else base.bert)
    report = {"consumed": sorted(consumed), "ignored": sorted(ignored),
              "kept_surrogate": sorted(kept),
              "encoder": "checkpoint_bert" if bert_w is not None
              else "surrogate",
              "variant": "multi_instance" if mi
              else ("global" if glob else "heads_common")}
    return merged, report
