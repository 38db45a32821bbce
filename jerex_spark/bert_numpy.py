"""Numpy BERT encoder forward — closes the ``bert.*`` checkpoint boundary.

The reference embeds documents with a HuggingFace BERT and feeds the
last hidden state to the scoring heads (ref jerex/models/
joint_models.py:57,78 ``self.bert(input_ids=encodings,
attention_mask=context_masks)['last_hidden_state']``).  torch is
unavailable in this environment, so this module implements the public
BERT-architecture inference forward (Devlin et al. 2019; post-LN
transformer encoder) in pure fp32 numpy:

  embeddings (word + position + token-type, LayerNorm eps=1e-12)
  -> L x [ multi-head self-attention + residual + LayerNorm,
           GELU FFN + residual + LayerNorm ]

With a published checkpoint's ``bert.*`` tensors exported into the
same .npz weight artifact as the heads (weights.py
load_jerex_state_dict now consumes them), the whole model swap is a
weight-file change, not a code change.

Fidelity notes (stated, not hidden):

* Inference is per document with no padding, which is mathematically
  identical to the reference's padded+masked batch forward for the
  real tokens (masked softmax excludes pads; LayerNorm/FFN are
  per-position).
* GELU uses the erf form BERT trains with; numpy has no erf, so it is
  computed with the Abramowitz & Stegun 7.1.26 rational approximation
  (|error| <= 1.5e-7 — below fp32 epsilon, i.e. exact at the fp32
  precision the whole pipeline runs in; asserted against math.erf in
  tests).
* Positions beyond the checkpoint's (extended) position table saturate
  at the last row.  The reference extends the table to
  position_embeddings_count=700 (ref jerex/models/__init__.py:57-67)
  and would index-error beyond that; saturation keeps arbitrarily long
  web documents processable and is the documented divergence.
* Runtime: O(L * (T^2 d + T d^2)) per doc — a real 12-layer d=768
  checkpoint costs ~100x the surrogate encoder; it runs inside the
  same Arrow-batched extract UDF, so the scale story (shuffle-free,
  doc-partitioned) is unchanged, only the per-doc constant grows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_LN_EPS = np.float32(1e-12)     # BERT LayerNorm epsilon

# Abramowitz & Stegun 7.1.26 erf coefficients
_ERF_A = (0.254829592, -0.284496736, 1.421413741,
          -1.453152027, 1.061405429)
_ERF_P = 0.3275911


@dataclass(frozen=True)
class BertWeights:
    """Stacked per-layer tensors, stored in x @ W (in, out) layout —
    torch Linear (out, in) weights transpose on load."""
    n_heads: int
    tok: np.ndarray        # (V, d)
    pos: np.ndarray        # (P, d)
    typ: np.ndarray        # (n_types, d)
    emb_ln_g: np.ndarray   # (d,)
    emb_ln_b: np.ndarray   # (d,)
    q_w: np.ndarray        # (L, d, d)
    q_b: np.ndarray        # (L, d)
    k_w: np.ndarray
    k_b: np.ndarray
    v_w: np.ndarray
    v_b: np.ndarray
    ao_w: np.ndarray       # (L, d, d)  attention output dense
    ao_b: np.ndarray
    a_ln_g: np.ndarray     # (L, d)
    a_ln_b: np.ndarray
    fi_w: np.ndarray       # (L, d, di) intermediate dense
    fi_b: np.ndarray       # (L, di)
    fo_w: np.ndarray       # (L, di, d) output dense
    fo_b: np.ndarray       # (L, d)
    f_ln_g: np.ndarray
    f_ln_b: np.ndarray


def erf(x: np.ndarray) -> np.ndarray:
    """Vectorized erf, A&S 7.1.26: max abs error 1.5e-7 (< fp32 eps)."""
    x = np.asarray(x, dtype=np.float32)
    sign = np.sign(x)
    ax = np.abs(x).astype(np.float64)
    t = 1.0 / (1.0 + _ERF_P * ax)
    poly = t * (_ERF_A[0] + t * (_ERF_A[1] + t * (
        _ERF_A[2] + t * (_ERF_A[3] + t * _ERF_A[4]))))
    return (sign * (1.0 - poly * np.exp(-ax * ax))).astype(np.float32)


def gelu(x: np.ndarray) -> np.ndarray:
    """BERT's exact-erf GELU: x * 0.5 * (1 + erf(x / sqrt(2)))."""
    return (x * 0.5 * (1.0 + erf(x / np.float32(np.sqrt(2.0))))
            ).astype(np.float32)


def layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = np.square(x - mu).mean(axis=-1, keepdims=True)
    return ((x - mu) / np.sqrt(var + _LN_EPS) * g + b).astype(np.float32)


def _softmax_lastaxis(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def bert_encode(ids: np.ndarray, bw: BertWeights) -> np.ndarray:
    """(T,) sub-word ids -> (T, d) last-hidden-state, fp32."""
    T = ids.size
    d = bw.tok.shape[1]
    if T == 0:
        return np.zeros((0, d), dtype=np.float32)
    V = bw.tok.shape[0]
    if ids.max() >= V or ids.min() < 0:
        # a silent wrap here would feed a vocab-mismatched checkpoint
        # arbitrary embeddings — fail loudly like every other shape
        # mismatch in this module
        raise ValueError(
            f"sub-word id {int(ids.max() if ids.max() >= V else ids.min())}"
            f" outside the checkpoint's vocab [0, {V}) — the tokenizer's "
            f"vocab does not match this encoder; set cfg.wordpiece_vocab "
            f"to the checkpoint's vocab.txt (and cfg.vocab_size to {V})")
    pos = np.minimum(np.arange(T), bw.pos.shape[0] - 1)
    x = (bw.tok[ids] + bw.pos[pos] + bw.typ[0]).astype(np.float32)
    x = layer_norm(x, bw.emb_ln_g, bw.emb_ln_b)
    H = bw.n_heads
    dh = d // H
    scale = np.float32(1.0 / np.sqrt(dh))
    for li in range(bw.q_w.shape[0]):
        q = (x @ bw.q_w[li] + bw.q_b[li]).reshape(T, H, dh)
        k = (x @ bw.k_w[li] + bw.k_b[li]).reshape(T, H, dh)
        v = (x @ bw.v_w[li] + bw.v_b[li]).reshape(T, H, dh)
        q = q.transpose(1, 0, 2)                     # (H, T, dh)
        k = k.transpose(1, 0, 2)
        v = v.transpose(1, 0, 2)
        attn = _softmax_lastaxis((q @ k.transpose(0, 2, 1)) * scale)
        ctx = (attn @ v).transpose(1, 0, 2).reshape(T, d)
        x = layer_norm(x + (ctx @ bw.ao_w[li] + bw.ao_b[li]),
                       bw.a_ln_g[li], bw.a_ln_b[li])
        h = gelu(x @ bw.fi_w[li] + bw.fi_b[li])
        x = layer_norm(x + (h @ bw.fo_w[li] + bw.fo_b[li]),
                       bw.f_ln_g[li], bw.f_ln_b[li])
    return x.astype(np.float32)


# --- HF-layout state_dict -> BertWeights --------------------------------
def _get(sd: dict, key: str) -> np.ndarray:
    """Fetch with the gamma/beta LayerNorm aliases old HF exports use."""
    for k in (key, key.replace("LayerNorm.weight", "LayerNorm.gamma")
              .replace("LayerNorm.bias", "LayerNorm.beta")):
        if k in sd:
            v = sd[k]
            a = getattr(v, "detach", lambda: v)()
            a = getattr(a, "numpy", lambda: a)()
            return np.asarray(a, dtype=np.float32)
    raise ValueError(f"bert.* encoder present but key {key!r} missing — "
                     f"a partial encoder cannot load")


def bert_from_state_dict(sd: dict, n_heads: int) -> BertWeights:
    """Build BertWeights from HF ``bert.*`` keys (layer count inferred
    from the keys; ``bert.pooler.*`` is unused at inference and
    ignored, matching the reference's last_hidden_state-only use)."""
    E = "bert.embeddings."
    tok = _get(sd, E + "word_embeddings.weight")
    d = tok.shape[1]
    if d % n_heads:
        raise ValueError(f"hidden size {d} not divisible by "
                         f"n_heads {n_heads}")
    layers = sorted({int(k.split(".")[3]) for k in sd
                     if k.startswith("bert.encoder.layer.")})
    if layers != list(range(len(layers))) or not layers:
        raise ValueError(f"bert.encoder.layer indices not contiguous "
                         f"from 0: {layers}")

    def stack(fmt: str, transpose: bool) -> np.ndarray:
        arrs = [_get(sd, fmt.format(li)) for li in layers]
        # C-contiguous so the in-memory layout is identical to what an
        # .npz roundtrip yields — BLAS picks different kernels (and
        # fp32 summation orders) for transposed-view inputs, which
        # would make "same weights, different path" differ in the last
        # ulps
        return np.ascontiguousarray(
            np.stack([a.T if transpose else a for a in arrs]))

    L = "bert.encoder.layer.{}."
    return BertWeights(
        n_heads=n_heads,
        tok=tok,
        pos=_get(sd, E + "position_embeddings.weight"),
        typ=_get(sd, E + "token_type_embeddings.weight"),
        emb_ln_g=_get(sd, E + "LayerNorm.weight"),
        emb_ln_b=_get(sd, E + "LayerNorm.bias"),
        q_w=stack(L + "attention.self.query.weight", True),
        q_b=stack(L + "attention.self.query.bias", False),
        k_w=stack(L + "attention.self.key.weight", True),
        k_b=stack(L + "attention.self.key.bias", False),
        v_w=stack(L + "attention.self.value.weight", True),
        v_b=stack(L + "attention.self.value.bias", False),
        ao_w=stack(L + "attention.output.dense.weight", True),
        ao_b=stack(L + "attention.output.dense.bias", False),
        a_ln_g=stack(L + "attention.output.LayerNorm.weight", False),
        a_ln_b=stack(L + "attention.output.LayerNorm.bias", False),
        fi_w=stack(L + "intermediate.dense.weight", True),
        fi_b=stack(L + "intermediate.dense.bias", False),
        fo_w=stack(L + "output.dense.weight", True),
        fo_b=stack(L + "output.dense.bias", False),
        f_ln_g=stack(L + "output.LayerNorm.weight", False),
        f_ln_b=stack(L + "output.LayerNorm.bias", False),
    )


_BERT_FIELDS = [f for f in BertWeights.__dataclass_fields__]


def bert_to_npz_dict(bw: BertWeights) -> dict:
    """Flatten into ``bert__``-prefixed arrays for the .npz artifact."""
    out = {}
    for f in _BERT_FIELDS:
        v = getattr(bw, f)
        out[f"bert__{f}"] = np.asarray(v)
    return out


def bert_from_npz(z) -> BertWeights | None:
    """Rebuild from an .npz, or None when the artifact has no encoder."""
    if "bert__tok" not in getattr(z, "files", z):
        return None
    kw = {}
    for f in _BERT_FIELDS:
        a = z[f"bert__{f}"]
        kw[f] = int(a) if f == "n_heads" else a.astype(np.float32)
    return BertWeights(**kw)
