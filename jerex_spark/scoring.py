"""Shared numpy scoring-head math (SURVEY.md §2.6 F1-F10).

Pure fp32 numpy reimplementations of the reference's scoring heads:

* F1 encoder         ref jerex/models/joint_models.py:57,78 (BERT; here
                     the frozen surrogate: token+position embedding with
                     local contextual mixing, tanh projection)
* F2 mention score   ref jerex/models/modules/mention_localization.py:14-22
* F3 coref score     ref jerex/models/modules/coreference_resolution.py:36-50
* F4 entity typing   ref jerex/models/modules/entity_classification.py:13-17
* F7/F8 MI relation  ref .../relation_classification_multi_instance.py:59-105
* F10 distances      ref jerex/sampling/sampling_common.py:287-315
* A1-A4 max-pools    ref mention_representation.py:25-31 etc.

Both the plain-Python reference executor and the Spark extract UDF call
these functions, with identical fp32 op order, so threshold-borderline
scores cannot diverge between the two sides (SURVEY.md §7.3 item 2).
"""

from __future__ import annotations

import numpy as np

from .config import DEFAULT, PipelineConfig
from .weights import SurrogateWeights


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x.astype(np.float32)))


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x.astype(np.float32)
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, np.float32(0))


def encode(encoding: list[int], w: SurrogateWeights,
           cfg: PipelineConfig = DEFAULT) -> np.ndarray:
    """F1: (L,) sub-word ids -> (L, d) fp32 contextual vectors.

    Dispatches to the numpy BERT forward (bert_numpy.py) when the
    weight artifact carries a loaded ``bert.*`` encoder; otherwise the
    frozen surrogate below."""
    ids = np.asarray(encoding, dtype=np.int64)
    if ids.size == 0:
        return np.zeros((0, cfg.hidden_size), dtype=np.float32)
    if w.bert is not None:
        from .bert_numpy import bert_encode
        return bert_encode(ids, w.bert)
    e = w.tok_emb[ids % cfg.vocab_size]
    pos = np.arange(ids.size) % cfg.max_positions
    # local mixing: h_i = .5 e_i + .25 e_{i-1} + .25 e_{i+1}
    prev_e = np.vstack([e[:1], e[:-1]])
    next_e = np.vstack([e[1:], e[-1:]])
    mixed = 0.5 * e + 0.25 * prev_e + 0.25 * next_e + w.pos_emb[pos]
    return np.tanh(mixed @ w.enc_w).astype(np.float32)


def token_maxpool(h: np.ndarray, tok_sub_start: np.ndarray,
                  tok_sub_end: np.ndarray) -> np.ndarray:
    """Per-token max over the token's sub-word vectors — the first level
    of the span pooling hierarchy."""
    return span_maxpool(h, tok_sub_start, tok_sub_end)


def span_maxpool_windows(tokpool: np.ndarray, starts: np.ndarray,
                         sizes: np.ndarray, max_size: int) -> np.ndarray:
    """Exact window max over token pools via the sparse-table doubling
    trick: precompute mP[i] = max(tokpool[i..i+2^p-1]) for each power of
    two, then any window of length k is max(mP[start], mP[start+k-P])
    with P = 2^floor(log2 k).  O(T log S) traffic instead of the
    O(sum span lens) gather — identical fp32 results (max is
    order-insensitive), ~10x less memory movement at 500 spans/doc.

    (A reused-scratch variant of the level buffers was A/B-measured at
    ~3% SLOWER than these small per-call allocations — the cost here is
    the level-select gathers, not the allocator; don't redo it.)
    """
    T = tokpool.shape[0]
    levels = [tokpool]
    p = 1
    while p * 2 <= max_size and p < T:
        prev = levels[-1]
        nxt = np.empty_like(prev)
        np.maximum(prev[:T - p], prev[p:], out=nxt[:T - p])
        nxt[T - p:] = prev[T - p:]      # tail: window clipped at T
        levels.append(nxt)
        p *= 2
    lvl_idx = np.floor(np.log2(np.maximum(sizes, 1))).astype(np.int64)
    lvl_idx = np.minimum(lvl_idx, len(levels) - 1)
    out = np.empty((len(starts), tokpool.shape[1]), dtype=np.float32)
    for li in range(len(levels)):
        m = lvl_idx == li
        if not m.any():
            continue
        s = starts[m]
        e = s + sizes[m] - (1 << li)
        out[m] = np.maximum(levels[li][s], levels[li][e])
    return out


def span_maxpool(h: np.ndarray, sub_start: np.ndarray,
                 sub_end: np.ndarray) -> np.ndarray:
    """A1: masked max over the sub-word vectors of each span.

    Equivalent to the reference's -1e30 masked max
    (ref mention_representation.py:25-31); fully vectorized via a flat
    gather + segmented ``maximum.reduceat`` (max is order-insensitive,
    so this is bit-identical to a per-span loop).
    """
    n = len(sub_start)
    d = h.shape[1] if h.ndim == 2 else 0
    if n == 0:
        return np.zeros((0, d), dtype=np.float32)
    sub_start = np.asarray(sub_start, dtype=np.int64)
    sub_end = np.asarray(sub_end, dtype=np.int64)
    lens = sub_end - sub_start
    csum = np.cumsum(lens)
    idx = (np.repeat(sub_start, lens)
           + np.arange(csum[-1]) - np.repeat(csum - lens, lens))
    bounds = np.concatenate([[0], csum[:-1]])
    return np.maximum.reduceat(h[idx], bounds, axis=0)


def mention_logits(span_repr: np.ndarray, sizes: np.ndarray,
                   w: SurrogateWeights) -> np.ndarray:
    """F2: concat(span_repr, size_emb[size]) -> MLP -> logit.

    Computed as a split matmul (span part + per-size lookup of the
    size-embedding part) — avoids materializing the (n, d+m) concat,
    which dominated memory traffic at ~500 spans/doc.  Same math as
    ``concat(x) @ W``; both parity sides share this code path, so fp
    rounding is identical between them.
    """
    d = span_repr.shape[1]
    # size_emb @ men_w1[d:] has only max_span_size+1 distinct rows;
    # fold the bias in so the per-span adds below stay a single pass
    size_part = w.size_emb @ w.men_w1[d:] + w.men_b1
    # chunked with a REUSED (chunk, d) scratch: this head runs over
    # EVERY span candidate in the corpus and is bandwidth-bound — a
    # full-width (n, d) hidden buffer is a fresh multi-MB allocation
    # per batch that streams through the memory bus once per op;
    # keeping the working set L2-resident is ~25-40% faster and the
    # values are bit-identical (GEMM row blocks are independent)
    chunk = 16384
    out = np.empty(len(span_repr), dtype=np.float32)
    scratch = np.empty((min(chunk, len(span_repr)), d), dtype=np.float32)
    for i in range(0, len(span_repr), chunk):
        j = min(i + chunk, len(span_repr))
        h = scratch[: j - i]
        np.matmul(span_repr[i:j], w.men_w1[:d], out=h)
        h += size_part[sizes[i:j]]
        np.maximum(h, np.float32(0), out=h)
        np.matmul(h, w.men_w2, out=out[i:j])
    out += np.float32(w.men_b2)
    return out


def coref_logits(m1: np.ndarray, m2: np.ndarray, ed_bucket: np.ndarray,
                 w: SurrogateWeights) -> np.ndarray:
    """F3: concat(m1, m2, ed_emb[edit_dist]) -> MLP -> logit.

    Split matmul (see mention_pair_repr): the edit-distance block
    collapses to a bucket-count-row lookup; no (n, 2d+m) concat."""
    d = m1.shape[1]
    W = w.cor_w1
    ed_part = w.ed_emb @ W[2 * d:]
    x = m1 @ W[:d]
    x += m2 @ W[d:2 * d]
    x += ed_part[ed_bucket]
    x += w.cor_b1
    np.maximum(x, np.float32(0), out=x)
    return (x @ w.cor_w2 + np.float32(w.cor_b2)).astype(np.float32)


def entity_type_logits(ent_repr: np.ndarray, w: SurrogateWeights) -> np.ndarray:
    """F4: entity repr -> MLP -> per-type logits (argmax = lowest index on
    ties, matching torch semantics — ref joint_models.py:227)."""
    hidden = relu(ent_repr @ w.ent_w1 + w.ent_b1)
    return (hidden @ w.ent_w2 + w.ent_b2).astype(np.float32)


def pair_block(ep: np.ndarray, w: SurrogateWeights) -> np.ndarray:
    """The entity-pair block of the F7 linear head, evaluated at the
    entity-pair level (callers repeat the result per mention pair —
    cheaper than repeating the 2d-wide input and multiplying per
    mention pair)."""
    d = (w.mp_w.shape[0] - 2 * w.tdist_emb.shape[1]) // 5
    return (ep @ w.mp_w[3 * d:5 * d]).astype(np.float32)


def mention_pair_repr(ctx: np.ndarray, m1: np.ndarray, m2: np.ndarray,
                      pair_repr: np.ndarray, tdist: np.ndarray,
                      sdist: np.ndarray, w: SurrogateWeights,
                      pair_term: np.ndarray | None = None) -> np.ndarray:
    """F7: concat(ctx, m1, m2, entity_pair_repr, tok/sent dist embs) -> Linear.

    ref relation_classification_multi_instance.py:59-87.  NOTE: the
    reference applies NO activation here (``dropout(pair_linear(x))``,
    line 87) — the max-pooled mention-pair representation keeps its
    negative components into rel_linear.  Faithful to that (an earlier
    revision relu'd here, which a real checkpoint would notice).

    Split matmul: the (n, 5d+2m) concat never materializes — each
    input block multiplies its own weight slice and accumulates into
    one (n, d) buffer; the two distance-embedding blocks collapse to
    bucket-count-row lookup tables.  Same math as ``concat(x) @ W``
    blockwise; both parity sides share this code path.  ``pair_term``,
    when given, replaces the entity-pair block with a precomputed
    ``pair_block(...)`` result (pair_repr is then ignored)."""
    d = ctx.shape[1]
    m = w.tdist_emb.shape[1]
    W = w.mp_w
    td_part = w.tdist_emb @ W[5 * d:5 * d + m]
    sd_part = w.sdist_emb @ W[5 * d + m:]
    x = ctx @ W[:d]
    x += m1 @ W[d:2 * d]
    x += m2 @ W[2 * d:3 * d]
    if pair_term is None:
        x += pair_repr @ W[3 * d:5 * d]
    else:
        x += pair_term
    x += td_part[tdist]
    x += sd_part[sdist]
    x += w.mp_b
    return x.astype(np.float32)


def relation_logits(pooled: np.ndarray, head_type: np.ndarray,
                    tail_type: np.ndarray, w: SurrogateWeights) -> np.ndarray:
    """F8: pooled pair repr (+) head/tail type embeddings -> MLP -> per-type
    logits.  ref relation_classification_multi_instance.py:89-105."""
    x = np.concatenate(
        [pooled, w.etype_emb[head_type], w.etype_emb[tail_type]], axis=1)
    hidden = relu(x @ w.rel_w1 + w.rel_b1)
    return (hidden @ w.rel_w2 + w.rel_b2).astype(np.float32)


def entity_pair_global_repr(head: np.ndarray, tail: np.ndarray,
                            head_type: np.ndarray, tail_type: np.ndarray,
                            w: SurrogateWeights) -> np.ndarray:
    """F6: concat(head_repr, tail_repr, etype_emb[head], etype_emb[tail])
    -> Linear -> relu (dropout is identity at inference).

    ref entity_pair_representation.py:6-27 (EntityPairRepresentation:
    entity_pair_linear over batch-indexed entity pairs + entity-type
    meta embeddings, then relu)."""
    x = np.concatenate(
        [head, tail, w.etype_emb[head_type], w.etype_emb[tail_type]],
        axis=1)
    return relu(x @ w.pair_w + w.pair_b).astype(np.float32)


def relation_logits_global(pair_repr: np.ndarray,
                           w: SurrogateWeights) -> np.ndarray:
    """F9: global relation head — single Linear over the entity-pair
    representation (ref relation_classification_global.py:10-13)."""
    return (pair_repr @ w.relg_w + w.relg_b).astype(np.float32)


def context_pool(h: np.ndarray, first_end: int, second_start: int,
                 d: int) -> np.ndarray:
    """A4: masked max over sub-word tokens strictly between two mentions;
    zero vector if adjacent/overlapping
    (ref relation_classification_multi_instance.py:72-78)."""
    if second_start > first_end:
        return h[first_end:second_start].max(axis=0)
    return np.zeros(d, dtype=np.float32)


def token_distance(first_end: int, second_start: int) -> int:
    """F10: max(0, second.start - (first.end - 1)) in end-EXCLUSIVE
    token coordinates (ref sampling_common.py:297-315 subtracts the
    first mention's LAST token index, i.e. first.end - 1, so two
    adjacent mentions are at distance 1, not 0)."""
    return max(0, second_start - first_end + 1)


_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}
_TRIU_CACHE_MAX = 4096


def triu_pairs(n: int) -> tuple[np.ndarray, np.ndarray]:
    """np.triu_indices(n, 1), memoized per n.  Mention/entity counts
    repeat heavily across a corpus batch, and triu_indices rebuilds a
    boolean mask + nonzero scan per call — measurable in the per-doc
    coref/cluster assembly loops.  Returned arrays are shared: callers
    must treat them as read-only (they all do — pure gathers)."""
    hit = _TRIU_CACHE.get(n)
    if hit is None:
        hit = np.triu_indices(n, 1)
        if len(_TRIU_CACHE) < _TRIU_CACHE_MAX:
            _TRIU_CACHE[n] = hit
    return hit


_ED_CACHE: dict[tuple[str, str], int] = {}
_ED_CACHE_MAX = 1 << 18


def edit_distance(a: str, b: str) -> int:
    """J2: plain DP Levenshtein (semantics of ref jerex/util.py:93-106).

    Memoized per process: mention phrases repeat heavily across a web
    corpus, so the hit rate is high and the cache is value-transparent.
    """
    key = (a, b)
    hit = _ED_CACHE.get(key)
    if hit is not None:
        return hit
    d = _edit_distance_raw(a, b)
    if len(_ED_CACHE) < _ED_CACHE_MAX:
        _ED_CACHE[key] = d
    return d


def _edit_distance_raw(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]
