"""Loss reductions (SURVEY.md §2.4 A7; ref jerex/loss.py:19-88).

Masked-mean binary cross-entropy / cross-entropy per task head and the
weighted joint sum (weights 1/1/0.25/1 — ref configs/docred_joint/
train.yaml:24-25).  Training itself is out of scope (the pipeline
consumes frozen weights), but these definitions anchor train-parity
tests and are plain fp32 numpy aggregations — the same
``sum(x*mask)/sum(mask)`` shape as a Spark agg.
"""

from __future__ import annotations

import numpy as np

_EPS = np.float32(1e-12)


def bce_with_logits(logits: np.ndarray, targets: np.ndarray,
                    mask: np.ndarray | None = None) -> float:
    """Masked-mean sigmoid BCE (numerically stable log-sum-exp form)."""
    x = logits.astype(np.float32)
    z = targets.astype(np.float32)
    per = np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x)))
    if mask is None:
        mask = np.ones_like(per)
    m = mask.astype(np.float32)
    return float((per * m).sum() / np.maximum(m.sum(), _EPS))


def ce_with_logits(logits: np.ndarray, target_idx: np.ndarray,
                   mask: np.ndarray | None = None) -> float:
    """Masked-mean softmax cross-entropy over the last axis."""
    x = logits.astype(np.float32)
    x = x - x.max(axis=-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
    per = -np.take_along_axis(logp, target_idx[..., None],
                              axis=-1).squeeze(-1)
    if mask is None:
        mask = np.ones_like(per)
    m = mask.astype(np.float32)
    return float((per * m).sum() / np.maximum(m.sum(), _EPS))


def joint_loss(mention_loss: float, coref_loss: float, entity_loss: float,
               rel_loss: float, weights=(1.0, 1.0, 0.25, 1.0)) -> float:
    """Weighted sum of the four task losses (ref loss.py:19-88;
    entity weight 0.25 — ref configs/docred_joint/train.yaml:24)."""
    parts = (mention_loss, coref_loss, entity_loss, rel_loss)
    return float(sum(w * p for w, p in zip(weights, parts)))
