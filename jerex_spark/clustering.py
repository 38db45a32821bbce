"""Deterministic complete-linkage agglomerative clustering (C1).

Reimplements the semantics of the reference's coref clustering
(ref jerex/models/misc.py:93-158): mentions are merged bottom-up while
the *maximum* pairwise distance between two clusters stays strictly
below ``1 - coref_threshold``; a single mention is a singleton cluster
(ref misc.py:108-109).  The reference delegates to sklearn's
AgglomerativeClustering(linkage='complete', affinity='precomputed');
we own the implementation to remove sklearn version sensitivity and to
pin tie-breaking explicitly (SURVEY.md §2.5, §7.3 item 1):

* at each step merge the cluster pair with the smallest complete-link
  distance; ties broken lexicographically on (min member idx of a,
  min member idx of b).
* the distance matrix is built from the upper-triangle ordered pair
  (i, j), i < j — matching the reference's last-write matrix fill
  (ref misc.py:128-129) where sklearn's condensed form reads the
  upper cell.

O(n^3) worst case; documents hold at most ~max_mentions_per_doc
mentions, so per-doc cost is bounded and executor-local (no shuffle).
"""

from __future__ import annotations

import numpy as np


def complete_linkage(dist: np.ndarray, threshold: float) -> list[list[int]]:
    """Cluster ``n`` items given an (n, n) distance matrix (upper triangle
    authoritative).  Returns clusters as sorted member lists, ordered by
    min member index.

    Vectorized Lance-Williams form: a cluster-level distance matrix is
    maintained under the complete-link max rule (d(a∪b, c) =
    max(d(a,c), d(b,c)) — exact, max is associative), each cluster
    labeled by its minimum member index.  ``np.argmin``'s first-hit
    row-major scan over the upper triangle IS the deterministic
    tie-break (smallest distance, then smallest head-cluster min
    member, then smallest tail) that the previous per-pair Python loop
    implemented — same clusters on every input, O(n^2) numpy per merge
    instead of a Python quadruple loop."""
    n = dist.shape[0]
    if n == 0:
        return []
    if n == 1:
        return [[0]]
    W = np.full((n, n), np.inf, dtype=np.float64)
    from .scoring import triu_pairs
    iu = triu_pairs(n)
    W[iu] = dist[iu]
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    while len(members) > 1:
        flat = int(np.argmin(W))
        i, j = divmod(flat, n)
        if not np.isfinite(W[i, j]) or W[i, j] >= threshold:
            break
        # merge j into i (i < j: only the upper triangle is finite, so
        # the merged cluster keeps the smaller min-member label)
        di = np.full(n, np.inf)
        di[:i] = W[:i, i]
        di[i + 1:] = W[i, i + 1:]
        dj = np.full(n, np.inf)
        dj[:j] = W[:j, j]
        dj[j + 1:] = W[j, j + 1:]
        nd = np.maximum(di, dj)
        W[:i, i] = nd[:i]
        W[i, i + 1:] = nd[i + 1:]
        W[i, i] = np.inf
        W[j, :] = np.inf
        W[:, j] = np.inf
        members[i] = sorted(members[i] + members.pop(j))
    return [members[k] for k in sorted(members)]
