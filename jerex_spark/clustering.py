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
    min member index."""
    n = dist.shape[0]
    if n == 0:
        return []
    if n == 1:
        return [[0]]
    clusters: list[list[int]] = [[i] for i in range(n)]

    def cl_dist(a: list[int], b: list[int]) -> float:
        mx = -np.inf
        for i in a:
            for j in b:
                lo, hi = (i, j) if i < j else (j, i)
                v = dist[lo, hi]
                if v > mx:
                    mx = v
        return mx

    while len(clusters) > 1:
        best = None
        best_d = None
        for ai in range(len(clusters)):
            for bi in range(ai + 1, len(clusters)):
                d = cl_dist(clusters[ai], clusters[bi])
                key = (d, clusters[ai][0], clusters[bi][0])
                if best_d is None or key < best_d:
                    best_d = key
                    best = (ai, bi)
        if best_d is None or best_d[0] >= threshold:
            break
        ai, bi = best
        merged = sorted(clusters[ai] + clusters[bi])
        clusters = [c for k, c in enumerate(clusters) if k not in (ai, bi)]
        clusters.append(merged)
        clusters.sort(key=lambda c: c[0])
    clusters.sort(key=lambda c: c[0])
    return clusters
