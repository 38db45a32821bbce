"""10x scale probe: run the heavy operator family at sf0.1 and at a
10x-replicated corpus ("sf1") in the same session and report the
runtime ratio plus peak RSS — the check that the plan shapes hold
beyond the bench scale (no query super-linear in input size, no
memory blow-up).

The 10x corpus replicates sf0.1 with shifted ids (doc_id/vec_id +
k * n) into a scratch directory — content distribution identical,
cardinality 10x.  ``ngram_jaccard`` / ``embdup_cosine_exact`` are the
declared all-pairs baselines and refuse inputs this large (the guard
is part of the design; the probe asserts it fires).  The LSH queries
run with NO overrides: similarity.lsh_schedule derives (bands, bits)
from the input count, so the 10x leg exercises the default entry
point end-to-end (bucket size n/2^bits held ~constant automatically).

Usage: python scripts/scale_probe.py [out_dir] [--only q1,q2,...]
(out_dir default /tmp/sf1; --only restricts the probe to a subset of
the family, for probing newly added queries without re-running all).
Prints one JSON line per family member + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPLICAS = 10


def build_sf1(src: str, dst: str) -> None:
    import pandas as pd
    os.makedirs(dst, exist_ok=True)
    if not os.path.exists(os.path.join(dst, "documents.parquet")):
        d = pd.read_parquet(os.path.join(src, "documents.parquet"))
        n = len(d)
        reps = []
        for k in range(REPLICAS):
            r = d.copy()
            r["doc_id"] = r["doc_id"] + k * n
            reps.append(r)
        pd.concat(reps, ignore_index=True).to_parquet(
            os.path.join(dst, "documents.parquet"), index=False)
    if not os.path.exists(os.path.join(dst, "embeddings.parquet")):
        e = pd.read_parquet(os.path.join(src, "embeddings.parquet"))
        n = len(e)
        reps = []
        for k in range(REPLICAS):
            r = e.copy()
            r["vec_id"] = r["vec_id"] + k * n
            reps.append(r)
        pd.concat(reps, ignore_index=True).to_parquet(
            os.path.join(dst, "embeddings.parquet"), index=False)


class RssSampler(threading.Thread):
    """Peak RSS of this python + every java/pyspark child, via /proc."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0
        self._stop = threading.Event()

    def _total_rss(self) -> int:
        total = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    comm = f.read().strip()
                if comm not in ("java", "python", "python3"):
                    continue
                with open(f"/proc/{pid}/statm") as f:
                    total += int(f.read().split()[1]) * 4096
            except OSError:
                continue
        return total

    def run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, self._total_rss())
            self._stop.wait(2.0)

    def stop(self) -> int:
        self._stop.set()
        return self.peak


def main():
    sf01 = "/root/testdata/sf0.1"
    argv = [a for a in sys.argv[1:]]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    sf1 = argv[0] if argv else "/tmp/sf1"
    build_sf1(sf01, sf1)

    from jerex_spark.caching import release_persisted
    from jerex_spark.operators import all_queries
    from jerex_spark.session import build_session
    spark = build_session(app="scale-probe", master="local[32]")
    qs = all_queries()
    family = ("kg_triples", "kg_entity_degree", "kg_twohop",
              "kg_triangles", "kg_pagerank", "kg_communities",
              "kg_kcore", "kg_bfs_dist", "kg_delta_merge",
              "kg_cooccur_pmi", "kg_neg_samples",
              "kg_surface_components", "tfidf_topk",
              "bpe_pair_counts", "emb_centroids_q", "stratified_sample",
              "dedup_exact", "minhash_lsh_pairs",
              "dedup_lsh_verified", "dedup_components", "corpus_curation",
              "canon_gazetteer", "lsh_topk", "ivf_topk",
              "embdup_cosine_lsh", "emb_quantize")
    if only:
        unknown = only - set(family)
        if unknown:
            raise SystemExit(f"--only names not in family: {sorted(unknown)}")
        family = tuple(n for n in family if n in only)

    def run(name, sf_dir):
        fn = qs[name][0]
        best, rows = float("inf"), None
        for _ in range(2):                       # best-of-2 (host noise)
            t0 = time.time()
            rows = fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
            release_persisted()
        return best, rows

    sampler = RssSampler()
    sampler.start()
    results = {}
    try:
        for name in family:
            t_small, r_small = run(name, sf01)
            t_big, r_big = run(name, sf1)
            results[name] = {
                "sf0.1_sec": round(t_small, 2), "sf1_sec": round(t_big, 2),
                "ratio": round(t_big / max(t_small, 1e-9), 2),
                "rows_sf0.1": r_small, "rows_sf1": r_big,
            }
            print(json.dumps({name: results[name]}), flush=True)
        # the all-pairs guards must fire at this scale
        from jerex_spark.operators.dedup import ngram_jaccard
        try:
            ngram_jaccard(spark, sf1)
            guard = "DID NOT FIRE (bug)"
        except ValueError:
            guard = "fired"
        peak = sampler.stop()
        print(json.dumps({
            "metric": "scale_probe_10x", "replicas": REPLICAS,
            "allpairs_guard": guard,
            "peak_rss_gb": round(peak / 2**30, 2),
            "max_ratio": max(v["ratio"] for v in results.values()),
        }), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
