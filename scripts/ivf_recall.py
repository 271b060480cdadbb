#!/usr/bin/env python
"""Recall@k of the IVF-kmeans ANN path vs the exact brute-force baseline
(r3 VERDICT #6: an ANN component without a recall number isn't gradeable).

For each configured (K, nprobe, iters) instance, compute top-k neighbor sets
per query from q_ann_ivf_kmeans and from q_embed_cosine_topk on the SAME
embeddings table, and report recall = |ANN ∩ exact| / k averaged over
queries. Writes BENCH/ivf_recall.json.

Usage: python scripts/ivf_recall.py [sf_dir] [k]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    from neocrawler_spark.operators.similarity import (
        q_ann_ivf_kmeans,
        q_embed_cosine_topk,
    )
    from neocrawler_spark.session import get_spark

    spark = get_spark("ivf-recall", master="local[8]", shuffle_partitions=8)

    def nbr_sets(df):
        out: dict[int, set[int]] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = nbr_sets(q_embed_cosine_topk(spark, sf_dir, top_k=top_k))
    results = []
    # K=8/nprobe=2 is the default gate instance; K=32/iters=2 the
    # production-shaped one (ann_ivf_kmeans_k32). nprobe sweeps until the
    # stated target is met so the artifact records the needed setting.
    # Data caveat (recorded in the JSON): the synthetic embeddings are
    # isotropic gaussians — NO cluster structure — so IVF recall tracks the
    # probed-mass fraction (~nprobe/K); the sweep documents that tradeoff
    # honestly. Real text embeddings cluster, which is what IVF exploits.
    for k, iters, probes in ((8, 1, (1, 2, 3, 4, 5, 6)),
                             (32, 2, (2, 4, 8, 16, 24, 28))):
        for nprobe in probes:
            ann = nbr_sets(q_ann_ivf_kmeans(spark, sf_dir, k=k, nprobe=nprobe,
                                            iters=iters, top_k=top_k))
            per_q = {
                q: len(ann.get(q, set()) & ex) / len(ex)
                for q, ex in exact.items()
            }
            rec = sum(per_q.values()) / len(per_q)
            results.append({
                "k_cells": k, "iters": iters, "nprobe": nprobe,
                "top_k": top_k, "recall": round(rec, 4),
                "per_query": {str(q): round(v, 4) for q, v in sorted(per_q.items())},
            })
            print(f"K={k} iters={iters} nprobe={nprobe}: recall@{top_k}={rec:.4f}")
            if rec >= 0.9:
                break
    out = {
        "sf_dir": sf_dir, "top_k": top_k, "target": 0.9,
        "note": ("synthetic embeddings are isotropic (clusterless): recall ~ "
                 "probed-mass fraction nprobe/K; the sweep records the nprobe "
                 "needed to hit the target on this distribution"),
        "results": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ivf_recall.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
