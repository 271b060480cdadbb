#!/usr/bin/env python
"""Per-cell candidate histogram of the IVF k-means quantizer (VERDICT r2 #8):
demonstrates cell balance at K=32 on the sf0.1 embeddings. Usage:

  python scripts/ivf_cells.py [k] [iters] [sf_dir]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from neocrawler_spark.operators.similarity import ivf_kmeans_cells
    from neocrawler_spark.session import get_spark

    spark = get_spark("ivf-cells", master="local[8]", shuffle_partitions=8)
    _cent, assign = ivf_kmeans_cells(spark, sf, k=k, iters=iters)
    sizes = {r["cell"]: r["n"] for r in
             assign.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    counts = [sizes.get(c, 0) for c in range(k)]
    total = sum(counts)
    out = {
        "k": k, "iters": iters, "sf": sf, "candidates": total,
        "cells_nonempty": sum(1 for c in counts if c),
        "min": min(counts), "max": max(counts),
        "mean": round(total / k, 1),
        "max_over_mean": round(max(counts) / (total / k), 2),
        "histogram": counts,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
