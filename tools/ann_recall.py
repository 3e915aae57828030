"""Measure ANN recall@k of the approximate similarity paths against
the exact brute-force baseline.

Recall@k = |approx top-k ∩ exact top-k| / |exact top-k| over a query
sample — the metric that justifies (or indicts) the LSH bucket and IVF
probe parameters. Usage:

    python tools/ann_recall.py [sf_dir] [k] [n_queries]

Prints one JSON line, e.g.
    {"sf_dir": ..., "k": 3, "recall": {"lsh_4x6": 0.87, ...}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pairs(df) -> set:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ukis_h3cellstore_spark.ops import similarity as S

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("ann-recall")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < n_q)

    exact = pairs(S.cosine_topk(e, q, k=k))
    variants = {
        "lsh_4x6": S.lsh_topk(e, q, k=k, num_tables=4, num_planes=6),
        "lsh_8x6": S.lsh_topk(e, q, k=k, num_tables=8, num_planes=6),
        "lsh_4x8": S.lsh_topk(e, q, k=k, num_tables=4, num_planes=8),
        "ivf_16c_p2": S.ivf_topk(e, q, k=k, n_centroids=16, nprobe=2),
        "ivf_16c_p4": S.ivf_topk(e, q, k=k, n_centroids=16, nprobe=4),
    }
    recall = {
        name: round(len(pairs(df) & exact) / max(len(exact), 1), 4)
        for name, df in variants.items()
    }
    # PQ/ADC approximates L2 ranking, so its recall is measured
    # against the exact-L2 baseline, not cosine
    exact_l2 = pairs(S.l2_topk(e, q, k=k))
    pq_variants = {
        "pq_m4_k16": S.pq_topk(e, q, k=k, m=4, n_centroids=16),
        "pq_m8_k16": S.pq_topk(e, q, k=k, m=8, n_centroids=16),
        "ivfpq_8c_p4": S.ivfpq_topk(e, q, k=k, n_coarse=8, nprobe=4),
        # SQ8 code-space L2 is per-dim-scaled true L2 (FAISS IndexSQ)
        "sq8": S.sq8_topk(e, q, k=k),
        # sign-bit Hamming approximates L2 ordering around the
        # per-dim midpoints (1 bit/dim — the most aggressive rung)
        "hamming_1bit": S.hamming_topk(e, q, k=k),
    }
    recall_l2 = {
        name: round(len(pairs(df) & exact_l2) / max(len(exact_l2), 1), 4)
        for name, df in pq_variants.items()
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k": k,
                "n_queries": n_q,
                "recall": recall,
                "recall_l2": recall_l2,
            }
        )
    )


if __name__ == "__main__":
    main()
