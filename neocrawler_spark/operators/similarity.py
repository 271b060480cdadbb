"""Similarity search over the `embeddings` table (array<float> column):
brute-force cosine top-k as the exact baseline, and an IVF-bucketed variant
as the scale path (coarse quantize → equi join on cell → rank within cell).

Spark-first: the dot product / norms are higher-order functions
(zip_with + aggregate) evaluated JVM-side — no Python UDF. At 10^10 vectors
the brute-force path shuffles |Q|×|C| — the IVF path prunes candidates to the
query's cell (equi join, broadcastable centroid/cell map), which is the same
plan shape FAISS-style IVF uses, expressed relationally.

Output contract: (query_id, neighbor_id, rank) — ranks only, no float
payloads, so the DuckDB oracle (list_cosine_similarity) hash-matches exactly
as long as no two candidates tie within double precision (the synthetic
embeddings are generic-position; ties would need identical vectors).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .analytics import load

TOP_K = 3
N_QUERIES = 5  # vec_id < 5 are queries, the rest candidates


def _cosine(qe: str, ce: str):
    dot = F.expr(
        f"aggregate(zip_with({qe}, {ce}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nq = F.expr(
        f"sqrt(aggregate({qe}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    nc = F.expr(
        f"sqrt(aggregate({ce}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    return dot / (nq * nc)


def q_embed_cosine_topk(spark, sf_dir):
    """Exact brute-force cosine top-k for each query vector."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(f"vec_id < {N_QUERIES}").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.where(f"vec_id >= {N_QUERIES}").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = q.crossJoin(c).withColumn("cos", _cosine("qe", "ce"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(f"rank <= {TOP_K}")
        .select("query_id", "neighbor_id", "rank")
    )


SQL_EMBED_COSINE_TOPK = f"""
SELECT query_id, neighbor_id, rank
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
)
WHERE rank <= {TOP_K}
"""


def q_ann_ivf_bucket(spark, sf_dir):
    """IVF-style bucketed ANN: coarse cell = sign bits of the first 3 dims;
    candidates restricted to the query's cell (equi join on cell), exact
    cosine rank within. Approximate by construction — the oracle applies the
    identical cell rule, so results still match exactly."""
    emb = load(spark, sf_dir, "embeddings")
    cell = (
        (F.expr("cast(element_at(embedding, 1) > 0 as int)") * 4)
        + (F.expr("cast(element_at(embedding, 2) > 0 as int)") * 2)
        + F.expr("cast(element_at(embedding, 3) > 0 as int)")
    )
    e = emb.withColumn("cell", cell)
    q = e.where(f"vec_id < {N_QUERIES}").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "cell"
    )
    c = e.where(f"vec_id >= {N_QUERIES}").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), "cell"
    )
    scored = q.join(c, "cell").withColumn("cos", _cosine("qe", "ce"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(f"rank <= {TOP_K}")
        .select("query_id", "neighbor_id", "rank")
    )


SQL_ANN_IVF_BUCKET = f"""
WITH e AS (
  SELECT vec_id, embedding,
         (embedding[1] > 0)::INT * 4 + (embedding[2] > 0)::INT * 2 + (embedding[3] > 0)::INT AS cell
  FROM embeddings
)
SELECT query_id, neighbor_id, rank
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM e q JOIN e c ON q.cell = c.cell
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
)
WHERE rank <= {TOP_K}
"""


def q_embed_nearest_label(spark, sf_dir):
    """1-NN label transfer: majority label among top-3 neighbors per query —
    the eval-style readout a training pipeline runs after ANN."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    topk = q_embed_cosine_topk(spark, sf_dir)
    return (
        topk.join(emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("votes"))
    )


SQL_EMBED_NEAREST_LABEL = f"""
WITH topk AS ({SQL_EMBED_COSINE_TOPK})
SELECT t.query_id, e.label, count(*) AS votes
FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
GROUP BY t.query_id, e.label
"""

QUERIES = {
    "embed_cosine_topk": (q_embed_cosine_topk, SQL_EMBED_COSINE_TOPK),
    "ann_ivf_bucket": (q_ann_ivf_bucket, SQL_ANN_IVF_BUCKET),
    "embed_nearest_label": (q_embed_nearest_label, SQL_EMBED_NEAREST_LABEL),
}
