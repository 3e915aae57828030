"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is broadcast; the corpus side streams. Dot products
  are sequential left-folds (``F.aggregate``) in double precision, so
  results are deterministic and reproducible by the DuckDB oracle.
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing with
  deterministic integer-valued planes. Only same-bucket candidates get
  exact scoring; the bucket join shuffles on a small integer key.

At 100 TB the corpus side never collects; both operators are pure
DataFrame compositions whose probe side is a broadcast."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Deterministic sequential dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact brute-force top-k neighbors for each query vector:
    (query_id, neighbor_id, cosine_sim, rank). Queries are broadcast;
    ties break on neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), round_digits),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _plane_component(p: int, j: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-9, 9] —
    integer-valued so sign decisions are exact across engines."""
    return ((F.lit(p * 131) + j * 37) % 19 - 9).cast("double")


def lsh_bucket(vec: Column, num_planes: int = 8) -> Column:
    """Sign-bit bucket id from ``num_planes`` hyperplane dot products."""
    bucket = F.lit(0)
    for p in range(num_planes):
        dot = F.aggregate(
            F.transform(
                vec, lambda v, j: v.cast("double") * _plane_component(p, j)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """ANN top-k: exact cosine within the query's LSH bucket only.
    (query_id, neighbor_id, cosine_sim, rank); queries without bucket
    mates return no rows (the recall/latency trade of ANN)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), round_digits),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """IVF-style ANN: the corpus is partitioned into inverted lists by
    nearest centroid; each query probes its ``nprobe`` nearest lists
    and scores exactly within them.

    Centroids are the ``n_centroids`` lowest-id corpus vectors — a
    deterministic stand-in for a k-means pass (which would be a
    separate training job at scale; the assignment/probe plumbing here
    is the part that matters). Shuffles only on the small centroid id;
    centroid set is broadcast to both sides.
    """
    cent = F.broadcast(
        corpus.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec"))
        .orderBy("centroid_id")
        .limit(n_centroids)
    )

    def assign(df: DataFrame, idc: str, vecc: str, keep: int) -> DataFrame:
        scored = df.crossJoin(cent).withColumn(
            "__sim", cosine_similarity(F.col(vecc), F.col("c_vec"))
        )
        w = Window.partitionBy(idc).orderBy(
            F.col("__sim").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= keep)
            .drop("c_vec", "__sim", "__r")
        )

    c_lists = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")),
        "neighbor_id",
        "n_vec",
        1,
    )
    q_lists = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "query_id",
        "q_vec",
        nprobe,
    )
    scored = (
        c_lists.join(F.broadcast(q_lists), on="centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine_similarity(F.col("q_vec"), F.col("n_vec")), round_digits),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: same LSH bucket AND cosine ≥
    threshold: (id_a, id_b, cosine_sim) with id_a < id_b."""
    withb = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    a = withb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    b = withb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim",
            F.round(cosine_similarity(F.col("vec_a"), F.col("vec_b")), round_digits),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
