"""Similarity search over an embedding column (`array<float>`).

* brute_force_topk: exact cosine top-k — broadcast the (small) query set,
  evaluate dot products JVM-side with zip_with/aggregate (no Python), window
  top-k. The correctness baseline.
* lsh_bucketed_topk: random-hyperplane LSH — each vector hashed to a bucket
  signature; candidates = bucket collisions only. The scale path: the join
  is equi on the signature, so cost is ~O(n·k/buckets) instead of O(n·q).

All float math is done in double precision with a deterministic left-to-right
sum (F.aggregate) so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: List[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id. The query side is tiny
    → force a broadcast so the big side never shuffles."""
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    sc = embeddings.sparkSession.sparkContext
    # spread the big side — a single parquet split would otherwise compute
    # every dot product in one task
    cand = embeddings.repartition(sc.defaultParallelism, id_col).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        cand.join(F.broadcast(queries), F.col("n_id") != F.col("q_id"))
        .withColumn("sim", F.round(cosine_col(F.col("q_vec"), F.col("n_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    num_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (deterministic seeded planes generated
    driver-side with a tiny LCG — no numpy required on executors)."""
    def lcg(state: int):
        while True:
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            yield (state >> 33) / float(1 << 31) - 1.0  # [-1, 1)

    gen = lcg(seed)
    planes = [[next(gen) for _ in range(dim)] for _ in range(num_planes)]
    sig = F.lit("")
    for p in planes:
        plane_col = F.array(*[F.lit(x) for x in p])
        bit = F.when(_dot(F.col(vec_col), plane_col) >= 0, F.lit("1")).otherwise(F.lit("0"))
        sig = F.concat(sig, bit)
    return embeddings.select(F.col(id_col).alias("vec_id"), sig.alias("bucket"))


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: candidates are LSH
    bucket collisions only (equi-join on the signature — never all-pairs),
    then exact cosine verification ≥ threshold. Returns (id_a, id_b, sim)
    with id_a < id_b."""
    sigs = hyperplane_signatures(embeddings, num_planes, seed, dim)
    emb = embeddings.join(sigs, "vec_id")
    left = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"), "bucket")
    right = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), "bucket")
    pairs = (
        left.join(right, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_col(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
        .distinct()
    )
    return pairs


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: List[int],
    k: int = 3,
    num_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates."""
    sigs = hyperplane_signatures(embeddings, num_planes, seed, dim)
    emb = embeddings.join(sigs, "vec_id")
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"), F.col("bucket")
    )
    cand = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_vec"), F.col("bucket"))
    scored = (
        cand.join(F.broadcast(queries), ["bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("sim", F.round(cosine_col(F.col("q_vec"), F.col("n_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )
