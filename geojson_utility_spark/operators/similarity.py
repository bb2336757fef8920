"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — dot products as pure Catalyst array
  expressions (zip_with + aggregate), broadcast query set, window top-k.
- LSH-bucketed ANN (random hyperplane / sign-LSH): the scale path — each vector gets a
  b-bit signature from fixed pseudo-random hyperplanes (deterministic, seeded, computed
  with expressions); candidates share a signature band; exact cosine re-rank inside
  buckets only.  At 10^12 rows the all-pairs problem becomes |bucket|^2 local work with
  a single equi-join shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force: every query (small, broadcast) against every vector.

    Result: (query_id, vec_id, cosine, rank) with rank 1..k by descending cosine,
    ties broken by vec_id (deterministic).
    """
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cos = cosine_expr(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        v.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def signature_expr(vec, planes: list[list[float]]):
    """Sign-LSH signature as a bigint: bit i = sign(vec . plane_i)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int | None = None,
    n_bits: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join across ``n_tables`` independent
    hyperplane tables, exact cosine re-rank over the union of candidates.

    Recall grows with n_tables; candidates per query ~ N / 2^n_bits per table.
    """
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))

    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed + t)
        v_sig = v.withColumn("sig", signature_expr(F.col("v"), planes)).withColumn(
            "table", F.lit(t)
        )
        q_sig = q.withColumn("sig", signature_expr(F.col("qv"), planes)).withColumn(
            "table", F.lit(t)
        )
        c = v_sig.join(F.broadcast(q_sig), ["table", "sig"], "inner").select(
            "query_id", "vec_id", "qv", "v"
        )
        cand = c if cand is None else cand.unionByName(c)

    cos = cosine_expr(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.dropDuplicates(["query_id", "vec_id"])
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
