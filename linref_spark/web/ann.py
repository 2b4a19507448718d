"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k neighbors for a (small) query
  set — JVM-side ``F.zip_with``/``F.aggregate`` dot products against a
  broadcast query table, then a per-query ``row_number`` window. The
  baseline every ANN variant is measured against.
- ``lsh_topk``: random-hyperplane (sign) LSH bucketing — queries only score
  candidates sharing a hash bucket, the scale path when the corpus no
  longer fits a broadcast-side comparison. Hyperplanes are deterministic
  (seeded hash-based pseudo-random), so bucket assignment is reproducible
  across runs and cluster sizes.
- ``cosine_neardup_pairs``: all pairs above a cosine threshold via the same
  LSH buckets (embedding near-duplicate detection).

Scale notes: brute force is O(corpus x queries) but embarrassingly
parallel (one narrow broadcast join, no shuffle until the final top-k
window, which partitions by query). LSH replaces the cross product with a
bucket equi-join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    na, nb = _norm(a), _norm(b)
    return F.when(
        (na > 0) & (nb > 0), _dot(a, b) / (na * nb)
    ).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine; excludes self-matches on equal ids.

    Output: (query_id, neighbor_id, rank, cos). Deterministic tie-break by
    neighbor id. Queries are broadcast (keep the query set small; fan the
    corpus, not the queries).
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = c.join(F.broadcast(q)).where(F.col("neighbor_id") != F.col(query_id_col))
    scored = scored.withColumn(
        "cos",
        cosine(
            F.transform(F.col("_qv"), lambda v: v.cast("double")),
            F.transform(F.col("_cv"), lambda v: v.cast("double")),
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos")
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from integer hashing
    (splitmix64-style mix) — no RNG state, reproducible anywhere."""
    vals = []
    for j in range(dim):
        x = (plane * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + seed) & (
            2**64 - 1
        )
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & (2**64 - 1)
        x ^= x >> 31
        vals.append((x / 2**64) * 2.0 - 1.0)
    return vals


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-LSH bucket id (long) from n_planes deterministic hyperplanes."""
    bucket = F.lit(0).cast("long")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for p in range(n_planes):
        plane = _hyperplane(dim, p, seed)
        dot = F.lit(0.0)
        for j, w in enumerate(plane):
            dot = dot + F.coalesce(F.get(v, j), F.lit(0.0)) * F.lit(w)
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return df.withColumn(out_col, bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates."""
    cb = with_lsh_bucket(corpus, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        "lsh_bucket",
    )
    qb = with_lsh_bucket(queries, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv"), "lsh_bucket"
    )
    cand = cb.join(F.broadcast(qb), on="lsh_bucket").where(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    cand = cand.withColumn(
        "cos",
        cosine(
            F.transform(F.col("_qv"), lambda v: v.cast("double")),
            F.transform(F.col("_cv"), lambda v: v.cast("double")),
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 2000,
) -> DataFrame:
    """Embedding near-duplicate pairs (a < b, cos >= threshold) via
    LSH-bucketed self-join (bucket size capped)."""
    b = with_lsh_bucket(df, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "lsh_bucket"
    )
    sizes = b.groupBy("lsh_bucket").agg(F.count("*").alias("_n"))
    ok = sizes.where(F.col("_n") <= max_bucket).drop("_n")
    pruned = b.join(F.broadcast(ok), on="lsh_bucket", how="inner")
    pairs = (
        pruned.select("lsh_bucket", F.col("_id").alias("a"), F.col("_v").alias("_va"))
        .join(
            pruned.select(
                "lsh_bucket", F.col("_id").alias("b"), F.col("_v").alias("_vb")
            ),
            on="lsh_bucket",
        )
        .where(F.col("a") < F.col("b"))
    )
    pairs = pairs.withColumn(
        "cos",
        cosine(
            F.transform(F.col("_va"), lambda v: v.cast("double")),
            F.transform(F.col("_vb"), lambda v: v.cast("double")),
        ),
    )
    return pairs.where(F.col("cos") >= threshold).select("a", "b", "cos").distinct()
