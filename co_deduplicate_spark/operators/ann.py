"""Similarity search over embedding columns.

No reference counterpart (the reference matches metadata keys only) —
this is the training-data-pipeline extension mandated by the build spec:
brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH-bucketed variant as the 100 TB scale path.

All cosine math is JVM-side (``zip_with`` + ``aggregate`` over
array<double>) — no Python in the hot path. Scores are rounded to 6
decimals *before* ranking so result order is reproducible across engines
(the DuckDB oracle mirrors the same rounding; floating-point sum order
differences live far below 1e-6 for unit-scale 64-dim vectors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_expr(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    The query side is tiny → broadcast; the scan side streams once.
    Columns: query_id, neighbor_id, cos_sim, rank.
    """
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"))
    queries = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q"))
    )
    scored = (
        base.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # integer micro-cosine: deterministic ordering + exact
            # cross-engine hashing (see module docstring)
            F.round(cosine_expr(F.col("q"), F.col("v")) * 1_000_000).cast("long").alias("cos_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_micro"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_micro", "rank")
    )


def hyperplane_signature(embeddings: DataFrame, n_planes: int = 16, seed: int = 42,
                         dim: int = 64, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane sign signature (SimHash for vectors) — the
    LSH-bucketed ANN scale path: bucket by signature, search within bucket
    (plus neighboring buckets for recall). Hyperplanes are seeded and
    embedded as literals — deterministic, JVM-evaluated."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(w)) for w in planes[p]])
        dot = F.aggregate(F.zip_with(vd, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        sig = sig + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return embeddings.select(F.col(id_col).alias("vec_id"), sig.alias("bucket"))


def bucketed_ann_topk(embeddings: DataFrame, query_ids: list[int], k: int = 10,
                      n_planes: int = 8, seed: int = 42, dim: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket. Trades recall for a candidate set ~n/2^planes per query."""
    sigs = hyperplane_signature(embeddings, n_planes, seed, dim, id_col, vec_col).select(
        F.col("vec_id").alias("_sig_id"), "bucket"
    )
    with_bucket = embeddings.join(
        sigs, embeddings[id_col] == sigs["_sig_id"]
    ).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"), "bucket")
    queries = with_bucket.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("v").alias("q"), F.col("bucket").alias("qb")
    )
    scored = (
        with_bucket.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qb")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id", "neighbor_id",
            F.round(cosine_expr(F.col("q"), F.col("v")) * 1_000_000).cast("long").alias("cos_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_micro"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_micro", "rank")
    )
