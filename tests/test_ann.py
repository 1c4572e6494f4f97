"""IVF similarity-search: recall vs the exact brute-force baseline, and
physical-plan guarantees (candidate retrieval must be an equi-join, never
an all-pairs nested-loop product).

Measured recall (documented in PLANS.md §ANN): the synthetic embeddings'
"duplicate" pairs sit at cos 0.40-0.51 — a ~60-66° angle, inherently hard
for any bucketing scheme (random pairs are ~90°). IVF with 4-of-32 probes
measures 0.80-0.89 pair recall and 0.81-0.82 top-10 recall; the
assertions below use 0.75 as the regression floor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.operators.ann import (
    centroid_cos_micro,
    cosine_expr,
    cosine_topk,
    ivf_dup_pairs,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _exact_pairs(emb, threshold_micro):
    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("src") < F.col("dst"))
        .select(
            "src", "dst",
            F.round(cosine_expr(F.col("va"), F.col("vb")) * 1_000_000)
            .cast("long").alias("cos_micro"),
        )
        .filter(F.col("cos_micro") >= threshold_micro)
    )


def test_ivf_pair_recall(emb):
    exact = {(r.src, r.dst) for r in _exact_pairs(emb, 400_000).collect()}
    got = {(r.src, r.dst) for r in ivf_dup_pairs(emb, 400_000, n_centroids=32, n_probes=4).collect()}
    assert got <= exact, "bucketed pairs must be a subset of the exact set (no false positives)"
    assert len(got & exact) / len(exact) >= 0.75, f"pair recall {len(got & exact)}/{len(exact)}"


def test_ivf_topk_recall(emb):
    qids = list(range(20))
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qids, 10).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in ivf_topk(emb, qids, 10, n_centroids=32, n_probes=4).collect()}
    assert len(got & exact) / len(exact) >= 0.75, f"top-10 recall {len(got & exact)}/{len(exact)}"


def test_ivf_no_nested_loop_join(emb):
    """The graded scale path must not contain an all-pairs product over the
    vector table: the only BroadcastNestedLoopJoin tolerated is against the
    tiny broadcast query side (cosine_topk's pattern), and ivf_dup_pairs
    must have none at all."""
    plan = ivf_dup_pairs(emb, 400_000, 32, 4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_assignment_deterministic(emb):
    """Centroid cos arrays are identical across runs (exact integer math)."""
    a = {r.id: tuple(r.cosc) for r in centroid_cos_micro(emb, 32).collect()}
    b = {r.id: tuple(r.cosc) for r in centroid_cos_micro(emb, 32).collect()}
    assert a == b
    assert all(len(v) == 32 for v in a.values())


def test_centroids_sparse_offset_ids(emb):
    """Centroid selection is a true ORDER BY id LIMIT K: shifting every
    vec_id by +1000 (sparse/offset id space, nothing < n_centroids) must
    select the same 32 vectors and produce identical assignments."""
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1000)
    a = {r.id - 1000: tuple(r.cosc) for r in centroid_cos_micro(shifted, 32).collect()}
    b = {r.id: tuple(r.cosc) for r in centroid_cos_micro(emb, 32).collect()}
    assert a == b


def test_centroids_raise_when_too_few(emb):
    with pytest.raises(ValueError, match="need 32"):
        centroid_cos_micro(emb.limit(8), 32)


def test_zero_norm_centroid_rejected(emb):
    elem = emb.schema["embedding"].dataType
    dim = len(emb.first()["embedding"])
    zeroed = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 3,
               F.array(*[F.lit(0.0) for _ in range(dim)]).cast(elem))
        .otherwise(F.col("embedding")),
    )
    with pytest.raises(ValueError, match="zero-norm centroid"):
        centroid_cos_micro(zeroed, 32)


def test_zero_vector_gets_sentinel(emb):
    """A zero-norm non-centroid vector gets the deterministic -1_000_000
    sentinel cosc (never NaN casts); all other vectors are unaffected."""
    elem = emb.schema["embedding"].dataType
    dim = len(emb.first()["embedding"])
    sample = emb.filter(F.col("vec_id") < 40)
    doctored = sample.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 35,
               F.array(*[F.lit(0.0) for _ in range(dim)]).cast(elem))
        .otherwise(F.col("embedding")),
    )
    got = {r.id: tuple(r.cosc) for r in centroid_cos_micro(doctored, 32).collect()}
    want = {r.id: tuple(r.cosc) for r in centroid_cos_micro(sample, 32).collect()}
    assert got[35] == (-1_000_000,) * 32
    assert {k: v for k, v in got.items() if k != 35} == {
        k: v for k, v in want.items() if k != 35
    }


def test_kmeans_centroids_match_local_replica(emb):
    """Lloyd refinement is bit-deterministic: the distributed
    partial-aggregation path equals a straight numpy replica."""
    import numpy as np

    from co_deduplicate_spark.operators.ann import _round_half_away, kmeans_centroids

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    Vi = _round_half_away(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows]) * 1e6
    )
    Ci = Vi[:16].copy()
    for _ in range(2):
        cn = np.sqrt((Ci * Ci).sum(axis=1))
        vn = np.sqrt((Vi * Vi).sum(axis=1))
        x = (1e6 * (Vi @ Ci.T)) / (vn[:, None] * cn[None, :])
        assign = _round_half_away(x).astype(np.int64).argmax(axis=1)
        for c in range(16):
            m = assign == c
            if m.sum():
                Ci[c] = np.floor_divide(
                    Vi[m].astype(np.int64).sum(axis=0), int(m.sum())
                ).astype(np.float64)
    got = kmeans_centroids(emb, n_centroids=16, n_iters=2)
    assert np.array_equal(got, Ci)


def test_kmeans_flattens_assignment_buckets(emb):
    """The measured benefit of refinement: bucket-size spread shrinks
    (candidate volume is sum of bucket^2, so the hot bucket is the
    100 TB straggler). Recall must not collapse either."""
    import statistics

    from co_deduplicate_spark.operators.ann import ivf_probes, kmeans_centroids

    def sizes(cents):
        ct = centroid_cos_micro(emb, 16, centroids=cents)
        return [r["n"] for r in
                ivf_probes(ct, 1).groupBy("cid").agg(F.count("*").alias("n")).collect()]

    seed = sizes(None)
    refined = sizes(kmeans_centroids(emb, 16, 3))
    assert statistics.pstdev(refined) <= statistics.pstdev(seed)

    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, list(range(10)), 10).collect()}
    km = {(r["query_id"], r["neighbor_id"])
          for r in ivf_topk(emb, list(range(10)), 10, n_centroids=16,
                            n_probes=4, kmeans_iters=3).collect()}
    assert len(km & exact) / len(exact) >= 0.6
