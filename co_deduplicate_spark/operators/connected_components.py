"""Connected components via alternating large-star / small-star joins.

Replaces the reference's per-record bounded reachability: ngraph A*
pathfinding from each incoming doc to its candidates
(/root/reference/helpers/deduplicates/helpers.js:84-98) under a 5-hop BFS
expansion cap (src/documentsManager.js:188-190). In batch we hold the whole
edge set, so we compute the *exact* transitive closure — documented
divergence: chains longer than 5 hops cluster here but not in the
reference (SURVEY.md §2.4 G1).

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14) — alternating large-star/small-star edge rewrites converge in
O(log n) rounds to a forest of stars rooted at each component's minimum
node. Pure DataFrame joins + aggregations; any totally ordered node id
type works and is PRESERVED (urls stay strings; numeric doc ids stay
longs — half the shuffle width of zero-padded strings, no id-collision
risk from hashing either way). Each round localCheckpoints to cut lineage
(the Spark analogue of the reference's per-stage persistence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig

# r6 (guide §2.4 "remove shuffles outright"): each star step needs, per
# node u, the min over u's neighborhood — previously computed as
# groupBy(u).min + re-JOIN back on u, which shuffles the (symmetrized)
# edge table TWICE per step. A min() window over partitionBy(u) computes
# the same value in ONE exchange (+ a partition-local sort on the 1-2
# column key). Per full round that is 6 Exchanges → 3 (the large-star
# intermediate distinct also dropped: duplicates cannot change any min,
# and small-star's terminal distinct bounds growth before the checksum).
# Plan diff captured in plans/r06/dup_clusters_cc_{before,after}.txt.
# Measured: 3M-node/3M-edge interleaved A/B 34.7 → 23.8 s warm with
# identical labels; at sf0.1 dup_clusters_cc landed at 1.05 s in the
# end-of-round battery (1.55 s r5), with two further CC invocations
# inside incremental_session_merge and one per pipeline. At scale the
# win is one fewer full network pass of the edge set per star step (the
# sort runs on already-exchanged partitions).


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: connect every neighbor larger than u to u's min⁺ neighborhood."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: canonicalize u>v, hang each small neighborhood off its min."""
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    sized = canon.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    rewired = sized.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    kept = sized.filter(F.col("v") == F.col("m")).select("u", "v")
    return rewired.union(kept).filter(F.col("u") != F.col("v")).distinct()


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) accumulator: ANSI mode (Spark 4 default) would overflow
    # a long sum of 64-bit hashes.
    h = F.xxhash64(F.greatest("u", "v"), F.least("u", "v")).cast("decimal(38,0)")
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(h), F.lit(0)).cast("decimal(38,0)").alias("h"),
    ).collect()[0]
    return row["n"], int(row["h"])


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         cfg: DedupConfig | None = None) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id in the connected component.

    Iterates large-star/small-star until the canonical edge set is stable
    (count + order-insensitive xxhash64 checksum), then reads labels off
    the final stars. Singleton nodes never appear in ``edges``; callers
    union them in with component = self (see ``attach_singletons``).
    """
    cfg = cfg or DedupConfig()
    # type-preserving: numeric node ids stay numeric (a long shuffles at
    # half the width of the equivalent zero-padded string and compares by
    # the same total order); mixed-type inputs unify via string
    pair = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if pair.schema[0].dataType != pair.schema[1].dataType:
        pair = pair.select(F.col("u").cast("string"), F.col("v").cast("string"))
    e = (
        pair.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = _edge_checksum(e)
    for it in range(cfg.cc_max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _edge_checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components failed to converge in {cfg.cc_max_iterations} iterations")

    # Converged: every edge is (member, component_min). Roots label themselves.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn("component", F.col("node"))
    return members.union(roots).distinct()


def attach_singletons(labels: DataFrame, nodes: DataFrame, node_col: str = "doc") -> DataFrame:
    """Union in isolated nodes with component = self.

    The reference keeps isolated vertices in the graph without edges
    (helpers/deduplicates/helpers.js:51-62 'node only' path); same here.
    """
    node_type = dict(labels.dtypes).get("node", "string")
    all_nodes = nodes.select(F.col(node_col).cast(node_type).alias("node")).distinct()
    missing = all_nodes.join(labels.select("node"), "node", "left_anti").withColumn(
        "component", F.col("node")
    )
    return labels.union(missing)
