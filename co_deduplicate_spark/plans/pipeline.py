"""End-to-end batch dedup pipeline (the flagship job).

Stage dataflow (SURVEY.md §3.4), each stage a checkpointed table so a
killed job resumes idempotently — the deterministic-batch replacement for
the reference's per-record update + version-conflict retry loop
(/root/reference/src/documentsManager.js:220-356):

  pages ─ extract ─→ corpus(url, text, lang, source, session)
        ─ signatures ─→ (url, minhash[128], n_shingles)
        ─ banding + self-join ─→ candidate_edges(src, dst, rules)
        ─ exact-Jaccard verify ─→ verified edges (+ per-pair provenance,
                                   the reference's matched_queries P11)
        ─ connected components ─→ cluster_labels(url, component)
        ─ cluster aggregates ─→ clusters(cluster_id, chain, members,
                                   sources, size, is_duplicate)

Cluster fields mirror the reference's rewrite outputs: chain ≡
``business.sourceUidChain`` (documentsManager.js:287-289), sources ≡
sorted distinct member sources (documentsManager.js:288), is_duplicate ≡
``business.isDuplicate`` (painless/updateDuplicatesGraph.painless:216-218).

Scale strategy (100 TB / 10^12 docs):
  * signatures: narrow projection (url, text) into the Arrow UDF; the
    table written back is url + 128 longs — ~1 KB/doc, no document bodies
    move after this stage.
  * band join: shuffle keys are (band_id, band_hash) 16-byte pairs; AQE
    skew-join plus optional star reduction for mega-buckets (lsh.py).
  * verification joins only candidate pairs to shingle postings — never a
    cross product.
  * CC: O(log n) star rounds, each a localCheckpoint to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.extract import extracted_text
from ..operators.connected_components import attach_singletons, connected_components
from ..operators.exact import chain_expr
from ..operators.jaccard import verify_candidates
from ..operators.lsh import band_table, candidate_pairs
from ..operators.minhash import with_minhash
from ..sources.catalog import StageCatalog


def _source_expr(url):
    return F.regexp_extract(url, r"^https?://([^/]+)/", 1)


def _session_expr(ts):
    return F.date_format(ts, "yyyy-MM")


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    cfg: DedupConfig | None = None,
    resume: bool = True,
    star_reduce: bool = False,
) -> dict[str, DataFrame]:
    """Run (or resume) the full MinHash-LSH dedup pipeline.

    Returns the stage tables: corpus, signatures, candidate_edges,
    cluster_labels, clusters.
    """
    cfg = cfg or DedupConfig()
    cat = StageCatalog(spark, workdir, cfg.config_hash())
    out: dict[str, DataFrame] = {}

    # Stage 1: extraction + per-page metadata ------------------------------
    if resume and cat.is_complete("corpus"):
        corpus = cat.read("corpus")
    else:
        corpus = pages.select(
            F.col("url"),
            extracted_text(F.col("html")).alias("text"),
            F.col("lang"),
            _source_expr(F.col("url")).alias("source"),
            _session_expr(F.col("warc_ts")).alias("session"),
        )
        corpus = cat.write("corpus", corpus)
        cat.log_lineage("corpus", {"rows_out": cat.manifest("corpus")["rows"]})
    out["corpus"] = corpus

    # Stage 2: MinHash signatures -----------------------------------------
    if resume and cat.is_complete("signatures"):
        sigs = cat.read("signatures")
    else:
        sigs = with_minhash(corpus, cfg, id_col="url", text_col="text")
        sigs = cat.write("signatures", sigs)
        # one aggregate pass for all counters (separate count() jobs add
        # serial driver round-trips that dominate small-corpus runs)
        counters = sigs.select(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("minhash").isNull().cast("long")).alias("nulls"),
        ).collect()[0]
        cat.log_lineage("signatures", {"rows_out": counters["rows"],
                                       "non_deduplicable": int(counters["nulls"])})
    out["signatures"] = sigs

    # Stage 3: LSH banding + candidate join + exact verify ----------------
    if resume and cat.is_complete("candidate_edges"):
        edges = cat.read("candidate_edges")
    else:
        bands = band_table(sigs, cfg)
        cands = candidate_pairs(
            bands, cfg,
            star_reduce_threshold=cfg.band_bucket_cap if star_reduce else None,
        )
        verified = verify_candidates(
            cands, corpus, id_col="url", text_col="text",
            threshold=cfg.jaccard_threshold, shingle_k=cfg.shingle_k,
        )
        # P11 rule provenance: every edge carries the names of the rules
        # (engines/configs) that produced it, unioned per pair (A5).
        edges = verified.withColumn(
            "rules",
            F.array(F.lit(f"minhash-lsh:k{cfg.shingle_k}p{cfg.num_perms}b{cfg.lsh_bands}")),
        ).withColumn("engine", F.lit("minhash"))
        edges = cat.write("candidate_edges", edges)
        cat.log_lineage("candidate_edges", {"rows_out": cat.manifest("candidate_edges")["rows"]})
    out["candidate_edges"] = edges

    # Stage 4: connected components ---------------------------------------
    if resume and cat.is_complete("cluster_labels"):
        labels = cat.read("cluster_labels")
    else:
        labels = connected_components(edges, cfg=cfg)
        labels = attach_singletons(labels, corpus.select("url"), node_col="url")
        labels = cat.write("cluster_labels", labels)
        cat.log_lineage("cluster_labels", {"rows_out": cat.manifest("cluster_labels")["rows"]})
    out["cluster_labels"] = labels

    # Stage 5: cluster table (A3/A4 aggregates + flags) --------------------
    if resume and cat.is_complete("clusters"):
        clusters = cat.read("clusters")
    else:
        member_meta = labels.join(
            corpus.select(F.col("url").alias("node"), "source"), "node", "left"
        )
        clusters = (
            member_meta.groupBy(F.col("component").alias("cluster_id"))
            .agg(
                chain_expr(F.collect_list("node")).alias("chain"),
                F.array_sort(F.collect_set("node")).alias("members"),
                F.array_sort(F.collect_set("source")).alias("sources"),
                F.count(F.lit(1)).alias("size"),
            )
            .withColumn("is_duplicate", F.col("size") >= 2)
        )
        clusters = cat.write("clusters", clusters)
        counters = clusters.select(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("is_duplicate").cast("long")).alias("dups"),
        ).collect()[0]
        cat.log_lineage("clusters", {"rows_out": counters["rows"],
                                     "duplicate_clusters": int(counters["dups"])})
    out["clusters"] = clusters
    return out


def predicted_pairs(clusters: DataFrame) -> DataFrame:
    """Explode clusters back to intra-cluster pairs (url_a < url_b) for
    recall measurement against golden_pairs (BASELINE.md protocol)."""
    a = clusters.select(F.col("cluster_id"), F.explode("members").alias("url_a"))
    b = clusters.select(F.col("cluster_id"), F.explode("members").alias("url_b"))
    return (
        a.join(b, "cluster_id")
        .filter(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
    )
