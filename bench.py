#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries + the flagship pages-dedup pipeline at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec_pipeline": ...}

Env knobs:
  SPARK_GRAFT_CPUS          executor threads (default 16 — the hardware-
                            ceiling probe showed this hypervisor delivers
                            ~18 effective cores; local[16] is the stable
                            comparison point, PLANS.md round-2 study)
  SPARK_GRAFT_SF_DIR        testdata dir (default sf0.1)
  SPARK_GRAFT_BENCH_PAGES   synthetic pages for the pipeline leg (default 20000)
  SPARK_GRAFT_BENCH_REPEATS best-of-N per query + pipeline (default 3 —
                            the VM shows ±2x noise; best-of damps it)
  SPARK_GRAFT_BENCH_ONLY_PIPELINE  if "1", skip the query battery (scaling runs)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


# headline queries run at sf0.1; token_jaccard_pairs (unigram, exhaustive)
# is deliberately excluded — its postings self-join is quadratic in the
# tiny synthetic vocabulary and exists for the sf0.01 correctness gate only.
# do_the_job_arrival is likewise correctness-only: its wall is ~95%
# bootstrap fixture (a full stateful session build: five keyed tables
# merged, CC, manifests) wrapped around a single-record arrival — the
# arrival path it grades is already timed inside incremental_session_merge.
HEADLINE = [
    "minhash_lsh_pairs",
    "shingle_jaccard_pairs",
    "dup_clusters_cc",
    "cluster_chains",
    "simhash_values",
    "simhash_hamming_pairs",
    "rule_based_pairs",
    "rule_scenario_pairs",
    "containment_pairs",
    "suffix_window_pairs",
    "session_predicates",
    "incremental_session_merge",
    "pipeline_multi_engine_edges",
    "business_view_enriched",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "embedding_dup_pairs",
    "doc_profile",
    "token_counts",
    "quality_score",
    "lang_guess",
    "exact_dup_clusters",
    "events_top_type",
    "events_sessions",
    "lineitem_pricing",
    "nation_revenue",
    "ann_ivf_kmeans_topk",
    "media_bmp_stats",
    "media_wav_stats",
    "media_video_frames",
    "upsert_lifecycle",
    "stream_dedup_keys",
    "stream_host_sessions",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    only_pipeline = os.environ.get("SPARK_GRAFT_BENCH_ONLY_PIPELINE") == "1"
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from co_deduplicate_spark.plans.pipeline import run_pipeline
    from co_deduplicate_spark.session import build_session
    from co_deduplicate_spark.sources.pages import synth_pages

    import __spark_entry__ as em

    spark = build_session("co_dedup_bench", cores=cpus, driver_memory="48g")
    timings: dict[str, float] = {}

    if not only_pipeline:
        qs = em.queries()
        # best-of-N FULL PASSES: within a pass the battery shares the
        # verified-edge checkpoint exactly like a real run (first consumer
        # pays), and the cache is cleared between passes so every pass is
        # independent; per-query result = min across passes (VM noise ±2x,
        # memory/bench-noise-protocol)
        for _ in range(repeats):
            em._VERIFIED_CACHE.clear()
            for name in HEADLINE:
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                if name not in timings or dt < timings[name]:
                    timings[name] = round(dt, 3)

    # flagship pages pipeline: generation + caching excluded (input prep),
    # extract→signatures→LSH→verify→CC→clusters timed end-to-end incl. stage IO
    pages_parquet = os.environ.get("SPARK_GRAFT_BENCH_PAGES_PARQUET")
    if pages_parquet:
        # pre-generated corpus: both scaling runs read the identical bytes
        pages = spark.read.parquet(pages_parquet)
        n_pages = pages.count()
    else:
        pages = synth_pages(spark, n_pages).cache()
        pages.count()
    # stage tables on tmpfs: measure the engine, not root-device writeback
    wk_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    pipeline_sec = float("inf")
    for _ in range(repeats):
        wk = tempfile.mkdtemp(prefix="bench_pipeline_", dir=wk_base)
        try:
            t0 = time.time()
            out = run_pipeline(spark, pages, wk, resume=False)
            out["clusters"].count()
            pipeline_sec = min(pipeline_sec, time.time() - t0)
        finally:
            shutil.rmtree(wk, ignore_errors=True)
    timings["pages_pipeline"] = round(pipeline_sec, 3)
    docs_per_sec = round(n_pages / pipeline_sec, 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_pipeline_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "repeats_best_of": repeats,
                "pipeline_pages": n_pages,
                "docs_per_sec_pipeline": docs_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
