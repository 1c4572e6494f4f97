"""Three interoperable engines unioned into one duplicate graph
(north_star: MinHash-LSH + SimHash + substring with shared CC backbone)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.config import DedupConfig
from co_deduplicate_spark.plans.pipeline import predicted_pairs, run_pipeline
from co_deduplicate_spark.sources.pages import (
    golden_pairs,
    golden_substring_pairs,
    synth_pages,
)

N = 200
CFG = DedupConfig()


def test_three_engine_union(spark, tmp_path):
    pages = synth_pages(spark, N, seed=42)
    out = run_pipeline(
        spark, pages, str(tmp_path / "wk"), CFG,
        engines=("minhash", "simhash", "substring"),
    )
    edges = out["candidate_edges"]
    rules_present = {
        r[0]
        for r in edges.select(F.explode("rules")).distinct().collect()
    }
    assert any(r.startswith("minhash-lsh") for r in rules_present)
    assert any(r.startswith("simhash") for r in rules_present)
    assert any(r.startswith("substring-containment") for r in rules_present)

    pred = {(r["url_a"], r["url_b"]) for r in predicted_pairs(out["clusters"]).collect()}
    # all minhash goldens still clustered
    assert golden_pairs(N) <= pred
    # substring engine merges the container/contained pair (slot 12/13)
    assert golden_substring_pairs(N) <= pred
    # hard negatives (slots 14/15 share only boilerplate) must stay apart
    for b in range(N // 100):
        neg = tuple(sorted(
            u for (u,) in pages.filter(
                F.col("url").rlike(f"/p/{b:06d}/1[45]$")
            ).select("url").collect()
        ))
        assert neg not in pred

    # exact-copy pairs carry evidence from multiple engines (A5 union)
    multi = edges.filter(F.size("rules") >= 2).count()
    assert multi > 0


def test_engine_set_invalidates_resume(spark, tmp_path):
    pages = synth_pages(spark, N, seed=42)
    wk = str(tmp_path / "wk2")
    out1 = run_pipeline(spark, pages, wk, CFG, engines=("minhash",))
    n1 = out1["candidate_edges"].count()
    # same workdir, different engine set → must NOT reuse stale edges
    out2 = run_pipeline(spark, pages, wk, CFG, engines=("minhash", "substring"))
    n2 = out2["candidate_edges"].count()
    assert n2 > n1


def test_main_entrypoint_smoke(spark, tmp_path, capsys):
    import main as main_mod

    rc = main_mod.main([
        "--input", "synth:200", "--workdir", str(tmp_path / "wk3"),
        "--engines", "minhash,substring",
    ])
    assert rc == 0
    import json

    line = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["docs"] == 200
    assert stats["duplicate_clusters"] > 0
    assert stats["engines"] == ["minhash", "substring"]
