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


def test_window_and_ann_pipeline_engines(spark, tmp_path):
    """Round-4 engine promotion: duplicated-passage windows and embedding
    ANN ride the same provenance union → CC → clusters as the other
    engines (previously standalone-query-only)."""
    from co_deduplicate_spark.sources.pages import render_html

    passage = " ".join(f"shared{i} passage{i}" for i in range(20))  # 40 tokens
    texts = {
        "https://w.example.org/u1": passage + " first unique closing words here",
        "https://w.example.org/u2": passage + " second distinct ending entirely",
        "https://w.example.org/u3": "standalone third document body with own vocabulary",
        "https://w.example.org/u4": "standalone fourth document body nothing shared",
        "https://w.example.org/u5": "standalone fifth document body also isolated",
    }
    pages = spark.createDataFrame(
        [(u, "2024-01-01 00:00:00", render_html(t, u), t, "en")
         for u, t in texts.items()],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    # embeddings: u3 and u4 share a vector (cos=1), everyone else orthogonal
    one_hot = {u: i for i, u in enumerate(sorted(texts))}
    one_hot["https://w.example.org/u4"] = one_hot["https://w.example.org/u3"]
    emb = spark.createDataFrame(
        [(u, [1.0 if d == one_hot[u] else 0.0 for d in range(8)])
         for u in texts],
        "url string, embedding array<double>",
    )
    cfg = DedupConfig(ann_centroids=4, ann_probes=2)
    out = run_pipeline(
        spark, pages, str(tmp_path / "wk_wa"), cfg,
        engines=("window", "ann"), embeddings=emb,
    )
    edges = {(r["src"], r["dst"]): r["rules"]
             for r in out["candidate_edges"].collect()}
    w_pair = ("https://w.example.org/u1", "https://w.example.org/u2")
    a_pair = ("https://w.example.org/u3", "https://w.example.org/u4")
    assert any(r.startswith("window:w30") for r in edges[w_pair])
    assert any(r.startswith("ann-cosine:") for r in edges[a_pair])
    comp = {r["node"]: r["component"]
            for r in out["cluster_labels"].collect()}
    assert comp[w_pair[0]] == comp[w_pair[1]]
    assert comp[a_pair[0]] == comp[a_pair[1]]
    assert comp[w_pair[0]] != comp[a_pair[0]]
    assert comp["https://w.example.org/u5"] not in (comp[w_pair[0]], comp[a_pair[0]])


def test_ann_engine_requires_embeddings(spark, tmp_path):
    pages = synth_pages(spark, 10, seed=1)
    with pytest.raises(ValueError, match="embeddings"):
        run_pipeline(spark, pages, str(tmp_path / "wk_noemb"), CFG, engines=("ann",))
