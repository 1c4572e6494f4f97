"""Golden end-to-end: synthetic pages → pipeline → clusters.

Mirrors the reference's functional test design (planted duplicates +
hard negatives + non-deduplicable record,
/root/reference/test/functional/index.js:42-74) at web-page shape.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.config import DedupConfig
from co_deduplicate_spark.plans.pipeline import predicted_pairs, run_pipeline
from co_deduplicate_spark.sources.pages import (
    _page_text,
    extract_text_py,
    golden_minhash_clusters,
    golden_pairs,
    golden_substring_pairs,
    render_html,
    synth_pages,
)

N_DOCS = 300  # 3 blocks — covers en + fr vocab (block 3 is fr at N>=400; keep 300 en-only here)
CFG = DedupConfig()


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, N_DOCS, seed=42).cache()


def test_generator_deterministic_and_partition_invariant(spark):
    a = synth_pages(spark, 120, seed=42, partitions=1).orderBy("url").collect()
    b = synth_pages(spark, 120, seed=42, partitions=7).orderBy("url").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_extraction_byte_identity(pages):
    # input_hint contract: extracted text byte-identical per url
    rows = pages.select("url", "html", "text").collect()
    assert len(rows) == N_DOCS
    for r in rows:
        assert extract_text_py(r["html"]) == r["text"], r["url"]


def test_extraction_roundtrip_unit():
    text, _, _ = _page_text(42, 0)
    assert extract_text_py(render_html(text, "u")) == text
    assert extract_text_py(render_html("", "u")) == ""
    assert extract_text_py(None) == ""
    assert extract_text_py(b"<html>no main</html>") == ""
    # entity-escaping roundtrip
    tricky = "a < b & c > d\n\n\"quoted\" 'text' voilà"
    assert extract_text_py(render_html(tricky, "u")) == tricky


def test_pipeline_recall_and_precision(spark, pages, tmp_path):
    out = run_pipeline(spark, pages, str(tmp_path / "wk"), CFG)
    pred = {(r["url_a"], r["url_b"]) for r in predicted_pairs(out["clusters"]).collect()}
    gold = golden_pairs(N_DOCS)
    missed = gold - pred
    recall = 1 - len(missed) / len(gold)
    assert recall >= 0.99, f"recall {recall}: missed {sorted(missed)[:5]}"
    # no hard-negative or substring-pair leakage into minhash clusters
    for a, b in golden_substring_pairs(N_DOCS):
        assert (a, b) not in pred
    extra = pred - gold
    assert not extra, f"false merges: {sorted(extra)[:5]}"


def test_pipeline_cluster_table_semantics(spark, pages, tmp_path):
    out = run_pipeline(spark, pages, str(tmp_path / "wk2"), CFG)
    clusters = out["clusters"].filter("is_duplicate").collect()
    by_members = {frozenset(r["members"]): r for r in clusters}
    for gold_cluster in golden_minhash_clusters(N_DOCS):
        row = by_members.get(frozenset(gold_cluster))
        assert row is not None, f"missing cluster {sorted(gold_cluster)}"
        exp_chain = "!" + "!".join(sorted(gold_cluster)) + "!"
        assert row["chain"] == exp_chain
        assert row["cluster_id"] == min(gold_cluster)
        assert row["sources"] == sorted({u.split("/")[2] for u in gold_cluster})
    # the degenerate page is a singleton, not a duplicate
    labels = out["cluster_labels"]
    empty_urls = [r["url"] for r in pages.filter(F.col("text") == "").select("url").collect()]
    for u in empty_urls:
        comp = labels.filter(F.col("node") == u).collect()[0]["component"]
        assert comp == u


def test_pipeline_resume_is_idempotent(spark, pages, tmp_path):
    wk = str(tmp_path / "wk3")
    out1 = run_pipeline(spark, pages, wk, CFG)
    c1 = sorted((r["cluster_id"], r["chain"]) for r in out1["clusters"].collect())
    # simulate crash after stage 3: delete downstream stage manifests
    import shutil

    shutil.rmtree(tmp_path / "wk3" / "cluster_labels")
    shutil.rmtree(tmp_path / "wk3" / "clusters")
    out2 = run_pipeline(spark, pages, wk, CFG)
    c2 = sorted((r["cluster_id"], r["chain"]) for r in out2["clusters"].collect())
    assert c1 == c2
    # config change invalidates resume (different config hash → stale manifests ignored)
    cfg2 = DedupConfig(jaccard_threshold=0.9)
    out3 = run_pipeline(spark, pages, wk, cfg2)
    assert out3["clusters"].count() >= 0  # recomputed without error


def test_pandas_extraction_vectorized(pages):
    # the extraction UDF path (Arrow batches) matches the python kernel
    pdf = pages.select("url", "html", "text").toPandas()
    extracted = pdf["html"].map(extract_text_py)
    assert (extracted == pdf["text"]).all()


def test_pipeline_enriched_stage(spark, pages, tmp_path):
    """Stage 6: per-record write-back — reference end-state per url."""
    from co_deduplicate_spark.sources.pages import _url
    from co_deduplicate_spark.sources.upsert import UpsertTable

    wk = str(tmp_path / "wk_enr")
    out = run_pipeline(spark, pages, wk, CFG, enriched=True)
    enr = out["enriched"]
    assert {"url", "sourceUidChain", "duplicates", "duplicateRules", "isDuplicate",
            "creationDate", "modificationDate"} <= set(enr.columns)
    grp = sorted({_url(0, s) for s in (0, 1, 2, 16)})
    row = enr.filter(F.col("url") == grp[0]).collect()[0]
    assert row["isDuplicate"] is True
    assert row["sourceUidChain"] == "!" + "!".join(grp) + "!"
    assert {d["nbr"] for d in row["duplicates"]} == set(grp) - {grp[0]}
    # resume: re-run reuses the completed upsert snapshot (same version)
    v1 = UpsertTable(spark, f"{wk}/documents_enriched")._manifest()["version"]
    out2 = run_pipeline(spark, pages, wk, CFG, enriched=True)
    v2 = UpsertTable(spark, f"{wk}/documents_enriched")._manifest()["version"]
    assert v1 == v2
    assert out2["enriched"].count() == enr.count()


def test_stage_manifests_carry_partition_lineage(spark, pages, tmp_path):
    """Per-partition lineage (north-rule requirement): every stage manifest
    records per-output-partition row counts from the parquet footers, and
    the lineage log carries the skew summary."""
    import json
    from pathlib import Path

    wk = tmp_path / "wk_lineage"
    run_pipeline(spark, pages, str(wk), CFG)
    for stage in ("corpus", "signatures", "candidate_edges",
                  "cluster_labels", "clusters"):
        m = json.loads((wk / stage / "_STAGE_MANIFEST.json").read_text())
        prof = m["partition_profile"]
        assert prof["rows_total"] == m["rows"]
        assert prof["n_partitions"] >= 1
        assert prof["rows_max"] >= prof["rows_min"]
        if "partitions" in prof:  # full detail at this scale
            assert sum(p["rows"] for p in prof["partitions"]) == m["rows"]
            assert len(prof["partitions"]) == prof["n_partitions"]
    recs = [json.loads(line) for line in (wk / "lineage.jsonl").read_text().splitlines()]
    by_stage = {r["stage"]: r for r in recs}
    assert "skew_max_over_mean" in by_stage["candidate_edges"]
    assert "n_partitions" in by_stage["signatures"]
    for stage in ("corpus", "signatures", "candidate_edges",
                  "cluster_labels", "clusters"):
        assert by_stage[stage]["wall_s"] >= 0  # per-stage timing metric


def test_pipeline_survives_sigkill_mid_run(spark, tmp_path):
    """The BASELINE resumability protocol, literally: SIGKILL a pipeline
    process mid-run (no shutdown hooks, no manifest cleanup), re-run over
    the same workdir, and the final cluster table equals an uninterrupted
    run's. The rename-free write protocol (data first, manifest last)
    makes any partial stage invisible to the resume."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    wk_killed = str(tmp_path / "wk_killed")
    # new session so the SIGKILL reaches the whole tree (the PySpark JVM is
    # a separate child; killing only the python driver could leave in-flight
    # tasks committing files into wk_killed while the resumed run starts)
    proc = subprocess.Popen(
        [sys.executable, "main.py", "--input", "synth:4000",
         "--workdir", wk_killed, "--cores", "4"],
        cwd=str(repo), stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    # let it get through extraction and INTO the heavy stages, then kill
    # hard. Generous deadline: this VM's documented slow phases run 2-3x,
    # and a loaded machine once pushed the first manifest past the
    # previous 120 s window — killing a healthy-but-slow run then trips
    # the died-at-startup guard below (rc=-9, no manifest) spuriously.
    manifest_seen = False
    deadline = _time.monotonic() + 600
    while _time.monotonic() < deadline:
        if (Path(wk_killed) / "corpus" / "_STAGE_MANIFEST.json").exists():
            manifest_seen = True
            break
        if proc.poll() is not None:
            break
        _time.sleep(0.5)
    if proc.poll() is None:
        _time.sleep(2)  # now mid stage-2/3
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait()
    # the scenario must have actually happened: either we killed a run that
    # had made stage progress, or (too-fast machine) the run completed OK.
    # A subprocess that crashed at startup would make both runs below clean
    # runs and the test vacuous — fail instead.
    assert manifest_seen or proc.returncode == 0, (
        f"pipeline subprocess died at startup (rc={proc.returncode})"
    )

    docs = synth_pages(spark, 4000)
    resumed = run_pipeline(spark, docs, wk_killed, CFG)
    clean = run_pipeline(spark, docs, str(tmp_path / "wk_clean"), CFG)
    got = sorted((r["cluster_id"], r["chain"], r["size"])
                 for r in resumed["clusters"].collect())
    want = sorted((r["cluster_id"], r["chain"], r["size"])
                  for r in clean["clusters"].collect())
    assert got == want
