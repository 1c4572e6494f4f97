"""The metadata rule engine as a first-class pipeline engine (the
reference's actual core: its rule disjunction IS its candidate stage,
getBaseRequest.js:1-8), plus the ingest-time quality_flags column (the
`_ignored` analogue, documentsManager.js:206-218) gating it.
"""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.config import DedupConfig
from co_deduplicate_spark.plans.pipeline import predicted_pairs, run_pipeline
from co_deduplicate_spark.sources.pages import (
    PAGES_SCHEMA,
    golden_pairs,
    render_html,
    synth_pages,
)

N = 200


def _page(url, text, lang="en"):
    return (url, datetime(2024, 1, 1), render_html(text, url), text, lang)


def test_rules_engine_unions_with_minhash(spark, tmp_path):
    pages = synth_pages(spark, N, seed=42)
    out = run_pipeline(
        spark, pages, str(tmp_path / "wk"), DedupConfig(),
        engines=("rules", "minhash"), enriched=True,
    )
    edges = out["candidate_edges"]
    rules_present = {r[0] for r in edges.select(F.explode("rules")).distinct().collect()}
    assert "Page : 1ID:fingerprint" in rules_present
    assert "Page : 2Collation:lang+prefix12" in rules_present
    assert any(r.startswith("minhash-lsh") for r in rules_present)

    # exact-copy pairs carry provenance from BOTH engines on one edge (A5)
    both = edges.filter(
        F.array_contains("rules", "Page : 1ID:fingerprint")
        & F.exists("rules", lambda r: r.startswith("minhash-lsh"))
    )
    assert both.count() > 0

    # clustering is unchanged-or-better: all minhash goldens survive
    pred = {(r["url_a"], r["url_b"]) for r in predicted_pairs(out["clusters"]).collect()}
    assert golden_pairs(N) <= pred

    # rule names flow end-to-end into the enriched write-back (G4 + P11)
    enriched = out["enriched"]
    with_rule = enriched.filter(
        F.array_contains("duplicateRules", "Page : 1ID:fingerprint")
    )
    assert with_rule.count() > 0


def test_quality_flags_computed_at_ingest_and_gate_rules(spark, tmp_path):
    short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_text = " ".join(f"tok{i}" for i in range(120))  # > 200 chars
    rows = [
        _page("https://a.example.org/1", short),
        _page("https://a.example.org/2", short),
        _page("https://b.example.org/1", long_text),
        _page("https://b.example.org/2", long_text),
        _page("https://c.example.org/1", short + " unique c", lang="english!!"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    cfg = DedupConfig(max_doc_chars=200)
    wk = str(tmp_path / "wk2")
    out = run_pipeline(spark, pages, wk, cfg, engines=("rules",))

    flags = {r["url"]: list(r["quality_flags"]) for r in out["corpus"].collect()}
    assert flags["https://a.example.org/1"] == []
    assert flags["https://b.example.org/1"] == ["text"]
    assert flags["https://b.example.org/2"] == ["text"]
    assert flags["https://c.example.org/1"] == ["lang"]

    pairs = {(r["src"], r["dst"]) for r in out["candidate_edges"].collect()}
    # unflagged identical pair matches; the oversize identical pair is
    # skipped by every rule (both records' `text` is flagged — P14)
    assert ("https://a.example.org/1", "https://a.example.org/2") in pairs
    assert ("https://b.example.org/1", "https://b.example.org/2") not in pairs

    # no-silent-gating: lineage records the flagged count
    lineage = [json.loads(line) for line in open(f"{wk}/lineage.jsonl")]
    corpus_rec = [r for r in lineage if r["stage"] == "corpus"][-1]
    assert corpus_rec["flagged_records"] == 3


def test_rules_plan_is_pure_equi_join(spark):
    """Scale guarantee: every rule variant must block as a shuffle-hash /
    sort-merge equi-join on derived key columns — never a theta join or
    cartesian product (the whole point of the key-space-duplication
    execution model, plans/rules.py module docstring)."""
    from co_deduplicate_spark.plans.rules import rule_pairs
    from co_deduplicate_spark.plans.scenarios import page_rules_spec

    docs = synth_pages(spark, 100, seed=7).selectExpr(
        "url", "text", "lang", "CAST(array() AS array<string>) AS quality_flags"
    )
    spec = page_rules_spec()
    plan = (
        rule_pairs(docs, list(spec.rules), spec.derived(), id_col="url",
                   flags_col=spec.flags_col)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rule_spec_invalidates_resume(spark, tmp_path):
    from co_deduplicate_spark.plans.rules import Rule, RuleEngineSpec
    from co_deduplicate_spark.plans.scenarios import _page_derived

    pages = synth_pages(spark, N, seed=42)
    wk = str(tmp_path / "wk3")
    out1 = run_pipeline(spark, pages, wk, DedupConfig(), engines=("rules",))
    n1 = out1["candidate_edges"].count()
    # fingerprint-only spec: fewer rules -> resume must NOT reuse old edges
    narrow = RuleEngineSpec(
        name="fp-only",
        rules=(Rule("Page : 1ID:fingerprint", keys=("fp",), non_empty=("text",)),),
        derived=_page_derived, flags_col="flags",
    )
    out2 = run_pipeline(spark, pages, wk, DedupConfig(), engines=("rules",),
                        rule_spec=narrow)
    rules2 = {r[0] for r in out2["candidate_edges"]
              .select(F.explode("rules")).distinct().collect()}
    assert rules2 == {"Page : 1ID:fingerprint"}
    assert out2["candidate_edges"].count() <= n1
