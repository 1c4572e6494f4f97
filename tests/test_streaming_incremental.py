"""Streaming dedup, incremental session semantics (G2), multimodal plumbing."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.config import DedupConfig
from co_deduplicate_spark.operators.multimodal import (
    decode_image_meta,
    exact_media_dedup,
    extract_features,
)
from co_deduplicate_spark.sources.pages import PAGES_SCHEMA, synth_pages
from co_deduplicate_spark.streaming.incremental import incremental_update, session_edges
from co_deduplicate_spark.streaming.stream_dedup import stream_exact_dedup

CFG = DedupConfig()


# ---------------------------------------------------------------- streaming
def test_stream_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "landing")
    pages = synth_pages(spark, 100, seed=42)
    pages.write.parquet(src)
    q = (
        stream_exact_dedup(spark, src, PAGES_SCHEMA)
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM deduped")
    n_in = pages.count()
    n_out = out.count()
    n_distinct_fp = pages.select(
        F.md5(F.regexp_replace(F.lower("text"), "[^0-9a-z]+", "")).alias("fp")
    ).distinct().count()
    assert n_out == n_distinct_fp < n_in  # exact+style dups collapsed


# ------------------------------------------------------- session semantics
def test_session_edges_filter(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b", ["rule1"], "s1"),   # rules → connectivity regardless of session
            ("b", "c", [], "s2"),          # current session, no rules → connectivity
            ("c", "d", [], "s1"),          # other session, no rules → node only
        ],
        "src string, dst string, rules array<string>, session string",
    )
    live = {(r["src"], r["dst"]) for r in session_edges(edges, "s2").collect()}
    assert live == {("a", "b"), ("b", "c")}


def test_incremental_update_merges_and_scopes(spark):
    # session 1: two clusters {a1,a2}, {b1,b2}; singleton c1
    texts = {
        "a1": "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
        "a2": "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
        "b1": "one two three four five six seven eight nine ten eleven twelve thirteen fourteen",
        "b2": "one two three four five six seven eight nine ten eleven twelve thirteen fourteen",
        "c1": "totally unrelated content about spark adaptive query execution and skew joins",
    }
    old_corpus = spark.createDataFrame(list(texts.items()), "url string, text string")
    old_edges = spark.createDataFrame(
        [("a1", "a2", ["minhash-lsh:k3"], "s1"), ("b1", "b2", ["minhash-lsh:k3"], "s1")],
        "src string, dst string, rules array<string>, session string",
    )
    old_labels = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1"), ("c1", "c1")],
        "node string, component string",
    )
    # session 2: a3 joins cluster A; d1 is new singleton
    new_pages = spark.createDataFrame(
        [("a3", texts["a1"]), ("d1", "fresh unseen words completely distinct vocabulary here today")],
        "url string, text string",
    )
    out = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG, "s2")
    labels = {r["node"]: r["component"] for r in out["labels"].collect()}
    assert labels["a3"] == labels["a1"] == labels["a2"]
    assert labels["b1"] == labels["b2"]
    assert labels["b1"] != labels["a1"]
    assert labels["c1"] == "c1"
    assert labels["d1"] == "d1"
    # only cluster A was touched
    affected = {r["component"] for r in out["affected_components"].collect()}
    assert affected == {"a1"}


# ------------------------------------------------------------- multimodal
def _tiny_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def test_multimodal_decode_and_dedup(spark):
    rows = [
        (1, _tiny_png(64, 32)),
        (2, _tiny_png(64, 32)),       # exact dup of 1
        (3, _tiny_png(128, 128)),
        (4, b"not an image"),
        (5, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    meta = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert meta[1]["kind"] == "png" and (meta[1]["width"], meta[1]["height"]) == (64, 32)
    assert meta[3]["width"] == 128
    assert meta[4]["valid"] is False and meta[4]["kind"] == "unknown"
    assert meta[5]["byte_len"] == 0
    assert meta[1]["sha256"] == meta[2]["sha256"]

    groups = exact_media_dedup(media).collect()
    dup = [g for g in groups if g["n"] == 2]
    assert len(dup) == 1 and dup[0]["members"] == [1, 2]

    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert feats[1] == feats[2]          # deterministic: same bytes → same features
    assert feats[1] != feats[3]
    assert len(feats[1]) == 16


def test_incremental_recrawl_newest_wins(spark):
    """A re-crawled url with changed text must deterministically keep the
    NEW text (reference update-by-id semantics) — the old row is anti-joined
    away before the union, never left to a nondeterministic dropDuplicates."""
    old_corpus = spark.createDataFrame(
        [("u1", "old words entirely about apples bananas cherries dates elderberry fig grape"),
         ("u2", "stable second document with its own unrelated vocabulary tokens here")],
        "url string, text string",
    )
    old_edges = spark.createDataFrame(
        [], "src string, dst string, rules array<string>, session string"
    )
    old_labels = spark.createDataFrame(
        [("u1", "u1"), ("u2", "u2")], "node string, component string"
    )
    new_text = "u1 recrawled brand new body matching nothing previous crawl produced at all"
    new_pages = spark.createDataFrame([("u1", new_text)], "url string, text string")
    out = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG, "s2")
    # rerun twice — identical outputs (determinism), and no edge should link
    # u1's OLD content to anything
    l1 = sorted(map(tuple, out["labels"].collect()))
    out2 = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG, "s2")
    assert l1 == sorted(map(tuple, out2["labels"].collect()))
    assert out["edges"].count() == 0


def test_stateful_host_sessions(spark, tmp_path):
    """applyInPandasWithState custom operator: per-host sessionization.
    Host A has two bursts separated by > gap -> the first session closes
    in-stream ('gap'); tails stay in state (timeout-bounded)."""
    from datetime import datetime, timedelta

    from co_deduplicate_spark.streaming.stateful import stream_host_sessions

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(5):  # burst 1 on host-a: 5 pages, 1 min apart
        rows.append((f"https://host-a.org/p/{i}", t0 + timedelta(minutes=i)))
    for i in range(3):  # burst 2 on host-a: 2h later
        rows.append((f"https://host-a.org/q/{i}", t0 + timedelta(hours=2, minutes=i)))
    rows.append(("https://host-b.org/only", t0))  # single-page host stays open
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp").select(
        "url", "warc_ts",
        F.lit(bytearray(b"")).alias("html"), F.lit("x").alias("text"), F.lit("en").alias("lang"),
    )
    src = str(tmp_path / "sess_landing")
    pages.write.parquet(src)

    q = (
        stream_host_sessions(spark, src, PAGES_SCHEMA, gap="30 minutes")
        .writeStream.format("memory").queryName("host_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    out = {(r["host"], r["session_seq"]): r
           for r in spark.sql("SELECT * FROM host_sessions").collect()}
    key = ("host-a.org", 1)
    assert key in out, f"first host-a session should close in-stream, got {out}"
    r = out[key]
    assert r["n_pages"] == 5
    assert r["closed_by"] == "gap"
    assert (r["end_ts"] - r["start_ts"]).total_seconds() == 240
    # host-b: watermark (max event time - 1h = t0+1h02) passed its
    # last_ts+gap (t0+30m) -> closed by TIMEOUT in the drain batch
    rb = out[("host-b.org", 1)]
    assert rb["closed_by"] == "timeout" and rb["n_pages"] == 1
    # host-a burst 2 (last ts t0+2h02, timeout t0+2h32 > watermark) stays open
    assert ("host-a.org", 2) not in out


def test_stream_session_counts_windows(spark, tmp_path):
    """Windowed ingest monitoring: the streaming windowed aggregation
    (count + approx-distinct content per window) equals the same
    aggregation computed in batch over identical data. Complete output
    mode — with a 1-hour watermark and a corpus spanning minutes, append
    mode would (correctly) emit nothing final yet."""
    from co_deduplicate_spark.functions.text_stats import fingerprint_expr
    from co_deduplicate_spark.streaming.stream_dedup import stream_session_counts

    src = str(tmp_path / "landing_counts")
    pages = synth_pages(spark, 200, seed=7)
    pages.write.parquet(src)
    q = (
        stream_session_counts(spark, src, PAGES_SCHEMA, window="1 minute")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window"]["start"], r["window"]["end"]): (r["n_pages"], r["approx_distinct"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window"]["start"], r["window"]["end"]): (r["n_pages"], r["approx_distinct"])
        for r in pages.groupBy(F.window("warc_ts", "1 minute"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct(fingerprint_expr(F.col("text"))).alias("approx_distinct"),
        )
        .collect()
    }
    assert len(got) >= 2  # corpus spans multiple windows
    assert got == want


def test_stream_upsert_sink_exactly_once(spark, tmp_path):
    """Streaming landing -> exact dedup -> keyed UpsertTable via
    foreachBatch: final table equals the distinct-fingerprint set, and
    replaying the whole stream into the same table (simulating
    redelivery) is a no-op on table state — idempotent keyed MERGE turns
    at-least-once delivery into exactly-once table contents."""
    from co_deduplicate_spark.sources.upsert import UpsertTable
    from co_deduplicate_spark.streaming.stream_sink import upsert_sink_query

    src = str(tmp_path / "landing_sink")
    pages = synth_pages(spark, 120, seed=11)
    pages.write.parquet(src)
    tbl_dir = str(tmp_path / "deduped_table")

    def run_once(ckpt):
        deduped = stream_exact_dedup(spark, src, PAGES_SCHEMA).select("fp", "url")
        q = upsert_sink_query(deduped, tbl_dir, str(tmp_path / ckpt), key="fp")
        q.processAllAvailable()
        q.stop()

    run_once("ckpt1")
    table = UpsertTable(spark, tbl_dir, key="fp")
    got_fps = {r["fp"] for r in table.read().select("fp").collect()}
    want_fps = {
        r["fp"] for r in pages.select(
            F.md5(F.regexp_replace(F.lower("text"), "[^0-9a-z]+", "")).alias("fp")
        ).distinct().collect()
    }
    assert got_fps == want_fps
    v1 = table._manifest()["version"]

    # restart against the SAME checkpoint: availableNow finds no new data,
    # no batch fires, the table snapshot is untouched — THE exactly-once
    # property (offsets + idempotent MERGE)
    run_once("ckpt1")
    assert UpsertTable(spark, tbl_dir, key="fp")._manifest()["version"] == v1

    # full redelivery (fresh checkpoint, same data): the keyed MERGE keeps
    # the table at one row per key. Which url survives per fp is
    # legitimately dedup-order-dependent across independent runs, so the
    # invariant here is key-set + cardinality, not byte equality.
    run_once("ckpt2")
    table2 = UpsertTable(spark, tbl_dir, key="fp")
    assert {r["fp"] for r in table2.read().select("fp").collect()} == want_fps
    assert table2.read().count() == len(want_fps)
    assert table2._manifest()["version"] > v1  # new snapshot, same key set


def test_incremental_delta_signatures_skip_old(spark):
    """The delta-signature path must (a) produce labels identical to the
    full-recompute path and (b) actually SKIP the kernel for old urls —
    proven by poisoning an old url's stored signature and watching the
    poison ride through to the output signature table untouched."""
    from co_deduplicate_spark.operators.minhash import with_minhash

    texts = {
        "a1": "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
        "a2": "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
        "c1": "totally unrelated content about spark adaptive query execution and skew joins",
    }
    old_corpus = spark.createDataFrame(list(texts.items()), "url string, text string")
    old_edges = spark.createDataFrame(
        [("a1", "a2", ["minhash-lsh:k3"], "s1")],
        "src string, dst string, rules array<string>, session string",
    )
    old_labels = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("c1", "c1")], "node string, component string"
    )
    new_pages = spark.createDataFrame(
        [("a3", texts["a1"])], "url string, text string"
    )
    old_sigs = with_minhash(old_corpus, CFG, id_col="url", text_col="text")

    full = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG, "s2")
    delta = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG,
                               "s2", old_signatures=old_sigs)
    assert sorted(map(tuple, full["labels"].collect())) == \
        sorted(map(tuple, delta["labels"].collect()))

    sentinel = [F.lit(-12345).cast("long")] * CFG.num_perms
    poisoned = old_sigs.withColumn(
        "minhash",
        F.when(F.col("doc") == "c1", F.array(*sentinel)).otherwise(F.col("minhash")),
    )
    out = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG,
                             "s2", old_signatures=poisoned)
    sigs = {r["doc"]: r["minhash"] for r in out["signatures"].collect()}
    # old url: stored (poisoned) signature reused verbatim — kernel not run
    assert sigs["c1"][0] == -12345 and len(set(sigs["c1"])) == 1
    # new url: real kernel output
    assert sigs["a3"] is not None and len(set(sigs["a3"])) > 1
    # replaced-url hygiene: every url appears exactly once
    assert sorted(sigs) == ["a1", "a2", "a3", "c1"]


def test_incremental_recrawl_resigns_changed_url(spark):
    """A re-crawled url must be RE-SIGNED on the delta path (newest-wins):
    its stale stored signature is dropped before the union, so the output
    signature reflects the new text."""
    from co_deduplicate_spark.operators.minhash import with_minhash

    old_corpus = spark.createDataFrame(
        [("u1", "old words entirely about apples bananas cherries dates elderberry fig")],
        "url string, text string",
    )
    old_edges = spark.createDataFrame(
        [], "src string, dst string, rules array<string>, session string")
    old_labels = spark.createDataFrame([("u1", "u1")], "node string, component string")
    new_text = "replacement body with wholly different vocabulary tokens present today"
    new_pages = spark.createDataFrame([("u1", new_text)], "url string, text string")
    old_sigs = with_minhash(old_corpus, CFG, id_col="url", text_col="text")
    out = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG,
                             "s2", old_signatures=old_sigs)
    got = out["signatures"].filter(F.col("doc") == "u1").collect()
    assert len(got) == 1
    want = with_minhash(new_pages, CFG, id_col="url", text_col="text").first()["minhash"]
    assert got[0]["minhash"] == want


def test_incremental_inconsistent_old_labels_relabeled_wins(spark):
    """If the supplied old labels are internally inconsistent (a node under
    two components, one affected and one not), the RELABELED value must win
    deterministically — never partition-order roulette."""
    old_corpus = spark.createDataFrame(
        [("x", "first document about completely standalone topics nobody else covers"),
         ("y", "second document body that the new crawl will duplicate exactly verbatim")],
        "url string, text string",
    )
    old_edges = spark.createDataFrame(
        [], "src string, dst string, rules array<string>, session string")
    old_labels = spark.createDataFrame(
        [("x", "cA"), ("x", "cB"), ("y", "cA")], "node string, component string"
    )
    new_pages = spark.createDataFrame(
        [("n1", "second document body that the new crawl will duplicate exactly verbatim")],
        "url string, text string",
    )
    for _ in range(2):  # stable across repeated runs
        out = incremental_update(old_corpus, old_edges, old_labels, new_pages, CFG, "s2")
        rows = out["labels"].filter(F.col("node") == "x").collect()
        assert len(rows) == 1
        assert rows[0]["component"] == "x"  # relabeled (affected-scope) value


def test_run_incremental_session_stateful(spark, tmp_path):
    """Two crawl sessions through the StageCatalog-backed session driver:
    state persists between calls, session 2 runs on the DELTA signature
    path (proven by poisoning the stored table between sessions), and the
    per-session lineage records the delta size."""
    import json as _json
    import shutil
    from pathlib import Path

    from co_deduplicate_spark.streaming.incremental import run_incremental_session

    wk = str(tmp_path / "sessions")
    dup_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    s1_pages = spark.createDataFrame(
        [("a1", dup_text), ("a2", dup_text),
         ("c1", "totally unrelated content about adaptive query execution and skew")],
        "url string, text string",
    )
    out1 = run_incremental_session(spark, wk, s1_pages, CFG, "s1")
    l1 = {r["node"]: r["component"] for r in out1["labels"].collect()}
    assert l1["a1"] == l1["a2"] != l1["c1"]
    assert _json.loads((Path(wk) / "_CURRENT.json").read_text())["session"] == "s1"

    # poison c1's STORED signature (keep the stage manifest): session 2
    # must carry the poison through, proving old urls are never re-signed
    sig_dir = Path(wk) / "signatures__s1"
    sigs = spark.read.parquet(str(sig_dir))
    sentinel = [F.lit(-7).cast("long")] * CFG.num_perms
    poisoned = sigs.withColumn(
        "minhash",
        F.when(F.col("doc") == "c1", F.array(*sentinel)).otherwise(F.col("minhash")),
    )
    tmp_dir = str(tmp_path / "poisoned_sigs")
    poisoned.write.mode("overwrite").parquet(tmp_dir)
    for f in sig_dir.glob("*.parquet"):
        f.unlink()
    for f in Path(tmp_dir).glob("*.parquet"):
        shutil.copy(str(f), str(sig_dir / f.name))

    s2_pages = spark.createDataFrame([("a3", dup_text)], "url string, text string")
    out2 = run_incremental_session(spark, wk, s2_pages, CFG, "s2")
    l2 = {r["node"]: r["component"] for r in out2["labels"].collect()}
    assert l2["a3"] == l2["a1"] == l2["a2"]
    assert sorted(l2) == ["a1", "a2", "a3", "c1"]
    sig2 = {r["doc"]: r["minhash"] for r in out2["signatures"].collect()}
    assert sig2["c1"][0] == -7          # stored signature reused, kernel skipped
    assert len(set(sig2["a3"])) > 1     # new url really signed
    assert _json.loads((Path(wk) / "_CURRENT.json").read_text())["session"] == "s2"
    lineage = [
        _json.loads(line) for line in (Path(wk) / "lineage.jsonl").read_text().splitlines()
    ]
    s2_rec = [r for r in lineage if r["stage"] == "session__s2"][-1]
    assert s2_rec["sig_delta_rows"] == 1
    assert s2_rec["corpus_rows"] == 4
