"""Keyed write-back table (sources/upsert.py): MERGE / DELETE / snapshot
semantics — the batch replacement for the reference's index / updateByQuery
/ deleteById + version-conflict retry (documentsManager.js:36-89, 336-356).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.sources.upsert import UpsertTable, ingest_defaults


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, val string")


@pytest.fixture()
def tbl(spark, tmp_path):
    return UpsertTable(spark, str(tmp_path / "t"), key="url")


def test_upsert_insert_and_replace(spark, tbl):
    tbl.upsert(_df(spark, [("a", "1"), ("b", "1")]))
    tbl.upsert(_df(spark, [("b", "2"), ("c", "1")]))
    got = {r.url: r.val for r in tbl.read().collect()}
    assert got == {"a": "1", "b": "2", "c": "1"}


def test_upsert_idempotent(spark, tbl):
    batch = _df(spark, [("a", "1"), ("b", "2")])
    t1 = sorted(map(tuple, tbl.upsert(batch).collect()))
    t2 = sorted(map(tuple, tbl.upsert(batch).collect()))
    assert t1 == t2 == [("a", "1"), ("b", "2")]


def test_delete_by_id(spark, tbl):
    tbl.upsert(_df(spark, [("a", "1"), ("b", "1"), ("c", "1")]))
    tbl.delete_by_id(["b", "zzz"])
    assert {r.url for r in tbl.read().collect()} == {"a", "c"}


def test_create_if_not_exists_existing_wins(spark, tbl):
    tbl.create_if_not_exists(_df(spark, [("a", "1")]))
    tbl.create_if_not_exists(_df(spark, [("a", "OTHER"), ("b", "x")]))
    assert {r.url: r.val for r in tbl.read().collect()} == {"a": "1"}


def test_crash_leaves_readers_on_old_snapshot(spark, tbl):
    tbl.upsert(_df(spark, [("a", "1")]))
    # simulate a writer that died after writing data but before the flip:
    # a dangling version dir must be invisible to readers
    _df(spark, [("a", "CORRUPT")]).write.mode("overwrite").parquet(str(tbl.dir / "v_99999"))
    assert {r.val for r in tbl.read().collect()} == {"1"}
    # and the next successful upsert still works
    tbl.upsert(_df(spark, [("a", "2")]))
    assert {r.val for r in tbl.read().collect()} == {"2"}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """O(touched) contract: an upsert leaves every bucket that contains no
    updated key pointing at its ORIGINAL version directory — the files are
    never copied, so they stay byte-identical across unrelated upserts."""
    import hashlib
    from pathlib import Path

    tbl = UpsertTable(spark, str(tmp_path / "bt"), key="url", n_buckets=8)
    tbl.upsert(_df(spark, [(f"k{i}", "v1") for i in range(64)]))
    m1 = tbl._manifest()
    assert m1["n_buckets"] == 8 and len(m1["buckets"]) == 8

    def file_hashes(rel):
        d = Path(tbl.dir) / rel
        return {p.name: hashlib.sha256(p.read_bytes()).hexdigest()
                for p in sorted(d.glob("*.parquet"))}

    before = {b: file_hashes(rel) for b, rel in m1["buckets"].items()}
    tbl.upsert(_df(spark, [("k3", "v2")]))
    m2 = tbl._manifest()
    touched = [b for b, rel in m2["buckets"].items() if rel != m1["buckets"][b]]
    assert len(touched) == 1, f"exactly one bucket rewritten, got {touched}"
    for b, rel in m2["buckets"].items():
        if b not in touched:
            assert rel == m1["buckets"][b]  # carried forward by reference
            assert file_hashes(rel) == before[b]  # bytes untouched
    # and the merge itself is correct
    got = {r.url: r.val for r in tbl.read().collect()}
    assert got == {f"k{i}": ("v2" if i == 3 else "v1") for i in range(64)}


def test_delete_touches_only_own_buckets(spark, tmp_path):
    tbl = UpsertTable(spark, str(tmp_path / "bd"), key="url", n_buckets=8)
    tbl.upsert(_df(spark, [(f"k{i}", "x") for i in range(64)]))
    m1 = tbl._manifest()
    tbl.delete_by_id(["k5"])
    m2 = tbl._manifest()
    changed = [b for b in m1["buckets"]
               if m2["buckets"].get(b) != m1["buckets"][b]]
    assert len(changed) == 1
    assert m2["rows"] == 63
    assert "k5" not in {r.url for r in tbl.read().collect()}


def test_drop(spark, tbl):
    tbl.upsert(_df(spark, [("a", "1")]))
    tbl.drop()
    assert not tbl.exists()


def test_ingest_defaults_stamps(spark):
    df = spark.createDataFrame([("u1", "s1", None), ("u2", "s2", "!pre!")],
                               "url string, source string, sourceUidChain string")
    out = ingest_defaults(df, uid_col="url", source_col="source", now="2024-01-01 00:00:00")
    rows = {r.url: r for r in out.collect()}
    # S7: default chain '!{uid}!', existing chain preserved
    assert rows["u1"].sourceUidChain == "!u1!"
    assert rows["u2"].sourceUidChain == "!pre!"
    # default sources = [source]; dates stamped
    assert rows["u1"].sources == ["s1"]
    assert str(rows["u1"].creationDate) == "2024-01-01 00:00:00"
    assert str(rows["u1"].modificationDate) == "2024-01-01 00:00:00"


def test_bulk_create_error_side_channel(spark, tbl, tmp_path):
    from pyspark.sql import functions as F

    from co_deduplicate_spark.sources.upsert import bulk_create

    docs = spark.createDataFrame(
        [("a", "ok"), ("b", ""), (None, "x"), ("c", "fine")], "url string, val string"
    )
    validators = {
        "missing_id": F.col("url").isNotNull(),
        "empty_val": F.length(F.col("val")) > 0,
    }
    rej_dir = str(tmp_path / "rejected")
    stats = bulk_create(tbl, docs, validators, rejected_dir=rej_dir)
    assert stats == {"accepted": 2, "rejected": 2}
    assert {r.url for r in tbl.read().collect()} == {"a", "c"}
    rej = [(r["url"], list(r["_errors"]))
           for r in spark.read.parquet(rej_dir).select("url", "_errors").collect()]
    assert (None, ["missing_id"]) in rej
    assert ("b", ["empty_val"]) in rej


def test_bulk_create_null_evaluating_validator_rejects(spark, tbl, tmp_path):
    """A validator that evaluates to NULL (length(NULL) > 0) must count as
    FAILED — unknown rejects; NULL-field rows land in the side channel,
    never silently in the table."""
    from pyspark.sql import functions as F

    from co_deduplicate_spark.sources.upsert import bulk_create

    docs = spark.createDataFrame(
        [("a", "ok"), ("b", None)], "url string, val string"
    )
    rej_dir = str(tmp_path / "rej_null")
    stats = bulk_create(tbl, docs, {"empty_val": F.length(F.col("val")) > 0},
                        rejected_dir=rej_dir)
    assert stats == {"accepted": 1, "rejected": 1}
    assert {r.url for r in tbl.read().collect()} == {"a"}
    rej = [(r["url"], list(r["_errors"]))
           for r in spark.read.parquet(rej_dir).select("url", "_errors").collect()]
    assert rej == [("b", ["empty_val"])]


def test_bulk_create_throw_after_side_channel(spark, tbl, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from co_deduplicate_spark.sources.upsert import bulk_create

    docs = spark.createDataFrame([("a", ""), ("b", "y")], "url string, val string")
    rej_dir = str(tmp_path / "rej2")
    with _pytest.raises(ValueError, match="1 rejected"):
        bulk_create(tbl, docs, {"empty_val": F.length("val") > 0},
                    rejected_dir=rej_dir, throw_on_error=True)
    # side channel and accepted rows are fully written before the throw
    assert spark.read.parquet(rej_dir).count() == 1
    assert {r.url for r in tbl.read().collect()} == {"b"}


def test_concurrent_flip_raises_not_loses(spark, tmp_path):
    """CAS on the manifest flip: a writer whose read version was overtaken
    mid-mutation must FAIL LOUDLY (ConcurrentWriteError), leaving the
    interposed manifest — and every bucket it references — intact. The
    batch analogue of the reference's version-conflict retry
    (documentsManager.js:336-356)."""
    import json as _json

    from co_deduplicate_spark.sources.upsert import MANIFEST, ConcurrentWriteError

    t = UpsertTable(spark, str(tmp_path / "cas_tbl"), key="k", n_buckets=4)
    t.create_if_not_exists(
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    )
    orig = t._write_buckets

    def racing(df, version):
        out = orig(df, version)
        # another writer lands a newer manifest between our bucket write
        # and our flip
        p = t.dir / MANIFEST
        m = _json.loads(p.read_text())
        m["version"] += 1
        p.write_text(_json.dumps(m))
        return out

    t._write_buckets = racing
    with pytest.raises(ConcurrentWriteError, match="moved from"):
        t.upsert(spark.createDataFrame([("a", 9)], "k string, v int"))
    # the table is still fully readable at the interposed version — the
    # losing writer's dangling version dir is ignored, no buckets lost
    fresh = UpsertTable(spark, str(tmp_path / "cas_tbl"), key="k")
    assert {(r["k"], r["v"]) for r in fresh.read().collect()} == {("a", 1), ("b", 2)}


def test_delete_by_id_long_key(spark, tmp_path):
    """delete_by_id must bucket its ids with the SAME expression as stored
    rows (_bucket_expr's cast-to-string) for non-string key types — a
    mismatched bucket silently misses the delete because the touched-bucket
    filter prunes the real bucket away."""
    t = UpsertTable(spark, str(tmp_path / "lk"), key="id", n_buckets=8)
    t.create_if_not_exists(
        spark.createDataFrame([(i, f"v{i}") for i in range(32)], "id long, val string")
    )
    t.delete_by_id([3, 17])
    assert {r["id"] for r in t.read().collect()} == set(range(32)) - {3, 17}
    assert t._manifest()["rows"] == 30


def test_claim_version_excludes_live_and_breaks_stale(spark, tmp_path):
    """The O_EXCL version claim closes the check-then-rename TOCTOU window:
    a version already claimed by a LIVE foreign writer fails the mutation
    before any data write; a claim left by a DEAD writer (crash between
    claim and flip) is broken and the mutation proceeds; a claim owned by
    the CURRENT process (a same-process retry after a mid-mutation
    failure) is re-claimable — raising there would make retry_on_conflict
    spin on its own stale claim forever."""
    import json as _json
    import subprocess
    import time as _time

    from co_deduplicate_spark.sources.upsert import ConcurrentWriteError

    t = UpsertTable(spark, str(tmp_path / "claim_tbl"), key="k", n_buckets=4)
    t.create_if_not_exists(spark.createDataFrame([("a", 1)], "k string, v int"))
    claim = t.dir / ".claim_v_00002"
    live = subprocess.Popen(["sleep", "300"])  # a genuinely foreign live pid
    try:
        claim.write_text(_json.dumps({"pid": live.pid, "at": 0}))
        with pytest.raises(ConcurrentWriteError, match="claimed by live"):
            t.upsert(spark.createDataFrame([("a", 2)], "k string, v int"))
        assert {r["v"] for r in t.read().collect()} == {1}  # snapshot untouched
    finally:
        live.kill()
        live.wait()

    p = subprocess.Popen(["true"])  # a pid guaranteed dead after wait()
    p.wait()
    _time.sleep(0.05)
    claim.write_text(_json.dumps({"pid": p.pid, "at": 0}))
    t.upsert(spark.createDataFrame([("a", 2)], "k string, v int"))
    assert {r["v"] for r in t.read().collect()} == {2}


def test_claim_version_own_uncommitted_claim_is_reclaimable(spark, tmp_path):
    """A mutation that fails AFTER claiming but BEFORE the flip, retried in
    the SAME process (retry_on_conflict), must be able to re-claim its own
    uncommitted version instead of deadlocking on it."""
    import json as _json
    import os

    t = UpsertTable(spark, str(tmp_path / "own_claim"), key="k", n_buckets=4)
    t.create_if_not_exists(spark.createDataFrame([("a", 1)], "k string, v int"))
    (t.dir / ".claim_v_00002").write_text(
        _json.dumps({"pid": os.getpid(), "at": 0})
    )  # our own stale claim from a failed earlier attempt
    t.upsert(spark.createDataFrame([("a", 2)], "k string, v int"))
    assert {r["v"] for r in t.read().collect()} == {2}


def test_claim_published_atomically_and_empty_claim_is_debris(spark, tmp_path):
    """Claims are hardlink-published so a live claim is never observable
    without its payload — which makes the converse safe: a content-less
    claim file can only be corrupt debris (never a mid-creation live
    writer) and is broken, the mutation proceeding. No .tmp staging file
    may linger either way."""
    t = UpsertTable(spark, str(tmp_path / "atomic_claim"), key="k", n_buckets=4)
    t.create_if_not_exists(spark.createDataFrame([("a", 1)], "k string, v int"))
    (t.dir / ".claim_v_00002").write_text("")  # corrupt/empty debris
    t.upsert(spark.createDataFrame([("a", 2)], "k string, v int"))
    assert {r["v"] for r in t.read().collect()} == {2}
    # post-commit the claim marker persists WITH content (straggler guard),
    # and no staging tmp is left behind
    import json as _json

    assert _json.loads((t.dir / ".claim_v_00002").read_text())["pid"] > 0
    assert not list(t.dir.glob(".claim_v_*.tmp"))


def test_vacuum_removes_only_unreferenced_versions(spark, tmp_path):
    """vacuum (the directory protocol's expire_snapshots) removes version
    dirs the current manifest no longer references, keeps carried-forward
    dirs alive, keeps in-flight (claimed > current) dirs, and the table
    reads identically afterwards."""
    import json as _json

    t = UpsertTable(spark, str(tmp_path / "vac"), key="k", n_buckets=4)
    t.create_if_not_exists(
        spark.createDataFrame([(f"k{i}", i) for i in range(8)], "k string, v int")
    )
    # touch a SUBSET of buckets twice so v1 stays partially referenced
    t.upsert(spark.createDataFrame([("k0", 100)], "k string, v int"))   # v2
    t.upsert(spark.createDataFrame([("k0", 200)], "k string, v int"))   # v3
    m = t._manifest()
    refd = {rel.split("/", 1)[0] for rel in m["buckets"].values()}
    assert "v_00001" in refd and "v_00002" not in refd  # carry-forward + a dead dir
    # an in-flight writer's claimed-but-unflipped version dir must survive
    (t.dir / "v_00009").mkdir()
    (t.dir / ".claim_v_00009").write_text(_json.dumps({"pid": 1, "at": 0}))
    before = sorted((r["k"], r["v"]) for r in t.read().collect())

    out = t.vacuum()
    assert "v_00002" in out["removed"]
    assert "v_00001" in out["kept"] and "v_00009" in out["kept"]
    assert not (t.dir / "v_00002").exists() and (t.dir / "v_00009").exists()
    assert (t.dir / ".claim_v_00002").exists()  # straggler guard survives
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) == before
    assert t.vacuum()["removed"] == []  # idempotent


def test_delete_by_id_rejects_dataframe(spark, tmp_path):
    """Passing a DataFrame where a list of ids is expected must raise, not
    silently delete nothing (DataFrame iteration yields Columns via the
    sequence protocol, so the probe ids would be 'Column<...>' strings)."""
    t = UpsertTable(spark, str(tmp_path / "df_guard"), key="k", n_buckets=4)
    t.create_if_not_exists(spark.createDataFrame([("a", 1)], "k string, v int"))
    with pytest.raises(TypeError, match="list of id values"):
        t.delete_by_id(spark.createDataFrame([("a",)], "k string"))
    assert t.read().count() == 1


def test_claim_of_committed_version_raises_even_if_owner_dead(spark, tmp_path):
    """A straggler that read a stale snapshot must never re-claim (and
    overwrite the data dirs of) a version that is already COMMITTED — even
    when the committing process has exited. Claim files persist after
    commit precisely for this."""
    import json as _json

    from co_deduplicate_spark.sources.upsert import ConcurrentWriteError

    t = UpsertTable(spark, str(tmp_path / "straggler"), key="k", n_buckets=4)
    t.create_if_not_exists(spark.createDataFrame([("a", 1)], "k string, v int"))
    t.upsert(spark.createDataFrame([("b", 2)], "k string, v int"))  # commits v2
    # claim owner "exits": rewrite the claim with a dead pid
    import subprocess

    p = subprocess.Popen(["true"])
    p.wait()
    (t.dir / ".claim_v_00002").write_text(_json.dumps({"pid": p.pid, "at": 0}))
    with pytest.raises(ConcurrentWriteError, match="already committed"):
        t._claim_version(2)


def test_retry_on_conflict_both_writers_land(spark, tmp_path):
    """Two interleaved writers through retry_on_conflict: writer B commits
    in A's claim window; A's first attempt fails with ConcurrentWriteError,
    its retry re-reads the snapshot and re-derives, and BOTH mutations end
    up in the table — the reference's 6×166 ms conflict-retry loop
    (documentsManager.js:336-356) realized for the batch table."""
    from co_deduplicate_spark.sources.upsert import retry_on_conflict

    d = str(tmp_path / "rc_tbl")
    UpsertTable(spark, d, key="k", n_buckets=4).create_if_not_exists(
        spark.createDataFrame([("a", 1)], "k string, v int")
    )
    fired = {"b": False}
    attempts = {"n": 0}

    def mutate():
        attempts["n"] += 1
        tab = UpsertTable(spark, d, key="k")
        cur = {r["k"]: r["v"] for r in tab.read().collect()}  # re-read snapshot
        orig_claim = tab._claim_version

        def claim_with_interposed_writer(version):
            if not fired["b"]:  # writer B lands inside A's claim window
                fired["b"] = True
                UpsertTable(spark, d, key="k").upsert(
                    spark.createDataFrame([("x", 99)], "k string, v int")
                )
            orig_claim(version)

        tab._claim_version = claim_with_interposed_writer
        return tab.upsert(
            spark.createDataFrame([("a", cur["a"] + 10)], "k string, v int")
        )

    out = retry_on_conflict(mutate, times=3, delay_ms=1)
    assert {(r["k"], r["v"]) for r in out.collect()} == {("a", 11), ("x", 99)}
    assert fired["b"] and attempts["n"] == 2


def test_upsert_counts_from_footers(spark, tmp_path):
    """Manifest row counts must stay exact through upsert/delete now that
    they derive from parquet footers instead of count() jobs."""
    t = UpsertTable(spark, str(tmp_path / "footer_tbl"), key="k", n_buckets=4)
    t.create_if_not_exists(
        spark.createDataFrame([(str(i), i) for i in range(20)], "k string, v int")
    )
    assert t._manifest()["rows"] == 20
    t.upsert(spark.createDataFrame([("5", 99), ("100", 1)], "k string, v int"))
    assert t._manifest()["rows"] == 21
    assert t.read().count() == 21
    t.delete_by_id(["5", "6", "7", "no-such-key"])
    assert t._manifest()["rows"] == 18
    assert t.read().count() == 18


def test_iceberg_table_requires_runtime(spark, tmp_path):
    """Asking for an Iceberg-backed table without the runtime jars must
    raise at construction — never silently fall back to a local dir."""
    from co_deduplicate_spark.sources.catalog import StageCatalog, iceberg_available

    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; dispatch covered by "
                    "test_iceberg_dispatch_lifecycle")
    with pytest.raises(RuntimeError, match="Iceberg"):
        UpsertTable(spark, str(tmp_path / "ice"), key="k", iceberg_table="db.t")
    with pytest.raises(RuntimeError, match="Iceberg"):
        StageCatalog(spark, str(tmp_path / "icecat"), "h", iceberg_db="db")


def test_iceberg_dispatch_lifecycle(spark, tmp_path):
    """Full S5/S3/S8/S2/S6 lifecycle through the Iceberg SQL dispatch
    (MERGE INTO / DELETE FROM). Skipped where the Iceberg Spark runtime is
    not on the classpath (this sandbox); on a cluster with the jars this
    is the production write path."""
    from co_deduplicate_spark.sources.catalog import iceberg_available

    if not iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime not on classpath (sandbox)")
    spark.conf.set("spark.sql.catalog.graft_test",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_test.warehouse",
                   str(tmp_path / "warehouse"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_test.db")
    t = UpsertTable(spark, str(tmp_path / "unused"), key="k",
                    iceberg_table="graft_test.db.t")
    t.drop()
    t.create_if_not_exists(
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"))
    t.upsert(spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int"))
    t.delete_by_id(["a"])
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {("b", 20), ("c", 3)}
    t.drop()
    assert not t.exists()
