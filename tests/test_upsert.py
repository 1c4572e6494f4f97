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
