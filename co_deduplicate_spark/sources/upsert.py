"""Keyed per-record write-back: MERGE-INTO / row-level DELETE semantics.

The reference's end state is every affected document rewritten in place —
``index`` upserts one doc (/root/reference/src/documentsManager.js:45-54,
S3), ``updateByQuery`` + Painless rewrites every doc matching a query
(documentsManager.js:78-89, 330-333, S8), ``deleteById`` removes one
(documentsManager.js:36-43, S2), and the ingest pipeline stamps
creation/modification dates and chain/sources defaults
(helpers/esHelpers/painless/setCreationAndModificationDate.painless:1-25,
S7). Elasticsearch gives it per-document atomicity plus an optimistic
version-conflict retry loop (documentsManager.js:336-356).

Spark-first replacement: a versioned, HASH-BUCKETED snapshot table. Rows
live in ``n_buckets`` directories keyed by ``pmod(xxhash64(key), n)``; a
mutation rewrites ONLY the buckets containing updated keys and carries
every untouched bucket forward BY REFERENCE in the manifest (its files are
never copied, so they stay byte-identical across unrelated upserts). The
manifest flip is atomic (write-temp-then-rename) — readers see the old
snapshot until the flip, a crashed writer leaves dangling (ignored)
version dirs, and re-running the same mutation is idempotent. On a
cluster with Iceberg on the classpath the same calls map to ``MERGE INTO``
/ ``DELETE FROM`` (snapshot isolation + merge-on-read for free); this
directory protocol is the sandbox fallback with the same contract.

Scale: an upsert shuffles only the updated keys plus the rows of touched
buckets — O(touched/n_buckets of the table), not O(table). A 100 TB
enriched table at n_buckets=4096 rewrites ~25 GB per single-bucket
update batch instead of 100 TB.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_TABLE_MANIFEST.json"


def ingest_defaults(df: DataFrame, uid_col: str = "url", source_col: str | None = "source",
                    now: str | None = None) -> DataFrame:
    """S7 write-side defaults (setCreationAndModificationDate.painless:1-25):
    default ``creationDate``, always set ``modificationDate``, default
    ``sourceUidChain='!{uid}!'``, default ``sources=[source]``.

    ``now``: fixed ``'yyyy-MM-dd HH:mm:ss'`` literal for deterministic
    tests/oracles; None = current_timestamp().
    """
    ts: Column = F.lit(now).cast("timestamp") if now else F.current_timestamp()
    cols = set(df.columns)
    creation = (
        F.coalesce(F.col("creationDate"), ts) if "creationDate" in cols else ts
    )
    chain = (
        F.coalesce(F.col("sourceUidChain"),
                   F.concat(F.lit("!"), F.col(uid_col), F.lit("!")))
        if "sourceUidChain" in cols
        else F.concat(F.lit("!"), F.col(uid_col), F.lit("!"))
    )
    out = (
        df.withColumn("creationDate", creation)
        .withColumn("modificationDate", ts)
        .withColumn("sourceUidChain", chain)
    )
    if source_col is not None:
        srcs = (
            F.coalesce(F.col("sources"), F.array(F.col(source_col)))
            if "sources" in cols
            else F.array(F.col(source_col))
        )
        out = out.withColumn("sources", srcs)
    return out


class UpsertTable:
    """Versioned hash-bucketed keyed table: upsert / delete / read with
    snapshot flips, rewriting only touched buckets.

    Layout: ``<dir>/v_<n>/_bucket=<k>/*.parquet`` + a manifest mapping
    every live bucket to the version directory that owns it, e.g.
    ``{"7": "v_00003/_bucket=7", "8": "v_00001/_bucket=8"}`` — bucket 8
    has not been touched since v1 and its files are shared by reference.
    The manifest is written via write-temp-then-rename — the only mutation
    readers can observe is the completed flip (the reference needs 6
    retries and ``refresh:true`` to approximate this; a deterministic
    snapshot protocol needs none).

    ``n_buckets`` is fixed at table creation (stored in the manifest;
    the constructor argument is ignored for existing tables).
    """

    def __init__(self, spark: SparkSession, table_dir: str, key: str = "url",
                 n_buckets: int = 32):
        self.spark = spark
        self.dir = Path(table_dir)
        self.key = key
        self.requested_buckets = n_buckets
        self.dir.mkdir(parents=True, exist_ok=True)

    # -- manifest protocol --------------------------------------------------
    def _manifest(self) -> dict | None:
        p = self.dir / MANIFEST
        if not p.exists():
            return None
        try:
            return json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            return None

    def _n_buckets(self) -> int:
        m = self._manifest()
        return m["n_buckets"] if m else self.requested_buckets

    def _bucket_expr(self) -> Column:
        # key cast to string so the bucket function is stable across key
        # types; deterministic (resume/idempotency requirement)
        return F.pmod(F.xxhash64(F.col(self.key).cast("string")),
                      F.lit(self._n_buckets()))

    def _flip(self, version: int, rows: int, op: str, buckets: dict[str, str],
              schema_json: str) -> None:
        m = {
            "current": f"v_{version:05d}",
            "version": version,
            "key": self.key,
            "rows": rows,
            "n_buckets": self._n_buckets(),
            "buckets": buckets,
            "schema": schema_json,
            "last_op": op,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = self.dir / f".{MANIFEST}.tmp"
        tmp.write_text(json.dumps(m, indent=2))
        tmp.rename(self.dir / MANIFEST)  # atomic on POSIX

    def _next_version(self) -> int:
        m = self._manifest()
        return (m["version"] + 1) if m else 1

    def _write_buckets(self, df: DataFrame, version: int) -> dict[str, str]:
        """Write df (must carry ``_bucket``) partitioned by bucket under the
        version dir; return {bucket: relative path} for dirs that exist."""
        vdir = f"v_{version:05d}"
        df.write.partitionBy("_bucket").mode("overwrite").parquet(str(self.dir / vdir))
        out = {}
        for p in sorted((self.dir / vdir).glob("_bucket=*")):
            out[p.name.split("=", 1)[1]] = f"{vdir}/{p.name}"
        return out

    def _read_paths(self, rel_paths: list[str], schema_json: str | None = None) -> DataFrame:
        if not rel_paths:
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(json.loads(schema_json))
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*[str(self.dir / p) for p in rel_paths])
        )

    def _write_full(self, df: DataFrame, op: str) -> DataFrame:
        version = self._next_version()
        buckets = self._write_buckets(df.withColumn("_bucket", self._bucket_expr()),
                                      version)
        out = self._read_paths(list(buckets.values()), df.schema.json())
        self._flip(version, out.count(), op, buckets, df.schema.json())
        return self.read()

    # -- public API ----------------------------------------------------------
    def exists(self) -> bool:
        return self._manifest() is not None

    def read(self) -> DataFrame:
        m = self._manifest()
        if m is None:
            raise FileNotFoundError(f"no table at {self.dir}")
        return self._read_paths(list(m["buckets"].values()), m.get("schema"))

    def create_if_not_exists(self, df: DataFrame) -> DataFrame:
        """S5 ``createIndiceNx``: initialize iff absent; existing data wins."""
        if self.exists():
            return self.read()
        return self._write_full(df.dropDuplicates([self.key]), "create")

    def upsert(self, updates: DataFrame) -> DataFrame:
        """S3/S8 MERGE INTO: new key → insert, existing key → replace.

        O(touched buckets): only buckets containing an updated key are read,
        merged (anti-join old ∖ updates ∪ updates) and rewritten; all other
        buckets carry forward by manifest reference, files untouched.
        Deterministic and idempotent: upserting the same batch twice yields
        the identical table (keyed replace, no append)."""
        updates = updates.dropDuplicates([self.key])
        if not self.exists():
            return self._write_full(updates, "upsert")
        m = self._manifest()
        up = updates.withColumn("_bucket", self._bucket_expr()).localCheckpoint()
        touched = sorted(r["_bucket"] for r in up.select("_bucket").distinct().collect())
        if not touched:
            return self.read()
        old_rel = [m["buckets"][str(b)] for b in touched if str(b) in m["buckets"]]
        old_touched = self._read_paths(old_rel, m.get("schema"))
        n_old_touched = old_touched.count()
        kept = (
            old_touched.join(up.select(self.key), self.key, "left_anti")
            .withColumn("_bucket", self._bucket_expr())
        )
        merged = kept.unionByName(up, allowMissingColumns=True)
        version = self._next_version()
        new_dirs = self._write_buckets(merged, version)
        buckets = dict(m["buckets"])
        buckets.update(new_dirs)
        n_merged = self._read_paths(list(new_dirs.values())).count()
        rows = m["rows"] - n_old_touched + n_merged
        schema = self._read_paths(list(buckets.values()), m.get("schema")).schema.json()
        self._flip(version, rows, "upsert", buckets, schema)
        return self.read()

    def delete_by_id(self, ids: list) -> DataFrame:
        """S2 ``deleteById`` (row-level DELETE), batched — O(touched buckets)."""
        m = self._manifest()
        if m is None:
            raise FileNotFoundError(f"no table at {self.dir}")
        id_df = self.spark.createDataFrame(
            [(str(i),) for i in ids], f"{self.key} string"
        ).withColumn("_bucket", F.pmod(F.xxhash64(F.col(self.key)),
                                       F.lit(self._n_buckets())))
        touched = sorted(r["_bucket"] for r in id_df.select("_bucket").distinct().collect())
        old_rel = [m["buckets"][str(b)] for b in touched if str(b) in m["buckets"]]
        if not old_rel:
            return self.read()
        old_touched = self._read_paths(old_rel, m.get("schema"))
        n_old_touched = old_touched.count()
        filtered = (
            old_touched.filter(~F.col(self.key).cast("string").isin([str(i) for i in ids]))
            .withColumn("_bucket", self._bucket_expr())
        )
        version = self._next_version()
        new_dirs = self._write_buckets(filtered, version)
        buckets = dict(m["buckets"])
        for b in touched:  # a bucket emptied by the delete disappears
            buckets.pop(str(b), None)
        buckets.update(new_dirs)
        n_left = self._read_paths(list(new_dirs.values()), m.get("schema")).count()
        self._flip(version, m["rows"] - n_old_touched + n_left, "delete",
                   buckets, m.get("schema"))
        return self.read()

    def drop(self) -> None:
        """S6 ``deleteIndiceIx``: drop iff present."""
        import shutil

        if self.dir.exists():
            shutil.rmtree(self.dir)


def bulk_create(table: UpsertTable, docs: DataFrame,
                validators: dict[str, Column],
                rejected_dir: str | None = None,
                throw_on_error: bool = False) -> dict:
    """S4 ``bulkCreate`` with the per-item error side-channel
    (/root/reference/src/documentsManager.js:91-127): rows failing any
    validator are captured with the list of failed checks — written to
    ``rejected_dir`` (parquet) when given — while accepted rows are
    upserted keyed by ``table.key`` (the reference keys bulk items by
    ``technical.internalId``, buildCreateBody at 129-141).

    ``validators`` maps error-name → boolean Column (True = row OK). A
    validator that evaluates to NULL (e.g. ``length(col) > 0`` on a NULL
    field) counts as FAILED — unknown must reject, not silently accept
    (validators therefore need not be null-safe themselves).
    Returns counters {accepted, rejected}; ``throw_on_error`` mirrors the
    reference's optional throw (documentsManager.js:122-124) after the
    side-channel is fully written — nothing is lost either way.
    """
    errors = F.filter(
        F.array(*[
            F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)).otherwise(F.lit(None))
            for name, cond in validators.items()
        ]),
        lambda x: x.isNotNull(),
    )
    tagged = docs.withColumn("_errors", errors).localCheckpoint()
    accepted = tagged.filter(F.size("_errors") == 0).drop("_errors")
    rejected = tagged.filter(F.size("_errors") > 0)
    n_rejected = rejected.count()
    if n_rejected and rejected_dir:
        rejected.write.mode("overwrite").parquet(rejected_dir)
    table.upsert(accepted)
    n_accepted = accepted.count()
    if n_rejected and throw_on_error:
        raise ValueError(f"bulk_create: {n_rejected} rejected rows"
                         + (f" (written to {rejected_dir})" if rejected_dir else ""))
    return {"accepted": n_accepted, "rejected": n_rejected}
