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

Spark-first replacement: a versioned snapshot table. Every mutation writes
a complete new version directory and then atomically flips a manifest
pointer — readers see the old snapshot until the flip, a crashed writer
leaves a dangling (ignored) version dir, and re-running the same mutation
is idempotent. On a cluster with Iceberg on the classpath the same calls
map to ``MERGE INTO`` / ``DELETE FROM`` (snapshot isolation for free);
this directory protocol is the sandbox fallback with the same contract.

Scale: an upsert shuffles only on the key (anti-join old ∖ updates), and
the rewrite is proportional to the full table — on Iceberg the anti-join
becomes a merge-on-read delete file, turning upserts into O(updates).
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
    """Versioned keyed table: upsert / delete / read with snapshot flips.

    Layout: ``<dir>/v_<n>/*.parquet`` + ``<dir>/_TABLE_MANIFEST.json``
    naming the current version. The manifest is written via
    write-temp-then-rename — the only mutation readers can observe is the
    completed flip (the reference needs 6 retries and ``refresh:true`` to
    approximate this; a deterministic snapshot protocol needs none).
    """

    def __init__(self, spark: SparkSession, table_dir: str, key: str = "url"):
        self.spark = spark
        self.dir = Path(table_dir)
        self.key = key
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

    def _flip(self, version: int, rows: int, op: str) -> None:
        m = {
            "current": f"v_{version:05d}",
            "version": version,
            "key": self.key,
            "rows": rows,
            "last_op": op,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = self.dir / f".{MANIFEST}.tmp"
        tmp.write_text(json.dumps(m, indent=2))
        tmp.rename(self.dir / MANIFEST)  # atomic on POSIX

    def _write_version(self, df: DataFrame, op: str) -> DataFrame:
        m = self._manifest()
        version = (m["version"] + 1) if m else 1
        path = str(self.dir / f"v_{version:05d}")
        df.write.mode("overwrite").parquet(path)
        rows = self.spark.read.parquet(path).count()
        self._flip(version, rows, op)
        return self.read()

    # -- public API ----------------------------------------------------------
    def exists(self) -> bool:
        return self._manifest() is not None

    def read(self) -> DataFrame:
        m = self._manifest()
        if m is None:
            raise FileNotFoundError(f"no table at {self.dir}")
        return self.spark.read.parquet(str(self.dir / m["current"]))

    def create_if_not_exists(self, df: DataFrame) -> DataFrame:
        """S5 ``createIndiceNx``: initialize iff absent; existing data wins."""
        if self.exists():
            return self.read()
        return self._write_version(df, "create")

    def upsert(self, updates: DataFrame) -> DataFrame:
        """S3/S8 MERGE INTO: new key → insert, existing key → replace.

        Deterministic and idempotent: upserting the same batch twice yields
        the identical table (keyed replace, no append)."""
        if not self.exists():
            return self._write_version(updates.dropDuplicates([self.key]), "upsert")
        old = self.read()
        kept = old.join(updates.select(self.key), self.key, "left_anti")
        merged = kept.unionByName(updates.dropDuplicates([self.key]), allowMissingColumns=True)
        return self._write_version(merged, "upsert")

    def delete_by_id(self, ids: list) -> DataFrame:
        """S2 ``deleteById`` (row-level DELETE), batched."""
        old = self.read()
        return self._write_version(old.filter(~F.col(self.key).isin(ids)), "delete")

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
