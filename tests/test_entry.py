"""Driver-contract check: every queries() entry matches its oracle_sql()
on DuckDB, value-for-value (order-insensitive), at sf0.001.

This replicates the external driver's comparison locally so oracle drift
is caught before a round is graded.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype).startswith("Int"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


QUERY_NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, oracle_con, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"cluster_id", "chain", "sources", "size"} <= set(df.columns)


def test_every_query_has_oracle_or_reason():
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    # non-SQL-expressible ops are allowed to omit the oracle; list them
    # explicitly so additions are deliberate
    allowed_rows_only: set[str] = set()
    assert missing <= allowed_rows_only, f"queries missing oracles: {missing}"


def test_pyfiles_zip_is_importable(tmp_path):
    """package.py builds a zip whose package is importable via zipimport —
    the spark-submit --py-files contract."""
    import subprocess
    import sys

    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    out = tmp_path / "co_deduplicate_spark.zip"
    subprocess.run(
        [sys.executable, "package.py", "--out", str(out)],
        check=True, cwd=str(repo_root), capture_output=True,
    )
    probe = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {str(out)!r}); "
         "import co_deduplicate_spark.config as c; "
         "print(c.DedupConfig().num_perms)"],
        check=True, capture_output=True, text=True,
        cwd=str(tmp_path),  # away from the repo so the zip is what resolves
    )
    assert probe.stdout.strip() == "128"
