"""Normalizer parity tests.

Golden vector is the reference's own README example
(/root/reference/README.md:39-59).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.functions.normalize import (
    duckdb_norm_sql,
    duckdb_tokens_sql,
    fold_accents_py,
    norm_expr,
    normalize_py,
    tokens_expr,
    tokens_py,
)

GOLDEN = "c'est un bien joli titre que voilà !"
GOLDEN_NORM = "cestunbienjolititrequevoila"


def test_normalize_py_reference_golden():
    assert normalize_py(GOLDEN) == GOLDEN_NORM


def test_normalize_py_edges():
    assert normalize_py(None) == ""
    assert normalize_py("") == ""
    assert normalize_py("  A  B\t\nC ") == "abc"
    assert normalize_py("Éléphant—rose; №42") == "elephantrose42"


def test_tokens_py():
    assert tokens_py("C'est un TITRE, voilà!") == ["c", "est", "un", "titre", "voila"]
    assert tokens_py("") == []
    assert tokens_py(None) == []


def test_fold_matches_duckdb_strip_accents():
    samples = [GOLDEN, "Éléphant", "naïve café", "über straße", "ASCII only 123"]
    for s in samples:
        got = duckdb.sql("select strip_accents(?)", params=[s]).fetchone()[0]
        assert fold_accents_py(s) == got, s


@pytest.mark.parametrize("fold", [False, True])
def test_spark_norm_matches_python(spark, fold):
    rows = [(GOLDEN,), ("Hello, World! 42",), ("",), (None,), ("  x  y  ",)]
    if not fold:
        rows = [(r,) for (r,) in rows if r is None or r.isascii()]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        F.col("text"), norm_expr(F.col("text"), fold=fold).alias("n"), tokens_expr(F.col("text"), fold=fold).alias("t")
    ).collect()
    for r in out:
        if r["text"] is None:
            continue
        assert r["n"] == normalize_py(r["text"]), r["text"]
        assert r["t"] == tokens_py(r["text"]), r["text"]


def test_duckdb_norm_fragment_matches_python():
    samples = [GOLDEN, "Hello, World! 42", "", "  x  y  ", "Éléphant—rose; №42"]
    for s in samples:
        n = duckdb.sql(f"select {duckdb_norm_sql('?')}", params=[s]).fetchone()[0]
        t = duckdb.sql(f"select {duckdb_tokens_sql('?')}", params=[s]).fetchone()[0]
        assert n == normalize_py(s), s
        assert t == tokens_py(s), s
