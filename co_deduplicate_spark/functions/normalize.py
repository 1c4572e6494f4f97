"""Text normalization kernel (reference parity: F1).

The reference normalizes match fields at Elasticsearch index time with a
keyword normalizer: char filters ``whitespace_remove`` + ``punctuation_remove``,
token filters ``lowercase`` + ``my_asciifolding`` (ICU)
(/root/reference/README.md:41-45; worked example at README.md:39-59:
``"c'est un bien joli titre que voilà !"`` → ``"cestunbienjolititrequevoila"``).

We implement the same transform three ways, all provably equal on the
covered character classes (tests/test_normalize.py):

* :func:`normalize_py` — pure-Python reference implementation (unit-test
  golden, also used inside the pandas-UDF signature kernels so shingling
  sees exactly the same bytes).
* :func:`norm_expr` — JVM-side Column expression (whole-stage codegen,
  zero Python in the hot path) for ASCII-safe corpora; accent folding is
  the one step Spark lacks natively.
* :func:`fold_accents_udf` — Arrow-vectorized accent folder (NFD → drop
  combining marks, matching DuckDB/utf8proc ``strip_accents``), composed
  with :func:`norm_expr` when the corpus is not ASCII-clean.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Everything that is not a unicode letter or digit is "punctuation or
# whitespace" for the purposes of the reference normalizer.
_NON_ALNUM_RE = re.compile(r"[^0-9a-z]+")
_NON_ALNUM_JAVA = "[^0-9a-z]+"  # same class, Java regex syntax (post-fold, post-lower)


def fold_accents_py(s: str) -> str:
    """NFD-decompose and drop combining marks — ICU-asciifolding-lite.

    Matches DuckDB's ``strip_accents`` (utf8proc) on Latin scripts, which is
    what the oracle uses. ASCII input is returned untouched without the
    per-character pass (folding is the identity there; web corpora are
    majority-ASCII, so this fast path carries the signature kernels).
    """
    if s.isascii():
        return s
    return "".join(c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn")


def normalize_py(s: str | None) -> str:
    """lowercase → accent-fold → strip all non-alphanumerics.

    Reference golden: README.md:39-59.
    """
    if s is None:
        return ""
    return _NON_ALNUM_RE.sub("", fold_accents_py(s.lower()))


def tokens_py(s: str | None) -> list[str]:
    """Whitespace-ish tokenization over the *token-normalized* text: lower,
    accent-fold, every non-alphanumeric run becomes a separator."""
    if not s:
        return []
    return [t for t in _NON_ALNUM_RE.split(fold_accents_py(s.lower())) if t]


@F.pandas_udf(T.StringType())
def fold_accents_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - exercised via Spark
    return s.map(lambda x: fold_accents_py(x) if x is not None else None)


def norm_expr(col: Column, fold: bool = False) -> Column:
    """JVM-side normalizer: ``lower`` then strip non-alphanumeric runs.

    With ``fold=True`` an Arrow-batched accent fold runs first (the only
    Python step; skip it for ASCII corpora so the whole expression stays
    inside whole-stage codegen).
    """
    c = F.lower(col)
    if fold:
        c = F.lower(fold_accents_udf(c))
    return F.regexp_replace(c, _NON_ALNUM_JAVA, "")


def tokens_expr(col: Column, fold: bool = False) -> Column:
    """Array-of-tokens Column matching :func:`tokens_py`."""
    c = F.lower(col)
    if fold:
        c = F.lower(fold_accents_udf(c))
    spaced = F.regexp_replace(c, _NON_ALNUM_JAVA, " ")
    return F.filter(F.split(F.trim(spaced), " "), lambda x: x != "")


# DuckDB fragments for the oracle side — kept adjacent to the Spark
# expressions they must mirror so drift is caught in review.
def duckdb_norm_sql(col_sql: str) -> str:
    return f"regexp_replace(strip_accents(lower({col_sql})), '[^0-9a-z]+', '', 'g')"


def duckdb_tokens_sql(col_sql: str) -> str:
    return (
        "list_filter(string_split(trim(regexp_replace(strip_accents(lower("
        f"{col_sql})), '[^0-9a-z]+', ' ', 'g')), ' '), t -> t != '')"
    )
