"""Unit coverage for the user-facing text-analysis Column API
(functions/text_stats.py) and the MinHash estimator Column.

The driver-contract queries use integer-ppm inline variants of these for
hash-exact oracle comparison; these are the float convenience forms a
library user calls directly, so they get their own golden checks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from co_deduplicate_spark.functions.normalize import tokens_expr
from co_deduplicate_spark.functions.text_stats import (
    lang_guess_expr,
    quality_score_expr,
    stopword_ratio_expr,
    token_count_expr,
    word_token_count_expr,
)

ROWS = [
    (0, "the cat sat on the mat and the dog barked at the moon tonight again"),
    (1, "le chat et le chien sont dans la maison que nous avons une belle vue"),
    (2, "x" * 5),            # one token, too short for the length gate
    (3, ""),                 # empty
    (4, "word-with-dash, punct! and 123 numbers."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string").cache()


def _collect(docs, col):
    return {r["doc_id"]: r["v"] for r in docs.select("doc_id", col.alias("v")).collect()}


def test_token_counts(docs):
    got = _collect(docs, token_count_expr(F.col("text")))
    assert got[0] == 15
    assert got[2] == 1
    assert got[3] == 0
    # word/with/dash/punct/and/123/numbers -> 7 alnum runs
    assert got[4] == 7


def test_word_token_count_adds_punctuation(docs):
    toks = _collect(docs, token_count_expr(F.col("text")))
    bpe = _collect(docs, word_token_count_expr(F.col("text")))
    # "word-with-dash, punct! and 123 numbers." -> 7 runs + 5 glyphs (-,-,,,!,.)
    assert bpe[4] == toks[4] + 5
    assert bpe[3] == 0
    assert all(bpe[i] >= toks[i] for i in bpe)


def test_stopword_ratio_and_lang_guess(docs):
    toks = tokens_expr(F.col("text"))
    en = _collect(docs, stopword_ratio_expr(toks, "en"))
    fr = _collect(docs, stopword_ratio_expr(toks, "fr"))
    assert en[0] > fr[0] and fr[1] > en[1]
    assert en[3] == 0.0  # empty text -> 0, not NULL/NaN
    guess = _collect(docs, lang_guess_expr(toks))
    assert guess[0] == "en" and guess[1] == "fr"
    assert guess[2] == "und" and guess[3] == "und"


def test_quality_score_bands(docs):
    got = _collect(docs, quality_score_expr(F.col("text")))
    assert got[0] > 0.9        # long clean English: all three gates pass
    assert got[3] == 0.0       # empty
    assert 0.0 <= got[2] < got[0]  # one-token doc fails the length gate
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_estimated_jaccard_expr_tracks_exact(spark):
    """The Column-side MinHash estimator agrees with the exact shingle
    Jaccard within the 128-perm sampling bound (mirror of the pure-python
    property in test_skew_props, exercising the JVM expression path)."""
    from co_deduplicate_spark.config import DedupConfig
    from co_deduplicate_spark.operators.minhash import (
        estimated_jaccard_expr,
        shingles_py,
        with_minhash,
    )

    cfg = DedupConfig()
    base = " ".join(f"w{i % 37}" for i in range(120))
    edited = base.replace("w3 ", "zz ", 4)
    docs = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    sigs = {r["doc"]: r["minhash"] for r in with_minhash(docs, cfg).collect()}
    est = (
        spark.createDataFrame([(sigs[0], sigs[1])], "a array<long>, b array<long>")
        .select(estimated_jaccard_expr(F.col("a"), F.col("b"), cfg).alias("est"))
        .first()["est"]
    )
    s1 = set(shingles_py(base, cfg.shingle_k))
    s2 = set(shingles_py(edited, cfg.shingle_k))
    true_j = len(s1 & s2) / len(s1 | s2)
    assert abs(est - true_j) < 0.18  # 4 sigma at 128 perms
