"""Exact token-subsequence containment (engine 3: substring duplication).

The north_star's "suffix-array pass for exact substring duplication",
re-expressed Spark-first: rather than a literal distributed suffix array,
containment of one page's full token sequence inside another is detected
with an *anchor-shingle* blocking join + exact verification:

  1. every doc emits all k-token shingles (the container side);
  2. a doc that could be contained emits only its FIRST shingle (anchor);
  3. anchor ∈ container's shingle set  ⇒  candidate (exact: if A's token
     sequence is contiguous in B, A's first k-shingle is one of B's
     k-shingles — recall 1.0 for docs with ≥ k tokens);
  4. verify with a single JVM ``contains`` over space-joined token strings
     (padded with sentinels so matches are token-aligned).

This finds *full-document* containment (the planted fixture case —
FIXTURES.md §1 "page embeds another page's full text"). Partial-overlap
substring mining (any shared window ≥ L) is the per-partition suffix-array
variant in ``suffix_window_pairs`` below.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def containment_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      min_tokens: int = 12, shingle_k: int = 3,
                      fold: bool = True) -> DataFrame:
    """(inner, outer) pairs where inner's full token sequence appears
    contiguously inside outer's and inner has >= min_tokens tokens.

    Includes mutually-contained (i.e. token-identical) pairs in both
    directions; excludes self-pairs.

    ``fold=False`` (r6, guide §4) skips the Arrow accent-fold pass for
    corpora known to be ASCII-clean (folding is the identity there) — the
    whole plan then stays in whole-stage codegen.
    """
    # Ordered token sequences (not token_sets — that dedups into set
    # semantics; containment needs the raw sequence).
    from ..functions.normalize import fold_accents_udf, tokens_expr

    folded = fold_accents_udf(F.col(text_col)) if fold else F.col(text_col)
    base = docs.select(F.col(id_col).alias("doc"), folded.alias("_t"))
    seqs = base.select(
        "doc",
        F.concat(F.lit(" "), F.concat_ws(" ", tokens_expr(F.col("_t"))), F.lit(" ")).alias("tstr"),
        tokens_expr(F.col("_t")).alias("toks"),
    ).withColumn("n", F.size("toks"))

    shingle_of = lambda start: F.concat_ws(" ", F.slice(F.col("toks"), start, shingle_k))  # noqa: E731
    # container side: (id, anchor) ONLY — never the document string. The
    # exploded relation is O(tokens) narrow rows per doc; carrying the full
    # text here would make shuffle volume O(doc_len²) per document (a
    # 10k-token page would emit 10k copies of a ~60 KB string).
    # r6 (guide §2.3): the blocking join key is xxhash64(anchor shingle) —
    # 8-byte longs shuffle/distinct instead of ~25-40-byte shingle strings.
    # Strictly result-preserving (not merely whp): a hash collision only
    # ADDS a candidate pair, and the exact `contains` verification below
    # removes every non-containment pair.
    containers = seqs.filter(F.col("n") >= shingle_k).select(
        F.col("doc").alias("outer"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - shingle_k),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(F.col("toks"), i + 1, shingle_k))
                ),
            )
        ).alias("anchor"),
    ).distinct()
    # contained side: first shingle only, ids again
    inners = seqs.filter(F.col("n") >= min_tokens).select(
        F.col("doc").alias("inner"), F.xxhash64(shingle_of(1)).alias("anchor")
    )
    cand_ids = (
        inners.join(containers, "anchor")
        .filter(F.col("inner") != F.col("outer"))
        .select("inner", "outer")
        .distinct()
    )
    # verification: re-join the two strings by id (one narrow row per
    # candidate pair) and run a single JVM contains()
    strs = seqs.select("doc", "tstr")
    return (
        cand_ids.join(strs.select(F.col("doc").alias("inner"), F.col("tstr").alias("inner_str")), "inner")
        .join(strs.select(F.col("doc").alias("outer"), F.col("tstr").alias("outer_str")), "outer")
        .filter(F.col("outer_str").contains(F.col("inner_str")))
        .select("inner", "outer")
    )


def window_keys_udf(window_tokens: int):
    """Arrow kernel: text → distinct 64-bit rolling-hash keys of every
    w-token window. Per doc: hash each token once (blake2b-8, the MinHash
    base hash), then one numpy sliding-window × powers-of-B dot product —
    O(n·w) uint64 multiplies, no per-window string building. (The previous
    Catalyst-HOF form concat'd ~w tokens per offset interpreted; measured
    18.7 s → 3 s on the sf0.1 battery.)"""
    from ..functions.normalize import tokens_py
    from .minhash import token_hash

    B = np.uint64(1099511628211)  # FNV-64 prime as polynomial base
    powers = np.empty(window_tokens, dtype=np.uint64)
    powers[-1] = np.uint64(1)
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is the hash design
        for i in range(window_tokens - 2, -1, -1):
            powers[i] = powers[i + 1] * B

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def wk(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            out = []
            for t in batch:
                toks = tokens_py(t)
                if len(toks) < window_tokens:
                    out.append([])
                    continue
                th = np.fromiter(
                    (token_hash(tok) for tok in toks), dtype=np.uint64, count=len(toks)
                )
                sw = np.lib.stride_tricks.sliding_window_view(th, window_tokens)
                with np.errstate(over="ignore"):  # intentional mod-2^64 hash
                    keys = (sw * powers[None, :]).sum(axis=1, dtype=np.uint64)
                out.append(np.unique(keys).view(np.int64).tolist())
            yield pd.Series(out, dtype=object)

    return wk


def suffix_window_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        window_tokens: int = 30, max_df: int | None = None) -> DataFrame:
    """Pairs sharing any exact window of ``window_tokens`` normalized tokens
    — the general duplicated-passage detector (the suffix-array use case).

    Blocking key = rolling polynomial hash of each w-token window (Arrow
    kernel above); pairs agreeing on any window key are emitted with the
    count of shared distinct windows (equal to the string-window count
    barring ~2⁻⁶⁴ hash collisions — the oracle joins on window strings).

    ``max_df=None`` (default) is exhaustive. ``max_df=N`` is the hot-window
    cost control for boilerplate at scale: a window shared by k docs emits
    C(k,2) join rows, so a site-wide footer on 10⁶ pages is 5·10¹¹ pairs —
    AQE splits partitions but cannot shrink that quadratic candidate set.
    With the cap, window keys whose document frequency exceeds N are
    dropped from the join entirely (the jaccard_pairs max_df pattern,
    operators/jaccard.py). Trade-off, stated plainly: a pair whose ONLY
    shared windows are ubiquitous boilerplate is missed, and surviving
    pairs' ``shared_windows`` counts exclude dropped windows. The dropped
    key count is logged — never silent.
    """
    wk = window_keys_udf(window_tokens)
    windows = (
        docs.select(F.col(id_col).alias("doc"), wk(F.col(text_col)).alias("_wkeys"))
        .select("doc", F.explode("_wkeys").alias("wkey"))
    )
    if max_df is None:
        # r6 (guide §4, the lsh.candidate_pairs guard): the self-join below
        # expands this plan per side — an un-materialized window kernel
        # would run twice over the corpus. (The max_df branch already
        # checkpoints for its three consumers.)
        windows = windows.localCheckpoint()
    if max_df is not None:
        import logging

        # three consumers below (df agg + both join sides) — materialize the
        # Arrow kernel once instead of re-running it per consumer
        windows = windows.localCheckpoint()
        # df per key aggregates map-side (count combine); the hot list is
        # tiny by definition (keys with df > cap)
        hot = (
            windows.groupBy("wkey")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("wkey")
            .localCheckpoint()
        )
        logging.getLogger(__name__).info(
            "suffix_window_pairs max_df=%d: dropping %d hot window keys "
            "from candidate generation", max_df, hot.count(),
        )
        windows = windows.join(hot, "wkey", "left_anti")
    a = windows.alias("a")
    b = windows.alias("b")
    return (
        a.join(b, "wkey")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )
