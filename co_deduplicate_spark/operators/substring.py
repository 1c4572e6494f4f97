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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def containment_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      min_tokens: int = 12, shingle_k: int = 3) -> DataFrame:
    """(inner, outer) pairs where inner's full token sequence appears
    contiguously inside outer's and inner has >= min_tokens tokens.

    Includes mutually-contained (i.e. token-identical) pairs in both
    directions; excludes self-pairs.
    """
    # Ordered token sequences (not token_sets — that dedups into set
    # semantics; containment needs the raw sequence).
    from ..functions.normalize import fold_accents_udf, tokens_expr

    base = docs.select(F.col(id_col).alias("doc"), fold_accents_udf(F.col(text_col)).alias("_t"))
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
    containers = seqs.filter(F.col("n") >= shingle_k).select(
        F.col("doc").alias("outer"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - shingle_k),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, shingle_k)),
            )
        ).alias("anchor"),
    ).distinct()
    # contained side: first shingle only, ids again
    inners = seqs.filter(F.col("n") >= min_tokens).select(
        F.col("doc").alias("inner"), shingle_of(1).alias("anchor")
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


def suffix_window_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        window_tokens: int = 30) -> DataFrame:
    """Pairs sharing any exact window of ``window_tokens`` normalized tokens
    — the general duplicated-passage detector (the suffix-array use case).

    Blocking key = hash of each w-token window (one per offset); pairs
    agreeing on any window key are emitted with the count of shared
    windows. At scale the window table is the size of the corpus × 1
    (rolling), and hot windows (boilerplate) are handled by the same salt/
    AQE machinery as LSH bands.
    """
    from ..functions.normalize import fold_accents_udf, tokens_expr

    base = docs.select(F.col(id_col).alias("doc"), fold_accents_udf(F.col(text_col)).alias("_t"))
    seqs = base.select("doc", tokens_expr(F.col("_t")).alias("toks")).withColumn(
        "n", F.size("toks")
    )
    windows = seqs.filter(F.col("n") >= window_tokens).select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - window_tokens),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, window_tokens))),
            )
        ).alias("wkey"),
    ).distinct()
    a = windows.alias("a")
    b = windows.alias("b")
    return (
        a.join(b, "wkey")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )
