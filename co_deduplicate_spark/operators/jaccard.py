"""Exact token-set Jaccard similarity via inverted-index equi-join.

This is the *verification* operator: LSH (operators/lsh.py) proposes
candidate pairs, this computes their true Jaccard. It can also run
standalone as an exhaustive n-gram-Jaccard dedup at moderate scale — the
token-posting join prunes every pair with zero overlap, the Spark-native
analogue of the reference's inverted-index candidate retrieval
(/root/reference/src/deduplicateQueryBuilder.js:75-107: every ``match``
clause is a Lucene term lookup).

Scale notes:
  * postings are (token, doc) pairs — the self-join shuffles on token;
    AQE skew-join splits hot tokens. A document-frequency cap
    (``max_df``) optionally drops ubiquitous tokens (boilerplate) from
    *candidate generation only* — dropped-token counts are surfaced, never
    silent, and the final Jaccard is still computed over the full sets.
  * at true 100 TB scale this operator is only ever fed LSH candidates;
    the exhaustive mode exists for small corpora and for the oracle gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
               shingle_k: int = 1, fold: bool = True) -> DataFrame:
    """(id, tokens array<bigint>, n_tokens) — distinct token k-shingles as
    64-bit hashes (minhash.py::shingle_hashes, the same memoized
    blake2b+splitmix kernel the MinHash signatures consume).

    Implementation notes:
      * Arrow-batched pandas UDF, NOT a Catalyst higher-order-function
        expression. Measured on 200k web pages, the equivalent
        ``transform(sequence(...), i -> concat_ws(slice(...)))`` expression
        ran ~30× slower — Spark evaluates HOF lambdas interpreted (no
        codegen, no CSE across elements).
      * r6 optimization (guide §2.3 "shuffle fewer bytes" / §4.2): shingles
        are HASHED in the kernel instead of built as strings. Downstream
        postings joins shuffle 8-byte longs instead of ~25-40-byte shingle
        strings, ``array_intersect`` compares longs, and the kernel skips
        the per-shingle ``" ".join`` entirely (it reuses the vectorized
        splitmix combine + worker-global token memo). Set cardinalities —
        and therefore every jaccard_ppm — are unchanged barring a ~2⁻⁶⁴
        in-document hash collision (the same accepted trade as
        suffix_window_pairs' rolling-hash keys; the oracle gate re-proves
        value equality every round). Measured: shingle_jaccard_pairs
        3.03 → 2.80 s from this change alone (2.15 s in the end-of-round
        battery), and the kernel feeds every verification path.

    ``fold`` is accepted for API stability but the kernel always
    accent-folds (tokens_py semantics == the DuckDB oracle's
    strip_accents; folding is the identity on ASCII corpora).
    """
    import numpy as np

    from ..functions.normalize import tokens_py
    from .minhash import shingle_hashes

    _EMPTY = np.array([], dtype=np.int64)

    @F.pandas_udf("tokens array<bigint>, n_tokens int")
    def sh(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in texts:
            arrs = []
            for t in batch:
                hs = shingle_hashes(tokens_py(t), shingle_k)
                arrs.append(_EMPTY if hs is None else hs.view(np.int64))
            yield pd.DataFrame(
                {"tokens": pd.Series(arrs, dtype=object),
                 "n_tokens": pd.Series([len(a) for a in arrs], dtype="int32")}
            )

    return docs.select(
        F.col(id_col).alias("doc"), sh(F.col(text_col)).alias("_s")
    ).select("doc", F.col("_s.tokens").alias("tokens"), F.col("_s.n_tokens").alias("n_tokens"))


def jaccard_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  threshold: float = 0.8, shingle_k: int = 1, fold: bool = True,
                  max_df: int | None = None) -> DataFrame:
    """All pairs (src < dst) with token-set Jaccard >= threshold.

    ``max_df=None`` (default) is exhaustive — recall 1.0 by construction:
    every overlapping pair survives the postings join.

    ``max_df=N`` drops tokens appearing in more than N documents from
    CANDIDATE GENERATION only (the hot-token/boilerplate cost control for
    the standalone mode): candidate pairs come from the pruned postings
    join, but their Jaccard is then computed exactly over the FULL token
    sets (array_intersect). Trade-off, stated plainly: a pair whose entire
    overlap is hot tokens is missed — recall < 1.0. The number of dropped
    tokens is logged (never silent).
    """
    import logging

    # materialize the shingle table once — it feeds both join sides
    ts = token_sets(docs, id_col, text_col, shingle_k, fold=fold).localCheckpoint()
    postings = ts.select("doc", "n_tokens", F.explode("tokens").alias("token"))
    if max_df is not None:
        hot = (
            postings.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("token")
            .localCheckpoint()
        )
        n_hot = hot.count()
        logging.getLogger(__name__).info(
            "jaccard_pairs max_df=%d: dropping %d hot tokens from candidate generation",
            max_df, n_hot,
        )
        kept = postings.join(hot, "token", "left_anti")
        a, b = kept.alias("a"), kept.alias("b")
        cand = (
            a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
            .distinct()
        )
        out = (
            cand.join(ts.select(F.col("doc").alias("src"), F.col("tokens").alias("_ta"),
                                F.col("n_tokens").alias("na")), "src")
            .join(ts.select(F.col("doc").alias("dst"), F.col("tokens").alias("_tb"),
                            F.col("n_tokens").alias("nb")), "dst")
            .withColumn("inter", F.size(F.array_intersect("_ta", "_tb")))
            .withColumn("jaccard_ppm", F.expr("(inter * 1000000L) div (na + nb - inter)"))
            .withColumn("jaccard",
                        F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .filter(F.col("jaccard_ppm") >= int(threshold * 1_000_000))
            .select("src", "dst", "jaccard", "jaccard_ppm")
        )
        return out
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("a.n_tokens").alias("na"),
            F.first("b.n_tokens").alias("nb"),
        )
    )
    # jaccard_ppm is exact integer arithmetic (inter*1e6 div union) — the
    # cross-engine comparable value; `jaccard` is the human-facing double.
    union = F.col("na") + F.col("nb") - F.col("inter")
    return (
        inter.withColumn("jaccard_ppm", F.expr("(inter * 1000000L) div (na + nb - inter)"))
        .withColumn("jaccard", F.round(F.col("inter") / union, 6))
        .filter(F.col("jaccard_ppm") >= int(threshold * 1_000_000))
        .select("src", "dst", "jaccard", "jaccard_ppm")
    )


def verify_candidates(candidates: DataFrame, docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.8,
                      shingle_k: int = 3, fold: bool = True,
                      candidates_distinct: bool = False) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (src, dst).

    Joins each side to its shingle set, intersects via a postings join
    restricted to candidate pairs — never materializes full cross products.
    Returns (src, dst, jaccard) for pairs passing the threshold.

    ``candidates_distinct=True`` (r6, guide §2.4): skip the internal
    dedupe when the caller guarantees unique pairs — every blocking stage
    in this repo (candidate_pairs, the incremental probe) already ends in
    ``.distinct()``, so the old unconditional re-distinct was a second
    full exchange of the candidate set per verification.
    """
    # The candidate plan (pandas-UDF signatures + LSH self-join) is consumed
    # by two joins below; checkpoint it once so Spark doesn't re-execute
    # the whole upstream per branch. Candidates are (src, dst) pairs — tiny
    # relative to the corpus at any scale.
    cand = candidates.select("src", "dst")
    if not candidates_distinct:
        cand = cand.distinct()
    cand = cand.localCheckpoint()

    # Only candidate docs need shingling — semi-join prunes the corpus
    # first (at 100 TB this skips re-shingling the non-candidate majority).
    cand_docs = (
        cand.select(F.col("src").alias("doc"))
        .union(cand.select(F.col("dst").alias("doc")))
        .distinct()
    )
    pruned = docs.join(
        cand_docs.withColumnRenamed("doc", id_col), id_col, "left_semi"
    )
    # Shingle-set table feeds both join sides — materialize once.
    ts = token_sets(pruned, id_col, text_col, shingle_k, fold=fold).localCheckpoint()

    # Exact intersection per pair via array_intersect (hash-set, O(n+m))
    # directly on the two shingle arrays: two shuffle joins keyed on doc id,
    # no postings explode, no pair-level re-aggregation.
    out = (
        cand.join(
            ts.select(F.col("doc").alias("src"), F.col("tokens").alias("_ta"),
                      F.col("n_tokens").alias("na")),
            "src",
        )
        .join(
            ts.select(F.col("doc").alias("dst"), F.col("tokens").alias("_tb"),
                      F.col("n_tokens").alias("nb")),
            "dst",
        )
        .filter((F.col("na") + F.col("nb")) > 0)  # ANSI div-by-zero guard (two empty docs)
        .withColumn("inter", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn("jaccard_ppm", F.expr("(inter * 1000000L) div (na + nb - inter)"))
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard_ppm") >= int(threshold * 1_000_000))
        .select("src", "dst", "jaccard", "jaccard_ppm")
    )
    return out
