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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import fold_accents_udf, tokens_expr


def token_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
               shingle_k: int = 1, fold: bool = True) -> DataFrame:
    """(id, tokens array<string>, n_tokens) with distinct token k-shingles.

    ``fold=True`` (default) accent-folds before tokenizing so JVM-side
    shingle sets agree byte-for-byte with the Python kernel used by the
    MinHash UDF (tokens_py folds always) — required for verification to
    agree with signatures on non-ASCII text. Pass ``fold=False`` only for
    corpora known to be ASCII-clean (keeps the whole plan in codegen).
    """
    # Fold in its own projection: Spark disallows Python UDFs inside
    # higher-order-function lambdas, so the Arrow fold must be a plain
    # column before the transform/filter expressions below consume it.
    if fold:
        base = docs.select(
            F.col(id_col).alias("doc"), fold_accents_udf(F.col(text_col)).alias("_t")
        )
    else:
        base = docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t"))
    toks = tokens_expr(F.col("_t"), fold=False)
    if shingle_k > 1:
        # k-token shingles, JVM-side: transform over a sequence of offsets
        toks = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_k)),
        )
    # Empty docs must yield an empty shingle set (isDeduplicable=false path,
    # /root/reference/index.js:45-49), not a {""} set that matches all empties.
    toks = F.array_distinct(F.filter(toks, lambda x: x != ""))
    return base.select(
        F.col("doc"),
        toks.alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def jaccard_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  threshold: float = 0.8, shingle_k: int = 1, fold: bool = True) -> DataFrame:
    """All pairs (src < dst) with token-set Jaccard >= threshold.

    Exhaustive (recall 1.0 by construction): every overlapping pair
    survives the postings join. Columns: src, dst, jaccard.
    """
    ts = token_sets(docs, id_col, text_col, shingle_k, fold=fold)
    postings = ts.select("doc", "n_tokens", F.explode("tokens").alias("token"))
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
                      shingle_k: int = 3, fold: bool = True) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (src, dst).

    Joins each side to its shingle set, intersects via a postings join
    restricted to candidate pairs — never materializes full cross products.
    Returns (src, dst, jaccard) for pairs passing the threshold.
    """
    ts = token_sets(docs, id_col, text_col, shingle_k, fold=fold)
    postings = ts.select("doc", F.explode("tokens").alias("token"))
    cand = candidates.select("src", "dst").distinct()

    src_post = cand.join(postings.withColumnRenamed("doc", "src"), "src")
    inter = (
        src_post.join(
            postings.select(F.col("doc").alias("dst"), "token"),
            ["dst", "token"],
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = ts.select("doc", "n_tokens")
    union = F.col("na") + F.col("nb") - F.col("inter")
    out = (
        cand.join(inter, ["src", "dst"], "left")
        .fillna({"inter": 0})
        .join(sizes.withColumnRenamed("doc", "src").withColumnRenamed("n_tokens", "na"), "src")
        .join(sizes.withColumnRenamed("doc", "dst").withColumnRenamed("n_tokens", "nb"), "dst")
        .withColumn("jaccard_ppm", F.expr("(inter * 1000000L) div (na + nb - inter)"))
        .withColumn("jaccard", F.round(F.col("inter") / union, 6))
        .filter(F.col("jaccard_ppm") >= int(threshold * 1_000_000))
        .select("src", "dst", "jaccard", "jaccard_ppm")
    )
    return out
