"""Exact and normalized-exact deduplication (hash-groupBy).

Reference parity: the tier-1 "ID" rules are exact equality over
normalized keyword fields (normalizers at /root/reference/README.md:41-45,
rule names like ``Article : 1ID:doi+TiC`` in
test/functional/dataset/exemples.json). In batch Spark the "inverted-index
term lookup" (deduplicateQueryBuilder.js:75-87) becomes a shuffle
hash-aggregate on the normalized key — one shuffle, map-side partial
aggregation, no index structure.

Scale note (100 TB): grouping key is a fixed-width md5 of the normalized
text, not the text itself — the shuffle moves 32-byte keys + doc ids, never
document bodies. Cluster chain strings are built from doc ids only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_stats import fingerprint_expr


def chain_expr(ids: Column) -> Column:
    """Deterministic cluster ID: ``'!' + sorted distinct ids joined by '!' + '!'``.

    Reference semantics: ``business.sourceUidChain``
    (/root/reference/src/documentsManager.js:287-289,
    helpers/deduplicates/helpers.js:150-159,
    painless/updateDuplicatesGraph.painless:144-158).
    """
    return F.concat(F.lit("!"), F.concat_ws("!", F.array_sort(F.array_distinct(ids))), F.lit("!"))


def exact_dup_clusters(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       normalized: bool = False, source_col: str | None = None) -> DataFrame:
    """Group documents by (normalized) content fingerprint.

    Returns one row per duplicate *group* (size >= 2) with the
    deterministic member chain, mirroring the reference's cluster rewrite
    outputs A3/A4 (sourceUidChain + sorted distinct sources,
    documentsManager.js:287-298).
    """
    key = fingerprint_expr(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("cluster_size"),
        chain_expr(F.collect_list(F.col(id_col).cast("string"))).alias("chain"),
    ]
    if source_col is not None:
        # A4: sorted distinct sources (documentsManager.js:288, painless 126-142)
        aggs.append(
            F.concat_ws(",", F.array_sort(F.collect_set(F.col(source_col)))).alias("sources")
        )
    return (
        docs.groupBy(key.alias("content_key"))
        .agg(*aggs)
        .filter(F.col("cluster_size") >= 2)
    )


def dedup_keep_first(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                     normalized: bool = True) -> DataFrame:
    """Keep exactly one representative (min id) per content group — the
    classic training-data exact-dedup pass. min_by avoids a window sort."""
    key = fingerprint_expr(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    keep = (
        docs.select(F.col(id_col), key.alias("content_key"))
        .groupBy("content_key")
        .agg(F.min(F.col(id_col)).alias(id_col))
    )
    return docs.join(keep.select(id_col), on=id_col, how="left_semi")
