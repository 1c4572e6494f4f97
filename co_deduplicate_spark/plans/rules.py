"""Config-driven rule engine — the reference's query builder, Spark-first.

The reference builds, per record, an ES bool query with one named clause
per applicable rule (disjunction of conjunctions, ``minimum_should_match:1``,
/root/reference/src/getBaseRequest.js:1-8; builder
src/deduplicateQueryBuilder.js:7-31). Rules are config data: ``{rule,
non_empty[], is_empty[], query.bool.must[]}`` consumed at
deduplicateQueryBuilder.js:12-15,35,70. We keep the same config shape and
semantics but execute each rule as a *batch equi-join on derived key
columns*; the union of per-rule joins with collected rule names gives the
per-pair provenance the reference gets from ES ``matched_queries``
(deduplicateQueryBuilder.js:56-67 → documentsManager.js:292-298).

Semantics implemented (and divergences, all from SURVEY.md §2.2):
  * P1 applicability gate: a rule is skipped *for a record* when any
    ``non_empty`` field is null/blank — expressed as join-side filters.
  * P8 genre guard: a ``genre`` key can be appended to every rule.
  * P9 ``is_empty``: we implement the *intended* behavior (candidate must
    lack the field). The reference's builder has two bugs that make its
    emitted must_not always empty (deduplicateQueryBuilder.js:46,140) —
    we do NOT replicate them.
  * P10 self-exclusion + canonical pair order (src < dst).
  * P11 provenance: per-pair sorted rule-name list (A5 union semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One named equality rule: pairs match when every key expression is
    equal (and non-degenerate) on both sides."""

    name: str
    keys: tuple[str, ...]                 # derived key column names (conjunction)
    non_empty: tuple[str, ...] = ()       # raw columns that must be present
    is_empty: tuple[str, ...] = ()        # raw columns that must be absent on BOTH sides


def _present(col: str) -> Column:
    c = F.col(col)
    return c.isNotNull() & (F.length(F.trim(c.cast("string"))) > 0)


def rule_pairs(docs: DataFrame, rules: list[Rule], derived: dict[str, Column],
               id_col: str = "doc_id") -> DataFrame:
    """Union of per-rule self-joins → (src, dst, rules array<string>).

    ``derived`` maps key-column name → Column expression (the analogue of
    the reference's index-time normalizers, README.md:30-45: normalize
    once, join many).
    """
    base = docs.select(F.col(id_col).alias("doc"), *[expr.alias(k) for k, expr in derived.items()],
                       *[F.col(c) for c in {c for r in rules for c in (*r.non_empty, *r.is_empty)}
                         if c not in derived])

    per_rule = []
    for rule in rules:
        side = base
        for c in rule.non_empty:
            side = side.filter(_present(c))
        for c in rule.is_empty:
            side = side.filter(~_present(c))
        # degenerate keys (null/empty) never match
        for k in rule.keys:
            side = side.filter(F.col(k).isNotNull() & (F.length(F.col(k).cast("string")) > 0))
        a = side.select(F.col("doc").alias("src"), *[F.col(k) for k in rule.keys])
        b = side.select(F.col("doc").alias("dst"), *[F.col(k) for k in rule.keys])
        pairs = (
            a.join(b, list(rule.keys))
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst", F.lit(rule.name).alias("rule"))
        )
        per_rule.append(pairs)

    edges = per_rule[0]
    for p in per_rule[1:]:
        edges = edges.unionByName(p)
    # A5: sorted distinct rule names per pair (documentsManager.js:292-298)
    return (
        edges.groupBy("src", "dst")
        .agg(F.array_sort(F.collect_set("rule")).alias("rules"))
    )
