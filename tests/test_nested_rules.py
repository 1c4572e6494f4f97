"""Rules over genuinely nested docObject shapes — the reference's real
record structure (title struct, authors[].affiliations[].isni,
duplicatesFixtures.js:31-103). Derived keys use dotted-path access (F4,
native in Spark) and transform/flatten for arrays-of-structs; the rule
engine itself is schema-agnostic because blocking always happens on the
derived flat key columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from co_deduplicate_spark.functions.normalize import norm_expr
from co_deduplicate_spark.plans.rules import Rule, rule_pairs

SCHEMA = T.StructType([
    T.StructField("uid", T.StringType()),
    T.StructField("genre", T.StringType()),
    T.StructField("title", T.StructType([
        T.StructField("default", T.StringType()),
        T.StructField("en", T.StringType()),
    ])),
    T.StructField("identifiers", T.StructType([
        T.StructField("doi", T.StringType()),
    ])),
    T.StructField("authors", T.ArrayType(T.StructType([
        T.StructField("fullname", T.StringType()),
        T.StructField("affiliations", T.ArrayType(T.StructType([
            T.StructField("isni", T.StringType()),
        ]))),
    ]))),
])


def doc(uid, title_default=None, title_en=None, doi=None, authors=()):
    return (
        uid, "Article",
        {"default": title_default, "en": title_en},
        {"doi": doi},
        [
            {"fullname": name,
             "affiliations": [{"isni": i} for i in isnis]}
            for name, isnis in authors
        ],
    )


FIXTURES = [
    # same doi + same normalized title.default (accents/case differ)
    doc("a1", title_default="Étude des Réseaux", doi="10.1/x"),
    doc("a2", title_default="etude, DES reseaux!", doi="10.1/X"),
    # shared author ISNI deep inside authors[].affiliations[] + same title
    doc("b1", title_default="Deep Affiliations",
        authors=[("Ada L", ["0000-0001"]), ("Max P", [])]),
    doc("b2", title_default="Deep Affiliations",
        authors=[("A. Lovelace", ["0000-0002", "0000-0001"])]),
    # same title but DISJOINT isni sets -> title-only rule must not exist,
    # isni rule must not fire
    doc("c1", title_default="Disjoint Authors", authors=[("X", ["0000-0003"])]),
    doc("c2", title_default="Disjoint Authors", authors=[("Y", ["0000-0004"])]),
    # doi matches but titles differ -> conjunction blocks
    doc("d1", title_default="One Thing", doi="10.2/y"),
    doc("d2", title_default="Another Thing", doi="10.2/y"),
]


@pytest.fixture(scope="module")
def records(spark):
    return spark.createDataFrame(FIXTURES, SCHEMA).cache()


def nested_derived():
    return {
        # dotted-path into a struct (the reference's title.default);
        # fold=True: the fixture plants accent variants (Étude/etude)
        "tic": norm_expr(F.col("title.default"), fold=True),
        "doi_n": F.lower(F.trim(F.col("identifiers.doi"))),
        # arrays-of-structs: flatten authors[].affiliations[].isni into a
        # flat array<string> key matched by overlap (P5)
        "isnis": F.filter(
            F.flatten(F.transform(
                F.col("authors"),
                lambda a: F.transform(a["affiliations"], lambda f: f["isni"]),
            )),
            lambda x: x.isNotNull(),
        ),
        # raw presence columns for the P1 gates
        "title_default": F.col("title.default"),
        "doi_raw": F.col("identifiers.doi"),
    }


NESTED_RULES = [
    Rule("Article : 1ID:doi+TiC", keys=("doi_n", "tic"),
         non_empty=("doi_raw", "title_default")),
    Rule("Article : 2ID:isni+TiC", keys=("tic",), array_keys=("isnis",),
         non_empty=("title_default",)),
]


def test_nested_schema_rules(records):
    got = {(r["src"], r["dst"]): list(r["rules"])
           for r in rule_pairs(records, NESTED_RULES, nested_derived(),
                               id_col="uid").collect()}
    assert got == {
        ("a1", "a2"): ["Article : 1ID:doi+TiC"],
        ("b1", "b2"): ["Article : 2ID:isni+TiC"],
    }
