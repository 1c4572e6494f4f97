"""Production-shaped rule scenario — the reference's corhal-config analogue.

The reference loads its rule definitions and genre scenarios from the
external `corhal-config` package (loaded at
/root/reference/src/deduplicateQueryBuilder.js:2; package.json:24). The
config itself is not vendored in the reference repo, but its *shape* is
fully determined by the builder code and the captured ES responses:

  * rule names like ``Article : 1ID:doi+TiC`` and
    ``Article : 2Collation:TiC+xissn+volume+issue+page+annee``
    (test/functional/dataset/exemples.json, business.duplicates[].rules) —
    tier-1 "ID" rules are identifier+title conjunctions, tier-2
    "Collation" rules are title+venue+collation conjunctions;
  * per-genre scenario dispatch (deduplicateQueryBuilder.js:10-18);
  * OR-alternatives inside a conjunct (xissn OR eissn — builder 109-131);
  * array-valued fields like ``language`` matched by overlap (89-107);
  * the ``_ignored`` quality gate (documentsManager.js:206-218).

This module states an equivalent scenario as data over a FLAT article
schema (nested docObject paths become columns — F4 nested access is
native in Spark, flattening here just keeps the fixture generator small):

  uid, genre, doi, pmid, title, host_title, xissn, eissn, isbn,
  volume, issue, page, year, langs array<string>,
  quality_flags array<string>

TiC ("titre complet") = the reference's index-time keyword-normalized
title (README.md:39-59): lower + accent-fold + strip non-alphanumerics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import norm_expr
from .rules import Rule, rule_pairs

GENRE_ARTICLE = "Article"
GENRE_CHAPTER = "Chapitre"


def derived_keys(fold: bool = True) -> dict[str, Column]:
    """Index-time normalizers (the reference's ES keyword normalizers)."""
    ident = lambda c: F.lower(F.trim(F.col(c)))  # noqa: E731
    return {
        "genre": F.col("genre"),
        "tic": norm_expr(F.col("title"), fold=fold),
        "ti_source": norm_expr(F.col("host_title"), fold=fold),
        "doi_n": ident("doi"),
        "pmid_n": ident("pmid"),
        "xissn_n": ident("xissn"),
        "eissn_n": ident("eissn"),
        "isbn_n": ident("isbn"),
        "volume_n": ident("volume"),
        "issue_n": ident("issue"),
        "page_n": ident("page"),
        "annee": ident("year"),
        "langs_n": F.transform(F.col("langs"), lambda x: F.lower(F.trim(x))),
        "flags": F.col("quality_flags"),
    }


def scenario_rules() -> list[Rule]:
    """The two-genre scenario: Article gets the 4 production rule shapes,
    Chapitre a book-identifier rule. Names follow the reference's
    ``<genre> : <tier><name>`` convention (deduplicateQueryBuilder.js:56-67).
    """
    collation = ("tic", "volume_n", "issue_n", "page_n", "annee")
    collation_ne = ("title", "volume", "issue", "page", "year")
    return [
        Rule("Article : 1ID:doi+TiC",
             keys=("doi_n", "tic"),
             non_empty=("doi", "title"),
             genres=(GENRE_ARTICLE,)),
        Rule("Article : 1ID:doi+pmid",
             keys=("doi_n", "pmid_n"),
             non_empty=("doi", "pmid"),
             genres=(GENRE_ARTICLE,)),
        Rule("Article : 2Collation:TiC+Ti_Source+volume+issue+page+annee",
             keys=("ti_source", *collation),
             non_empty=("host_title", *collation_ne),
             genres=(GENRE_ARTICLE,)),
        # P7 OR-alternative (xissn OR eissn) + P5 array language overlap
        Rule("Article : 2Collation:TiC+xissn+volume+issue+page+annee",
             keys=(("xissn_n", "eissn_n"), *collation),
             array_keys=("langs_n",),
             non_empty=("title", *collation_ne[1:]),
             genres=(GENRE_ARTICLE,)),
        Rule("Chapitre : 1ID:isbn+TiC",
             keys=("isbn_n", "tic"),
             non_empty=("isbn", "title"),
             genres=(GENRE_CHAPTER,)),
    ]


def match_records(records: DataFrame, id_col: str = "uid") -> DataFrame:
    """(src, dst, rules) over the production scenario — genre-dispatched,
    genre-guarded, quality-flag-gated."""
    return rule_pairs(records, scenario_rules(), derived_keys(),
                      id_col=id_col, genre_col="genre", flags_col="flags")


# ---------------------------------------------------------------------------
# web-page scenario: the rule config the PIPELINE runs when engines include
# "rules" — metadata rules over the corpus stage's (url, text, lang, source,
# session, quality_flags) schema, quality-gated by the ingest flags (P14)
# ---------------------------------------------------------------------------

def _page_derived() -> dict[str, Column]:
    from pyspark.sql import functions as F

    from ..functions.normalize import tokens_expr

    toks = tokens_expr(F.col("text"))
    return {
        "fp": F.md5(norm_expr(F.col("text"))),
        "tok12": F.md5(F.concat_ws(" ", F.slice(toks, 1, 12))),
        "lang_n": F.lower(F.trim(F.col("lang"))),
        "flags": F.col("quality_flags"),
    }


def page_rules_spec():
    """Default :class:`RuleEngineSpec` for web pages. Tier-1 = normalized
    full-text fingerprint; tier-2 = language + 12-token prefix fingerprint
    (the collation analogue). Both require usable ``text`` — records whose
    text failed ingest quality checks (quality_flags contains 'text') are
    skipped as query records, the reference's `_ignored` gate
    (deduplicateQueryBuilder.js:36-38)."""
    from .rules import RuleEngineSpec

    return RuleEngineSpec(
        name="web-pages-v1",
        rules=(
            Rule("Page : 1ID:fingerprint", keys=("fp",), non_empty=("text",)),
            Rule("Page : 2Collation:lang+prefix12", keys=("lang_n", "tok12"),
                 non_empty=("text", "lang")),
        ),
        derived=_page_derived,
        genre_col=None,
        flags_col="flags",
    )
