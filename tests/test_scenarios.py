"""Functional fixtures for the production rule scenario — the analogue of
the reference's duplicatesFixtures/notDuplicatesFixtures dataset
(/root/reference/test/functional/dataset/), transposed onto the flat
article schema of plans/scenarios.py. Every case pins one behavior of the
config surface: tier-1/tier-2 matching, OR-alternatives, array overlap,
genre dispatch + guard, and quality-flag gating.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from co_deduplicate_spark.plans.scenarios import match_records

SCHEMA = T.StructType([
    T.StructField("uid", T.StringType()),
    T.StructField("genre", T.StringType()),
    T.StructField("doi", T.StringType()),
    T.StructField("pmid", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("host_title", T.StringType()),
    T.StructField("xissn", T.StringType()),
    T.StructField("eissn", T.StringType()),
    T.StructField("isbn", T.StringType()),
    T.StructField("volume", T.StringType()),
    T.StructField("issue", T.StringType()),
    T.StructField("page", T.StringType()),
    T.StructField("year", T.StringType()),
    T.StructField("langs", T.ArrayType(T.StringType())),
    T.StructField("quality_flags", T.ArrayType(T.StringType())),
])


def rec(uid, genre="Article", doi=None, pmid=None, title=None, host_title=None,
        xissn=None, eissn=None, isbn=None, volume=None, issue=None, page=None,
        year=None, langs=(), flags=()):
    return (uid, genre, doi, pmid, title, host_title, xissn, eissn, isbn,
            volume, issue, page, year, list(langs),
            list(flags) if flags is not None else None)


FIXTURES = [
    # 1. tier-1 doi+TiC: same doi, normalizer-variant titles (accents/punct)
    rec("crossref$10.1/a", doi="10.1/A", title="Prevention of Gastric Cancer"),
    rec("hal$a", doi="10.1/a", title="Prévention, of GASTRIC cancer!"),
    # 2. tier-1 doi+pmid: same ids, different titles
    rec("crossref$10.2/b", doi="10.2/b", pmid="111", title="Title one"),
    rec("pubmed$111", doi="10.2/b", pmid="111", title="A different title"),
    # 3. tier-2 collation via host title (no doi on either side)
    rec("hal$c1", title="Kidney Injury", host_title="JAMA",
        volume="313", issue="3", page="306", year="2015"),
    rec("istex$c2", title="Kidney: Injury", host_title="jama ",
        volume="313", issue="3", page="306", year="2015"),
    # 4. tier-2 collation via the eissn OR-alternative arm + language overlap
    rec("hal$d1", title="Aspirin and Clonidine", eissn="2380-6591",
        volume="7", issue="1", page="12", year="2016", langs=["English"]),
    rec("istex$d2", title="Aspirin AND Clonidine", eissn="2380-6591",
        volume="7", issue="1", page="12", year="2016",
        langs=["english", "French"]),
    # 5. same as 4 but disjoint languages -> array overlap gate blocks
    rec("hal$e1", title="Language Gate", eissn="1111-1111",
        volume="1", issue="1", page="1", year="2000", langs=["French"]),
    rec("istex$e2", title="Language Gate", eissn="1111-1111",
        volume="1", issue="1", page="1", year="2000", langs=["English"]),
    # 6. genre guard: identical doi+title, different genres -> never matched
    rec("crossref$10.3/f", genre="Article", doi="10.3/f", title="Guarded"),
    rec("hal$f", genre="Chapitre", doi="10.3/f", title="Guarded",
        isbn="978-1"),
    # 7. Chapitre scenario: isbn+TiC
    rec("hal$g1", genre="Chapitre", isbn="978-2-2222", title="Chapter Seven"),
    rec("istex$g2", genre="Chapitre", isbn="978-2-2222", title="Chapter, SEVEN"),
    # 8. quality flags both sides: doi ignored on both -> no rule applies
    rec("a$h1", doi="10.4/h", pmid="222", title=None, flags=["doi"]),
    rec("b$h2", doi="10.4/h", pmid="222", title=None, flags=["doi"]),
    # 9. quality flag one side only: the unflagged record still queries
    rec("a$i1", doi="10.5/i", pmid="333", title=None, flags=["doi"]),
    rec("b$i2", doi="10.5/i", pmid="333", title=None),
    # 10. hard negative: same title+venue, different volume
    rec("hal$j1", title="Hard Negative", host_title="Nature",
        volume="1", issue="1", page="1", year="2020"),
    rec("istex$j2", title="Hard Negative", host_title="Nature",
        volume="2", issue="1", page="1", year="2020"),
    # 11. NULL quality_flags (the reference's absent _ignored field) must
    # behave exactly like an empty array — unflagged, rules apply
    rec("a$k1", doi="10.6/k", pmid="444", flags=None),
    rec("b$k2", doi="10.6/k", pmid="444", flags=None),
]

EXPECTED = {
    ("crossref$10.1/a", "hal$a"): ["Article : 1ID:doi+TiC"],
    ("crossref$10.2/b", "pubmed$111"): ["Article : 1ID:doi+pmid"],
    ("hal$c1", "istex$c2"): ["Article : 2Collation:TiC+Ti_Source+volume+issue+page+annee"],
    ("hal$d1", "istex$d2"): ["Article : 2Collation:TiC+xissn+volume+issue+page+annee"],
    ("hal$g1", "istex$g2"): ["Chapitre : 1ID:isbn+TiC"],
    ("a$i1", "b$i2"): ["Article : 1ID:doi+pmid"],
    ("a$k1", "b$k2"): ["Article : 1ID:doi+pmid"],
}


@pytest.fixture(scope="module")
def records(spark):
    return spark.createDataFrame(FIXTURES, SCHEMA).cache()


def test_scenario_pairs_exact(spark, records):
    got = {
        (r["src"], r["dst"]): list(r["rules"])
        for r in match_records(records).collect()
    }
    assert got == EXPECTED


def test_scenario_negative_cases(spark, records):
    got = {(r["src"], r["dst"]) for r in match_records(records).collect()}
    # language-overlap gate (P5), genre guard (P8), both-sides flags (P14),
    # collation hard negative
    for a, b in [("hal$e1", "istex$e2"), ("crossref$10.3/f", "hal$f"),
                 ("a$h1", "b$h2"), ("hal$j1", "istex$j2")]:
        assert (min(a, b), max(a, b)) not in got
