"""Hot-window cost control for the duplicated-passage detector
(operators/substring.py::suffix_window_pairs max_df).

The 100 TB failure mode: a site-wide footer shared by k pages makes its
window key emit C(k,2) join rows — quadratic, and AQE can only split
partitions, not shrink the candidate set. With ``max_df`` the ubiquitous
window keys leave candidate generation entirely; genuinely rare shared
passages are unaffected.
"""

from __future__ import annotations

import pytest

from co_deduplicate_spark.operators.substring import suffix_window_pairs

FOOTER = " ".join(f"footer{i}" for i in range(30))          # one 30-token window
PASSAGE = " ".join(f"passage{i}" for i in range(35))        # 6 rare shared windows
N_BOILER = 40


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"unique{i}w{j}" for j in range(50)) + " " + FOOTER)
        for i in range(N_BOILER)
    ]
    rows.append((100, "intro one two three " + PASSAGE + " outro alpha beta"))
    rows.append((101, "different lead tokens " + PASSAGE + " other tail here"))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_uncapped_is_exhaustive(docs):
    got = {(r.src, r.dst): r.shared_windows for r in suffix_window_pairs(docs).collect()}
    # every boilerplate pair shares exactly the one footer window
    assert sum(1 for (s, d) in got if s < N_BOILER and d < N_BOILER) == \
        N_BOILER * (N_BOILER - 1) // 2
    assert all(n == 1 for (s, d), n in got.items() if s < N_BOILER and d < N_BOILER)
    assert got[(100, 101)] == 6  # 35-token passage → 6 thirty-token windows


def test_max_df_drops_hot_windows_only(docs):
    got = {(r.src, r.dst): r.shared_windows
           for r in suffix_window_pairs(docs, max_df=10).collect()}
    # the quadratic boilerplate candidate set is gone...
    assert not any(s < N_BOILER and d < N_BOILER for (s, d) in got)
    # ...and the rare shared passage is untouched (df=2 <= cap)
    assert got == {(100, 101): 6}


def test_max_df_bounds_candidate_rows(docs):
    """The cap must bound the JOIN input, not just the output: no window
    key with df > cap may reach the self-join."""
    capped = suffix_window_pairs(docs, max_df=10)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
