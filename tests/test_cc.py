"""Connected-components correctness vs a union-find oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from co_deduplicate_spark.operators.connected_components import (
    attach_singletons,
    connected_components,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min member
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run_cc(spark, nodes, edges):
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc string")
    if edges:
        edges_df = spark.createDataFrame(list(edges), "src string, dst string")
    else:
        edges_df = spark.createDataFrame([], "src string, dst string")
    labels = attach_singletons(connected_components(edges_df), nodes_df)
    return {r["node"]: r["component"] for r in labels.collect()}


CASES = [
    # chain a-b-c (transitive closure: helpers.js:84-98 semantics)
    (["a", "b", "c", "z"], [("a", "b"), ("b", "c")]),
    # two components + singleton
    (["a", "b", "c", "d", "e"], [("a", "b"), ("c", "d")]),
    # clique with duplicate/reversed edges and self-loop noise
    (["a", "b", "c"], [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("a", "a")]),
    # long chain (beyond the reference's 5-hop cap — we close it exactly)
    ([f"n{i:02d}" for i in range(12)], [(f"n{i:02d}", f"n{i+1:02d}") for i in range(11)]),
]


@pytest.mark.parametrize("nodes,edges", CASES)
def test_cc_known_graphs(spark, nodes, edges):
    expected = _union_find(nodes, [e for e in edges if e[0] != e[1]])
    assert _run_cc(spark, nodes, edges) == expected


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_cc_random_graphs(spark, data):
    n = data.draw(st.integers(min_value=2, max_value=30))
    nodes = [f"v{i:03d}" for i in range(n)]
    n_edges = data.draw(st.integers(min_value=0, max_value=40))
    edges = [
        (
            nodes[data.draw(st.integers(0, n - 1))],
            nodes[data.draw(st.integers(0, n - 1))],
        )
        for _ in range(n_edges)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    expected = _union_find(nodes, edges)
    assert _run_cc(spark, nodes, edges) == expected
