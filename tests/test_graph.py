"""Connected components (operators/graph.py): alternating large-star /
small-star over similarity edges.

Correctness model: an in-test union-find (10 lines, no dependency) —
every Spark result is compared against it, so the tests cover the
ALGORITHM (transitivity, chains, star collapse), not just examples.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datacanary_spark.operators.graph import (
    components_of_pairs,
    connected_components,
)


def _union_find_components(edges):
    """Reference: min reachable id per node, plain union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    out = {}
    for members in comps.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {r.id: r.component
            for r in connected_components(df, **kw).collect()}


def test_chain_is_one_component(spark):
    # 1-2-3-4 is a path: 3 and 4 are never directly paired with 1,
    # only the transitive closure puts them in component 1.
    edges = [(2, 1), (2, 3), (3, 4)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_and_junk_edges(spark):
    # self-loops and null endpoints carry no connectivity
    edges = [(2, 1), (10, 11), (7, 7), (None, 5)]
    assert _run(spark, edges) == {1: 1, 2: 1, 10: 10, 11: 10}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = connected_components(df)
    assert out.columns == ["id", "component"]
    assert out.count() == 0


def test_string_ids(spark):
    df = spark.createDataFrame([("b", "a"), ("b", "c")],
                               "id_a string, id_b string")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}
    assert dict(connected_components(df).dtypes) == {
        "id": "string", "component": "string"}


def test_long_path_converges_logarithmically(spark):
    # a 64-node path has diameter 63; label propagation would need ~63
    # rounds. The alternating algorithm must finish far under that —
    # max_iterations=12 fails if convergence were diameter-bound.
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges, max_iterations=12)
    assert got == {i: 0 for i in range(64)}


@pytest.mark.parametrize("seed", [7, 42])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    edges = [(rng.randint(0, 300), rng.randint(0, 300)) for _ in range(220)]
    assert _run(spark, edges) == _union_find_components(edges)


def test_partition_invariance(spark):
    rng = random.Random(3)
    edges = [(rng.randint(0, 200), rng.randint(0, 200)) for _ in range(150)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    a = {(r.id, r.component)
         for r in connected_components(df.repartition(1)).collect()}
    b = {(r.id, r.component)
         for r in connected_components(df.repartition(13, "id_b")).collect()}
    assert a == b == set(_union_find_components(edges).items())


def test_components_of_pairs_keeps_singletons(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 8)],
                                 "doc_id bigint, text string")
    pairs = spark.createDataFrame([(2, 1), (2, 3)], "id_a bigint, id_b bigint")
    out = components_of_pairs(docs, pairs)
    got = {r.doc_id: r.component for r in out.collect()}
    # docs 4..7 have no edges: each is its own (singleton) component
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7}
    # survivor rule: one doc per cluster, every singleton kept
    surv = out.where(F.col("component") == F.col("doc_id"))
    assert sorted(r.doc_id for r in surv.collect()) == [1, 4, 5, 6, 7]
    # and the text column rides along untouched
    assert set(out.columns) == {"doc_id", "text", "component"}


def test_cluster_dedup_more_aggressive_than_pairwise(spark):
    # star 5-1, 5-2: pairwise min-id survival keeps {1, 2} (1 and 2
    # are not directly similar); cluster-level keeps only {1}. The
    # difference is the documented semantic of components_of_pairs.
    docs = spark.createDataFrame([(i, "x") for i in (1, 2, 5)],
                                 "doc_id bigint, text string")
    pairs = spark.createDataFrame([(5, 1), (5, 2)], "id_a bigint, id_b bigint")
    out = components_of_pairs(docs, pairs)
    surv = sorted(r.doc_id for r in
                  out.where(F.col("component") == F.col("doc_id")).collect())
    assert surv == [1]


def test_nonconvergence_backstop_raises(spark):
    # max_iterations=0 exhausts the loop without a convergence check
    edges = spark.createDataFrame([(2, 1)], "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=0)


def test_cluster_survivors_rank_and_ties(spark):
    from datacanary_spark.operators.graph import cluster_survivors

    # cluster {1,2,3} via 2-1, 2-3; cluster {5,6}; 9 is a singleton.
    # Ranks: doc 3 longest in its cluster -> wins over min-id 1;
    # docs 5 and 6 tie on rank -> smaller id 5 wins; singleton 9 kept.
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "a"), (3, "aaaa"), (5, "bb"), (6, "bb"),
         (9, "c")], "doc_id bigint, text string")
    pairs = spark.createDataFrame([(2, 1), (2, 3), (5, 6)],
                                  "id_a bigint, id_b bigint")
    out = cluster_survivors(docs, pairs, rank_col=F.length("text"))
    got = {r.doc_id: (r.component, r.is_survivor) for r in out.collect()}
    assert got == {1: (1, False), 2: (1, False), 3: (1, True),
                   5: (5, True), 6: (5, False), 9: (9, True)}
    # original columns ride along
    assert set(out.columns) == {"doc_id", "text", "component",
                                "is_survivor"}


def test_cluster_survivors_string_ids(spark):
    # url-keyed corpora (the curate pipeline) — ids are strings; the
    # min(struct(-rank, id)) pick must order them lexicographically
    from datacanary_spark.operators.graph import cluster_survivors

    docs = spark.createDataFrame(
        [("a/1", "xx"), ("a/2", "xxxx"), ("b/9", "y")],
        "url string, text string")
    pairs = spark.createDataFrame([("a/1", "a/2")],
                                  "id_a string, id_b string")
    out = cluster_survivors(docs, pairs, rank_col=F.length("text"),
                            id_col="url")
    got = {r.url: r.is_survivor for r in out.collect()}
    assert got == {"a/1": False, "a/2": True, "b/9": True}
