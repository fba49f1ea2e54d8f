"""connected_components / dedup_by_components vs a union-find oracle.

The operator has no reference analogue (clustering is part of the
training-data surface, not jschon), so correctness is pinned against a
driver-side union-find over the same edge lists — including the
adversarial shapes: long chains (maximum rounds for the alternating
algorithm), stars, disjoint cliques, duplicate/reversed edges,
self-loops, and string ids.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from jschon_spark.operators.graph import connected_components, dedup_by_components


def _union_find(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, edges, schema="a long, b long"):
    df = spark.createDataFrame(edges, schema)
    got = {
        r.id: r.component
        for r in connected_components(df).collect()
    }
    want = _union_find([(a, b) for a, b in edges if a != b])
    assert got == want, (got, want)


def test_long_chain(spark):
    # a 120-node path is the diameter-heavy worst case for label
    # propagation; alternating star rounds must still converge fast
    _check(spark, [(i, i + 1) for i in range(120)])


def test_two_chains_and_a_star(spark):
    edges = [(i, i + 1) for i in range(0, 30)]
    edges += [(i, i + 1) for i in range(100, 140)]
    edges += [(500, x) for x in range(501, 540)]
    _check(spark, edges)


def test_duplicate_reversed_and_self_edges(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 3), (3, 2), (7, 8)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(4242)
    for trial in range(3):
        n = 400
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(250 + 150 * trial)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        _check(spark, edges)


def test_string_ids(spark):
    edges = [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y")]
    df = spark.createDataFrame(edges, "a string, b string")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {
        "doc-a": "doc-a",
        "doc-b": "doc-a",
        "doc-c": "doc-a",
        "x": "x",
        "y": "x",
    }


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_dedup_by_components_keeps_cluster_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters {0,1,2} and {5,6} via a chain; 3,4,7,8,9 untouched
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "a long, b long")
    kept = sorted(
        r.doc_id for r in dedup_by_components(docs, pairs).select("doc_id").collect()
    )
    assert kept == [0, 3, 4, 5, 7, 8, 9]


def test_component_labels_are_component_minimum(spark):
    # labels must be the MIN id, not an arbitrary representative —
    # canonical-doc selection depends on it
    edges = [(9, 4), (4, 7), (7, 2), (2, 11)]
    df = spark.createDataFrame(edges, "a long, b long")
    comps = {r.component for r in connected_components(df).collect()}
    assert comps == {2}


def test_composes_with_embedding_near_dups(spark):
    """End-to-end composition: embedding LSH near-dup PAIRS →
    connected components → canonical selection. Three planted cliques
    of near-identical vectors (tiny jitter on a shared base) must each
    collapse to their min id; the decoys survive."""
    import math
    import random

    from jschon_spark.operators.similarity import embedding_near_duplicates

    rng = random.Random(7)
    dim = 16

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = []
    for clique, base_id in enumerate([0, 100, 200]):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        for k in range(4):  # ids base_id..base_id+3 are near-dups
            rows.append(
                (base_id + k, unit([x + rng.gauss(0, 0.004) for x in base]))
            )
    for decoy in range(300, 320):
        rows.append((decoy, unit([rng.gauss(0, 1) for _ in range(dim)])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    pairs = embedding_near_duplicates(df, threshold=0.98, n_rows=len(rows))
    kept = sorted(
        r.vec_id
        for r in dedup_by_components(
            df, pairs, id_col="vec_id", src="id_a", dst="id_b"
        ).collect()
    )
    assert kept == [0, 100, 200] + list(range(300, 320)), kept


def test_union_child_with_aggregate_lineage(spark):
    """Regression: Spark 4.1's Union constraint rewrite throws
    NoSuchElementException when a union child carries aggregate/filter
    constraints into the star-contraction self-unions (hit by the
    doc_dup_clusters driver query whose chain-edge side is an empty
    aggregate at sf0.01). connected_components scopes
    spark.sql.constraintPropagation.enabled=false around its jobs —
    and must RESTORE the conf afterward."""
    before = spark.conf.get("spark.sql.constraintPropagation.enabled")
    base = spark.range(0, 100).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    empty = base.groupBy("a").agg(F.min("b").alias("b")).where("a < -1")
    nonempty = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = {
        r.id: r.component
        for r in connected_components(empty.union(nonempty)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}
    assert spark.conf.get("spark.sql.constraintPropagation.enabled") == before


def test_distributed_shape(spark):
    """The plan must stay distributed: no driver-side adjacency. We
    assert the result is computed from DataFrame ops by checking the
    output schema/partitioning survives a wide input."""
    pairs = spark.range(0, 2000).select(
        F.col("id").alias("a"), ((F.col("id") + 1) % 2000).alias("b")
    )
    out = connected_components(pairs)
    # one giant cycle → a single component labeled 0
    assert out.where(F.col("component") != 0).count() == 0
    assert out.count() == 2000
