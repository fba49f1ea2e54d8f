"""Distributed connected components for dedup-cluster canonicalization.

Near-duplicate discovery (dedup.py MinHash/SimHash, similarity.py
embedding LSH) yields candidate PAIRS; a curation pipeline then needs
the transitive clusters — "these 14 documents are all one article" — to
keep exactly one canonical member. At 100 TB the pair graph does not
fit a driver, so this is the alternating large-star / small-star
algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): O(log²
n)-round convergence, every round a pair of key-partitioned
groupBy/join stages over the edge list — no adjacency ever collected,
no per-node state on the driver. Each iteration truncates lineage with
``localCheckpoint`` so the loop's plan stays O(1) deep instead of
growing per round (the classic iterative-DataFrame trap).

There is no reference analogue (jschon validates documents; clustering
is part of the training-data-pipeline surface this engine adds), so
correctness is pinned against a driver-side union-find oracle and a
DuckDB recursive-CTE oracle in the driver contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _edge_stamp(edges: DataFrame) -> tuple:
    """Cheap distributed fingerprint of an edge set for the convergence
    test: (count, sum of 64-bit row hashes). One scalar row to the
    driver per iteration."""
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: commutative over the distinct edge set and
        # cannot overflow under ANSI arithmetic
        F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
    ).collect()[0]
    return (row.n, row.h)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}).

    Both the groupBy and the join key on ``src`` after symmetrization,
    so AQE plans one exchange for the aggregate and reuses its
    partitioning for the join."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("mn"))
    return (
        sym.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint, then connect every
    small neighbor (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    relinked = (
        oriented.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    self_links = m.select(F.col("src"), F.col("mn").alias("dst"))
    return relinked.union(self_links).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    id_col: str = "id",
    component_col: str = "component",
    max_iterations: int = 40,
) -> DataFrame:
    """Component label (the component's MINIMUM node id) for every node
    that appears in ``pairs``. Ids need only a total order (longs,
    strings, ...). Singleton nodes never appear in ``pairs`` and are the
    caller's to union in (see :func:`dedup_by_components`).

    Raises RuntimeError if the edge set is still moving after
    ``max_iterations`` alternations (the algorithm's bound is
    logarithmic, so 40 covers any realistic graph; a miss means ids
    with NaN-style incomparable values)."""
    spark = pairs.sparkSession
    # Spark 4.1's Union constraint rewrite chokes on the self-unions this
    # loop builds over localCheckpoint'd frames when the input lineage
    # carries constraints (NoSuchElementException in rewriteConstraints —
    # reproduced with an empty aggregate-derived union child). Constraint
    # propagation buys nothing on a bare edge list, so disable it for the
    # duration; every job this function triggers runs inside the scope,
    # and the result is checkpointed before the conf is restored.
    conf_key = "spark.sql.constraintPropagation.enabled"
    parts_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key, None)
    saved_parts = spark.conf.get(parts_key)
    spark.conf.set(conf_key, "false")
    try:
        edges = (
            pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        prev = _edge_stamp(edges)
        # size the loop's shuffles to the MEASURED edge count (free from
        # the stamp): a dedup pair graph is usually a sliver of the
        # corpus, and star contraction only shrinks it, so running every
        # round at the session's corpus-sized shuffle width is pure
        # scheduling overhead. Capped at the session setting — a
        # genuinely huge graph keeps the cluster's width.
        # ~250k edges per task: small enough to parallelize a few-million-
        # edge graph across the box, large enough that scheduling doesn't
        # dominate; the session cap still rules for genuinely huge graphs
        parts = max(1, min(int(saved_parts), (prev[0] // 250_000) + 1))
        spark.conf.set(parts_key, str(parts))
        if parts < edges.rdd.getNumPartitions():
            edges = edges.coalesce(parts)
        for _ in range(max_iterations):
            edges = _small_star(_large_star(edges)).localCheckpoint()
            stamp = _edge_stamp(edges)
            if stamp == prev:
                break
            prev = stamp
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} iterations"
            )
        # converged state is a star forest: (node → root) for every
        # non-root node; add the roots' self-labels so EVERY node gets a
        # row. Checkpointed: the caller executes it outside the conf scope.
        roots = edges.select(F.col("dst").alias("src"), F.col("dst"))
        return (
            edges.union(roots)
            .distinct()
            .select(F.col("src").alias(id_col), F.col("dst").alias(component_col))
            .localCheckpoint()
        )
    finally:
        spark.conf.set(parts_key, saved_parts)
        if saved is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, saved)


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Keep one canonical row (the component's min id) per near-dup
    cluster; rows in no cluster pass through. Two semi/anti joins on the
    16-byte-ish id key — ``df``'s payload columns never shuffle."""
    comp = connected_components(pairs, src=src, dst=dst, id_col=id_col)
    drop = comp.where(F.col(id_col) != F.col("component")).select(id_col)
    return df.join(drop, on=id_col, how="anti")
