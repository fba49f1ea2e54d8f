"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — JVM-side ``zip_with``/``aggregate``
dot products (oracle-checkable against DuckDB's list_cosine_similarity),
plus a vectorized numpy variant (Arrow-batched, one matmul per batch)
for throughput.

Scale path: random-hyperplane LSH bucketing — signature = sign-bit
string over H hyperplanes; probe only same-bucket rows. At 100 TB the
bucket join replaces the full scan; brute force stays as the recall
oracle on samples.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from jschon_spark.fixtures import _splitmix64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Cosine top-k against a literal query vector. The per-row score is
    one codegen'd expression; top-k is a global sort of (score, id)
    pairs only — Spark's TakeOrderedAndProject keeps it a per-partition
    heap + driver merge, no full sort shuffle. Scores are rounded BEFORE
    ordering (ties then break on id) so ranking is reproducible across
    engines."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), round_digits).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def brute_force_topk_pandas(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same semantics, Arrow path: one numpy matmul per batch. Wins when
    dim × rows is large enough that JVM HOF per-element math loses to
    BLAS."""
    qv = np.asarray(list(query), dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    @pandas_udf(T.DoubleType())
    def cos_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        norms = np.linalg.norm(m, axis=1) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = (m @ qv) / norms
        return pd.Series(np.round(out, 6))

    scored = df.select(F.col(id_col), cos_udf(F.col(vec_col).cast("array<double>")).alias("cosine_sim"))
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


# -- random hyperplane LSH ---------------------------------------------------


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (counter-hash normals) —
    same planes on every executor/run without shipping state."""
    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u = (_splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    # Box-Muller for gaussian-ish normals
    u2 = (_splitmix64(idx ^ np.uint64(0xDEADBEEF)) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    g = np.sqrt(-2.0 * np.log(np.clip(u, 1e-12, 1))) * np.cos(2 * np.pi * u2)
    return g.reshape(n_planes, dim).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as a long (n_planes ≤ 63): bit i set iff
    dot(vec, plane_i) >= 0. Pure JVM expression."""
    bits = []
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(vec, pl) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    max_probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: score only rows whose LSH bucket is within
    ``max_probe_hamming`` bits of the query's bucket (multi-probe).
    The bucket filter is a cheap long-valued predicate pushed ahead of
    the expensive cosine; at scale the table would be written bucketed
    by signature so the probe prunes files."""
    dim = len(list(query))
    planes = hyperplanes(dim, n_planes)
    qv = list(query)
    q_sig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(qv, p)) >= 0:
            q_sig |= 1 << i
    vec = F.col(vec_col).cast("array<double>")
    sig = lsh_signature(vec, planes)
    probe = F.bit_count(sig.bitwiseXOR(F.lit(q_sig).cast("long"))) <= max_probe_hamming
    q = F.array(*[F.lit(float(x)) for x in qv])
    scored = (
        df.where(probe)
        .select(F.col(id_col), F.round(cosine(vec, q), 6).alias("cosine_sim"))
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucket self-join +
    exact cosine verification of same-bucket candidates only."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    dim = int(first[0]["d"]) if first else 0
    planes = hyperplanes(dim, n_planes)
    vec = F.col(vec_col).cast("array<double>")
    sigs = df.select(F.col(id_col), vec.alias("v"), lsh_signature(vec, planes).alias("sig"))
    l, r = sigs.alias("l"), sigs.alias("r")
    return (
        l.join(
            r,
            (F.col("l.sig") == F.col("r.sig")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
