#!/usr/bin/env python
"""Connected-components throughput at graph scale (BASELINE.md evidence).

Generates a deterministic edge list JVM-side — a union of (a) planted
CHAINS of length 10 (diameter stress: every chain needs its min label
propagated end-to-end) and (b) random intra-block edges (bulk) — then
times jschon_spark.operators.graph.connected_components and verifies
the chain components exactly. Usage:
    python bench_graph_scale.py [n_edges] [cpus ...]
Prints one JSON line with edges/s per parallelism level so the
two-cluster-size scaling story covers the graph operator too.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def gen_edges(spark, n_edges: int):
    from pyspark.sql import functions as F

    n_chain = n_edges // 5
    n_rand = n_edges - n_chain
    # chains: nodes [0, ...) in blocks of 10, edges i -> i+1 within a block
    chain = (
        spark.range(n_chain)
        .select(
            (F.col("id") + (F.col("id") / F.lit(9)).cast("long")).alias("a")
        )
        .select(F.col("a"), (F.col("a") + 1).alias("b"))
    )
    # random edges confined to 1000-node blocks ABOVE the chain id space:
    # components stay bounded, the shuffle volume does not
    lo = (n_chain // 9 + 2) * 10
    rand = (
        spark.range(n_rand)
        .select(
            (F.lit(lo) + (F.xxhash64("id") % 1000 + 1000) % 1000
             + (F.col("id") % 5000) * 1000).alias("a"),
            (F.lit(lo) + (F.xxhash64("id", F.lit(1)) % 1000 + 1000) % 1000
             + (F.col("id") % 5000) * 1000).alias("b"),
        )
    )
    return chain.union(rand)


def run(n_edges: int, cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from jschon_spark.session import get_session
    from jschon_spark.operators.graph import connected_components
    from pyspark.sql import functions as F

    spark = get_session(cpus=cpus)
    edges = gen_edges(spark, n_edges).localCheckpoint()
    n = edges.count()
    t = time.time()
    comp = connected_components(edges, src="a", dst="b")
    n_nodes = comp.count()
    elapsed = time.time() - t
    # verify the planted chains: node k of chain c must carry label 10*c
    n_chain = n_edges // 5
    bad = (
        comp.where(F.col("id") < (n_chain // 9 + 1) * 10)
        .where(F.col("component") != (F.col("id") / F.lit(10)).cast("long") * 10)
        .count()
    )
    spark.stop()
    return {
        "cpus": cpus,
        "edges": n,
        "nodes": n_nodes,
        "sec": round(elapsed, 2),
        "edges_per_sec": round(n / elapsed),
        "chain_label_errors": bad,
    }


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus_list = [int(c) for c in sys.argv[2:]] or [32]
    results = [run(n_edges, c) for c in cpus_list]
    print(json.dumps({"metric": "connected_components_edges_per_sec", "runs": results}))


if __name__ == "__main__":
    main()
