#!/usr/bin/env python
"""Embedding near-dup throughput at 50k vectors (BASELINE.md evidence).

50,000 deterministic 64-dim vectors with 1,000 planted near-duplicate
pairs (successor = vector + gaussian noise, cosine ~0.95); the banded
LSH parameters come from ``auto_lsh_params`` (corpus-size-aware), and
recall is measured against the exact cosine of the planted pairs.
Every reported pair is exact-verified by the operator, so precision is
1.0 by construction. Usage: python bench_embed_scale.py [n_vecs].
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def gen_vectors(n: int, dim: int = 64, seed: int = 17):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    for i in range(1, n, 50):  # vec i duplicates vec i-1 + noise
        vecs[i] = vecs[i - 1] + rng.normal(size=dim) * 0.3
    return vecs.astype(np.float32)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    import pandas as pd
    from pyspark.sql import functions as F

    from jschon_spark.operators.similarity import auto_lsh_params, embedding_near_duplicates
    from jschon_spark.session import get_session

    spark = get_session(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(REPO, ".bench_data", f"vecs_{n}")
    vecs = gen_vectors(n)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(vecs)})
        spark.createDataFrame(pdf).repartition(16).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    threshold = 0.9
    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    truth = set()
    for i in range(1, n, 50):
        cos = float(v64[i] @ v64[i - 1] / (norms[i] * norms[i - 1]))
        if round(cos, 6) >= threshold:
            truth.add((i - 1, i))

    bands, bits = auto_lsh_params(n, threshold)
    # warmup pass (python worker spawn)
    df.limit(1000).count()
    t0 = time.perf_counter()
    found = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            df, threshold=threshold, bands=bands, bits_per_band=bits
        ).collect()
    }
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "embedding_near_dup_throughput_50k",
                "n_vectors": n,
                "dim": 64,
                "bands": bands,
                "bits_per_band": bits,
                "sec": round(sec, 2),
                "vectors_per_sec": round(n / sec, 1),
                "true_pairs": len(truth),
                "pairs_found": len(found),
                "planted_recall": round(len(found & truth) / max(1, len(truth)), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
