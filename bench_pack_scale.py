#!/usr/bin/env python
"""Sequence-packing throughput at corpus scale (BASELINE.md evidence).

Generates a deterministic (doc_id, token_ids) corpus JVM-side (per-doc
length 50-400 from a hash of the id, token ids hash-derived — no Python
in the generator), then times ``operators.sequences.assemble_sequences``
(the TOKENIZE→PACK job's shuffle stage: ONE bucket-keyed exchange for
the whole corpus) and verifies the packing invariants: every sequence
carries <= budget real tokens, per-bucket seq_idx is dense from 0, at
most one incomplete tail per bucket, and total real tokens equals the
input token count exactly (concat-and-chop loses nothing).

Usage: python bench_pack_scale.py [n_docs] [cpus ...]
Prints one JSON line with docs/s + tokens/s per parallelism level so
the two-cluster-size scaling story covers the packing operator too.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BUDGET = 2048
BUCKETS = 256


def gen_tokens(spark, n_docs: int):
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n_tok = (F.abs(F.xxhash64("doc_id")) % 351 + 50).cast("int")
    ids = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: (F.abs(F.xxhash64(F.col("doc_id") * 1000 + i.cast("long"))) % 65536).cast("int"),
    )
    return base.select("doc_id", ids.alias("token_ids"))


def run(n_docs: int, cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from jschon_spark.operators import sequences
    from jschon_spark.session import get_session

    spark = get_session(cpus=cpus, app_name=f"pack_scale_{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    toks = gen_tokens(spark, n_docs).localCheckpoint()
    n_tokens = toks.select(F.sum(F.size("token_ids"))).collect()[0][0]

    seqs = sequences.assemble_sequences(
        toks, budget=BUDGET, n_buckets=BUCKETS, salt="pack-scale-v1"
    )
    # the module's scale invariant: ONE exchange for the whole job
    plan = seqs._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")

    t0 = time.perf_counter()
    stats = seqs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_real").alias("real_tokens"),
        F.max("n_real").alias("max_real"),
        F.sum((~F.col("complete")).cast("long")).alias("n_incomplete"),
        (F.max("seq_idx") + 1 - F.count(F.lit(1))).alias("idx_gap"),
    ).collect()
    elapsed = time.perf_counter() - t0

    total_real = sum(r["real_tokens"] for r in stats)
    bad = {
        "over_budget_buckets": sum(1 for r in stats if r["max_real"] > BUDGET),
        "multi_tail_buckets": sum(1 for r in stats if r["n_incomplete"] > 1),
        "sparse_idx_buckets": sum(1 for r in stats if r["idx_gap"] != 0),
        "token_loss": int(n_tokens - total_real),
    }
    spark.stop()
    return {
        "cpus": cpus,
        "docs": n_docs,
        "tokens": int(n_tokens),
        "sequences": int(sum(r["n_seqs"] for r in stats)),
        "sec": round(elapsed, 2),
        "docs_per_sec": round(n_docs / elapsed),
        "tokens_per_sec": round(n_tokens / elapsed),
        "plan_exchanges": n_exchanges,
        **bad,
    }


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus_list = [int(c) for c in sys.argv[2:]] or [8]
    results = [run(n_docs, c) for c in cpus_list]
    print(json.dumps({"metric": "pack_tokens_per_sec", "runs": results}))


if __name__ == "__main__":
    main()
