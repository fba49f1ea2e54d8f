#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.md).

No real cluster exists in this sandbox, so the N -> 4N executor
criterion is evidenced by running the IDENTICAL clips-validation job on
the IDENTICAL input at two parallelism levels (local[8] vs local[32]),
each in a fresh JVM, and reporting throughput at both plus
efficiency = (throughput_32 / throughput_8) / 4   (target >= 0.8).

Usage: python bench_scaling.py [n_rows]   (default 100000; reuses the
bench.py fixture cache). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from jschon_spark.session import get_session
from jschon_spark.fixtures import baseline_snapshot
from jschon_spark.pipeline import run_validation

spark = get_session(cpus={cpus}, app_name="scaling_{cpus}")
spark.sparkContext.setLogLevel("ERROR")
clips = spark.read.parquet({data!r} + "/clips.parquet")
transcripts = spark.read.parquet({data!r} + "/transcripts.parquet")
n = clips.count()
t0 = time.perf_counter()
out = run_validation(spark, clips, transcripts=transcripts,
                     baseline=baseline_snapshot(), audio=True)
for key, df in out.items():
    if key in ("rows", "audio", "drift"):
        continue
    df.write.format("noop").mode("overwrite").save()
elapsed = time.perf_counter() - t0
print("CHILD_RESULT " + json.dumps({{"cpus": {cpus}, "n_rows": n,
      "sec": round(elapsed, 3), "clips_per_sec": round(n / elapsed, 1)}}))
"""


def run_at(cpus: int, data_dir: str, runs: int = 2) -> dict:
    """Fresh JVM per run; take the best of `runs` (cold-cache noise on
    this VM is +/-2x; max throughput is the capacity measurement)."""
    best = None
    for _ in range(runs):
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=REPO, cpus=cpus, data=data_dir)],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                r = json.loads(line[len("CHILD_RESULT "):])
                if best is None or r["clips_per_sec"] > best["clips_per_sec"]:
                    best = r
                break
        else:
            raise RuntimeError(f"child at cpus={cpus} failed:\n{proc.stderr[-3000:]}")
    return best


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    data_dir = os.path.join(REPO, ".bench_data", f"clips_{n_rows}")
    if not os.path.exists(os.path.join(data_dir, "_DONE")):
        from jschon_spark.session import get_session
        import bench

        spark = get_session(app_name="scaling_gen")
        bench.ensure_clips(spark, n_rows)
        spark.stop()

    lo = run_at(8, data_dir)
    hi = run_at(32, data_dir)
    eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "unit": "ratio",
                "pass": eff >= 0.8,
                "low": lo,
                "high": hi,
            }
        )
    )


if __name__ == "__main__":
    main()
