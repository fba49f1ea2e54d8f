"""SparkSession factory tuned for the validation engine.

Local-mode testing uses ``local[N]``; the same configs are the ones we
would pass to ``spark-submit`` on a real cluster (AQE, Arrow, shuffle
partitioning). Keep every knob here so bench runs at two parallelism
levels are reproducible.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    cpus: int | None = None,
    app_name: str = "jschon_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``shuffle_partitions`` defaults to 2×cores locally — on a real
    cluster this would be sized so each post-shuffle partition is
    ~128-256MB (AQE coalescing handles the rest).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # audio rows carry binary payloads — keep Arrow batches modest so a
        # batch of clips fits comfortably in a python worker
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        # one BLAS/OMP thread per Python worker: N workers each spawning
        # a full BLAS thread pool (spinning barriers) collapses aggregate
        # throughput as N grows — measured 12s -> 85s on the audio stage
        # going local[8] -> local[32] before this pin
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.executorEnv.NUMEXPR_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
