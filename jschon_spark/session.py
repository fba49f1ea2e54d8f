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
    # Keep freed pages inside glibc's main arena instead of munmap'ing
    # them back to the kernel: numpy's large allocations otherwise go
    # through mmap/munmap per Arrow batch, and every reuse pays a
    # first-touch page fault. On hosts where the hypervisor services
    # faults slowly this is the difference between ~10 MB/s and ~4 GB/s
    # effective write bandwidth (measured on this VM: an identical 100 MB
    # astype dropped 8.1s -> 0.02s once pages were retained). Exported
    # before the JVM launches so local-mode Python workers inherit it;
    # spark.executorEnv carries the same pin to real executors.
    _malloc_env = {
        "MALLOC_MMAP_THRESHOLD_": "1073741824",
        "MALLOC_TRIM_THRESHOLD_": "-1",
        # route Python-worker Arrow allocations through the pinned glibc
        # arena too — jemalloc (Arrow's default pool) decays freed pages
        # back to the kernel, so every Arrow batch would re-fault
        "ARROW_DEFAULT_MEMORY_POOL": "system",
    }
    for k, v in _malloc_env.items():
        os.environ.setdefault(k, v)
    # 12g default: comfortably holds the bench/test working sets while
    # keeping the committed (Xms-floored) heap — and therefore the
    # worst-case first-touch fault exposure on this VM — small; override
    # with SPARK_GRAFT_DRIVER_MEM for bigger local runs
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        # Xms = Xmx: G1 uncommits heap regions below Xmx between jobs
        # and re-faults them on the next pass — measured 4s -> 149s on
        # an identical back-to-back 2 GB scan on this VM. An Xms floor
        # pays each page fault exactly once (lazily — deliberately NOT
        # AlwaysPreTouch, which would serialize the whole heap's faults
        # into startup). Same flag set a production spark-submit uses.
        # -Xss64m: ref-inlined schemas compile to DEEP Column trees and
        # Catalyst's ColumnNodeToExpressionConverter / analyzer recurse
        # per node — the 1m default thread stack overflows on heavily
        # ref-chained documents (fuzz ext seed 5047: 3.6 KB schema, 11
        # cross-document refs). Same flag a production spark-submit
        # would carry for this workload.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -Xss64m -XX:+UseG1GC",
        )
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
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "-1")
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
