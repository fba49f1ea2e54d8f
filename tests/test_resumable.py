"""run_resumable: crash-and-rerun resume with partition pruning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jschon_spark import fixtures as fx
from jschon_spark import manifest as mf
from jschon_spark.pipeline import run_resumable

N = 2000


@pytest.fixture(scope="module")
def clips_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clips") / "clips.parquet")
    pdf = fx.gen_clips_batch(np.arange(N), audio=False)
    (
        spark.createDataFrame(pdf, schema=fx.CLIPS_DDL)
        .write.partitionBy("part_id")
        .mode("overwrite")
        .parquet(d)
    )
    return d


def test_resume_processes_only_pending(spark, clips_path, tmp_path):
    manifest_path = str(tmp_path / "manifest")

    # simulate a prior run that completed partitions 0-7
    clips = spark.read.parquet(clips_path)
    from jschon_spark.output import flag_summary
    from jschon_spark.pipeline import validate_clips_rows

    done = flag_summary(validate_clips_rows(clips.where("part_id < 8")), "part_id")
    mf.append_results(spark, manifest_path, done, run_id="r0", source_path=clips_path)

    res = run_resumable(spark, clips_path, manifest_path)
    assert res["processed_partitions"] == list(range(8, 16))

    # now complete: a rerun is a no-op
    res2 = run_resumable(spark, clips_path, manifest_path)
    assert res2["processed_partitions"] == []

    # manifest has one row per partition, full coverage, exact counts
    m = mf.read_manifest(spark, manifest_path).toPandas()
    assert sorted(m["part_id"].tolist()) == list(range(16))
    assert int(m["n_rows"].sum()) == N


def test_pending_scan_prunes_partitions(spark, clips_path, tmp_path):
    """The resume scan must read ONLY pending partition directories —
    PartitionFilters on part_id in the physical plan."""
    clips = spark.read.parquet(clips_path)
    subset = clips.where(F.col("part_id").isin([8, 9]))
    plan = subset._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruned scan reads 2/16 of the files
    assert subset.select("part_id").distinct().count() == 2
