"""Physical-plan hygiene gates (SURVEY.md §4): these assert properties
of the OPTIMIZED/PHYSICAL plan, not results — regressions here are
invisible at test scale but fatal at 100 TB.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jschon_spark import fixtures as fx
from jschon_spark.pipeline import validate_clips_rows

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def clips_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hyg") / "clips.parquet")
    pdf = fx.gen_clips_batch(np.arange(500), audio=True)
    spark.createDataFrame(pdf, schema=fx.CLIPS_DDL).write.partitionBy("part_id").mode(
        "overwrite"
    ).parquet(d)
    return d


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_metadata_validation_never_reads_audio_bytes(spark, clips_path):
    """The per-row keyword stage must column-prune the audio payload out
    of its parquet scan — reading `bytes` for a metadata check would be
    a 1000x I/O regression at the design scale."""
    clips = spark.read.parquet(clips_path)
    v = validate_clips_rows(clips).select("clip_id", "valid")
    plan = _plan(v)
    scan = plan[plan.index("FileScan"):]
    read_schema = scan[scan.index("ReadSchema"): scan.index("ReadSchema") + 400]
    assert "bytes" not in read_schema, read_schema


def test_validation_predicates_are_codegen(spark, clips_path):
    """Compiled keyword predicates must sit inside WholeStageCodegen
    (JVM, vectorized) — no Python evaluation in the hot path."""
    clips = spark.read.parquet(clips_path)
    v = validate_clips_rows(clips)
    plan = _plan(v)
    # `*(n)` is the WholeStageCodegen marker in the compact plan string
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_filter_pushdown_reaches_scan(spark):
    """A keyword-derived filter over a scanned column must appear in
    PushedFilters on the parquet scan."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    q = orders.where(F.col("o_totalprice") >= 1000).select("o_orderkey")
    plan = _plan(q)
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(o_totalprice" in plan


def test_referential_check_broadcasts_small_dim(spark):
    """Cardinality-driven join strategy: a small dim side must be
    broadcast (no shuffle of the fact table)."""
    from jschon_spark.operators.table_checks import referential_check

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    out = referential_check(orders, cust, "o_custkey", "c_custkey")
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_flag_summary_partial_aggregation(spark, clips_path):
    """The per-partition flag rollup must partial-aggregate map-side
    (HashAggregate before AND after the exchange) so the shuffle carries
    one partial row per task, not raw rows."""
    from jschon_spark.output import flag_summary

    clips = spark.read.parquet(clips_path)
    plan = _plan(flag_summary(validate_clips_rows(clips), "part_id"))
    assert plan.count("HashAggregate") >= 2


def test_embedding_band_join_plan_shape(spark):
    """The banded LSH candidate pipeline must appear ONCE in the plan
    (one band self-join; the verify joins reuse the candidate pairs
    rather than re-deriving them), the signature UDF must run exactly
    once per join side (posexplode_outer avoids the implicit
    size()>0 filter that double-evaluates it), and nothing may
    degenerate to a cartesian product."""
    import numpy as np
    import pandas as pd

    from jschon_spark.operators.similarity import embedding_near_duplicates

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({"vec_id": range(50), "embedding": list(vecs)}))
    out = embedding_near_duplicates(df, threshold=0.9)
    plan = _plan(out)
    assert plan.count("ShuffledHashJoin") == 1, plan[:3000]
    assert plan.count("ArrowEvalPython") == 2, plan[:3000]
    assert "CartesianProduct" not in plan


def test_contains_subschema_compiled_once(spark):
    """VERDICT r2 #4: contains/minContains/maxContains must share ONE
    compiled count expression instead of each re-deriving it (the
    duplication cost is Python-side plan construction — it compounds on
    big schemas). Count apply() calls on the contains subschema."""
    from pyspark.sql import types as T

    from jschon_spark.compiler import core as core_mod
    from jschon_spark.compiler import compile_schema

    sub = {"const": 987654321}
    schema = {"contains": sub, "minContains": 2, "maxContains": 3}
    calls = {"n": 0}
    orig = core_mod.Compiler.apply

    def counting(self, sch, ctx):
        if sch == sub:
            calls["n"] += 1
        return orig(self, sch, ctx)

    core_mod.Compiler.apply = counting
    try:
        compile_schema(schema).columns(T.ArrayType(T.LongType()), F.col("xs"))
    finally:
        core_mod.Compiler.apply = orig
    assert calls["n"] == 1, calls["n"]


def test_map_entries_subschema_compiled_once(spark):
    """Sibling finding in r2 #4: the MapType patternProperties path
    compiled each entry's subschema twice (once for .valid, once for
    .viols inside the same lambda)."""
    from pyspark.sql import types as T

    from jschon_spark.compiler import core as core_mod
    from jschon_spark.compiler import compile_schema

    sub = {"const": 123456789}
    schema = {"patternProperties": {"^x": sub}}
    calls = {"n": 0}
    orig = core_mod.Compiler.apply

    def counting(self, sch, ctx):
        if sch == sub:
            calls["n"] += 1
        return orig(self, sch, ctx)

    core_mod.Compiler.apply = counting
    try:
        compile_schema(schema).columns(T.MapType(T.StringType(), T.LongType()), F.col("m"))
    finally:
        core_mod.Compiler.apply = orig
    assert calls["n"] == 1, calls["n"]


def test_feature_stage_projects_only_needed_columns(spark, clips_path):
    """The DSP feature stage passes non-bytes columns through, so the
    caller's pre-projection must reach the parquet scan: selecting
    3 metadata columns + bytes before with_audio_features must NOT
    read transcript (large string) from disk."""
    from jschon_spark.audio.features import with_audio_features

    clips = spark.read.parquet(clips_path).select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec"
    )
    feats = with_audio_features(clips)
    plan = _plan(feats)
    scan = plan[plan.index("FileScan"):]
    read_schema = scan[scan.index("ReadSchema"): scan.index("ReadSchema") + 400]
    assert "transcript" not in read_schema, read_schema
    assert "bytes" in read_schema  # the payload itself IS read here


def test_feature_stage_is_map_only(spark, clips_path):
    """No shuffle anywhere in the feature-extraction plan — the stage
    must stay embarrassingly parallel at the design scale."""
    from jschon_spark.audio.features import with_audio_features

    clips = spark.read.parquet(clips_path).select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec"
    )
    plan = _plan(with_audio_features(clips))
    assert "Exchange" not in plan, plan


def test_temperature_sample_filter_is_map_side(spark):
    """After the one counting pass, the applied sample is a pure scan
    filter: no Exchange, no Python eval — the md5 gate is codegen'd."""
    from jschon_spark.operators.sampling import temperature_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(300)], "doc_id long, lang string"
    )
    out = temperature_sample(df, "lang", "doc_id", alpha=0.5, target_frac=0.5)
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_cer_is_jvm_side(spark):
    """CER = levenshtein over normalized Columns: stays inside codegen,
    never enters Python."""
    from jschon_spark.operators.transcripts import cer

    df = spark.createDataFrame(
        [("a", "x y", "x z")], "id string, hyp string, ref string"
    )
    plan = _plan(df.select(cer(F.col("hyp"), F.col("ref")).alias("c")))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "*(1)" in plan  # whole-stage-codegen marker


def test_sequence_assembly_groupby_reuses_bucket_partitioning(spark):
    """Covered in tests/test_sequences.py too, but pinned here with the
    other plan-shape gates: ONE Exchange for window + groupBy, and the
    aggregation carries no Python stage."""
    from jschon_spark.operators.sequences import assemble_sequences

    df = spark.createDataFrame(
        [(f"d{i}", list(range(i % 7 + 1))) for i in range(50)],
        "doc_id string, token_ids array<int>",
    )
    plan = _plan(assemble_sequences(df, budget=8, n_buckets=4))
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
