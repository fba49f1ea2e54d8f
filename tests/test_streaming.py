"""Structured Streaming validation end-to-end: file source → compiled
schema predicates → watermarked windowed flag rollup → memory sink.

The compiled predicates are ordinary Column expressions, so the same
CompiledSchema drives batch and streaming identically (SURVEY.md §2.6
flag output, per-window instead of per-partition).
"""

import datetime as dt

import pandas as pd
import pytest

from jschon_spark.compiler import compile_schema
from jschon_spark.streaming import validate_stream, windowed_flag_summary

SCHEMA = {
    "type": "object",
    "required": ["event_type"],
    "properties": {
        "value": {"type": "number", "minimum": 0, "maximum": 100},
        "event_type": {"enum": ["click", "view", "purchase"]},
    },
}

DDL = "ts timestamp, event_type string, value double"

BASE = dt.datetime(2026, 1, 1, 12, 0, 0)


def _rows():
    rows = []
    for minute in range(3):
        for i in range(10):
            ts = BASE + dt.timedelta(minutes=minute, seconds=i * 5)
            # one enum violation + one maximum violation in minute 1
            if minute == 1 and i == 0:
                rows.append((ts, "bogus", 5.0))
            elif minute == 1 and i == 1:
                rows.append((ts, "click", 500.0))
            else:
                rows.append((ts, "view", float(i)))
    return rows


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    pdf = pd.DataFrame(_rows(), columns=["ts", "event_type", "value"])
    spark.createDataFrame(pdf, schema=DDL).coalesce(1).write.mode("overwrite").parquet(str(d / "in"))
    return str(d / "in")


def test_streaming_windowed_flag(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(DDL).parquet(stream_dir)
    assert stream.isStreaming
    validated = validate_stream(stream, compile_schema(SCHEMA), instance_columns=["event_type", "value"])
    windowed = windowed_flag_summary(validated, ts_col="ts", window_duration="1 minute", watermark="5 minutes")
    q = (
        windowed.writeStream.format("memory")
        .queryName("flag_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from flag_sink order by window_start").toPandas()
    finally:
        q.stop()
    assert len(out) == 3
    assert out["n_rows"].tolist() == [10, 10, 10]
    assert out["n_invalid"].tolist() == [0, 2, 0]
    assert out["window_valid"].tolist() == [True, False, True]


def test_streaming_violations_rows(spark, stream_dir, tmp_path):
    """basic-format violation rows also stream (append mode, row-level)."""
    from jschon_spark.output import basic_output

    stream = spark.readStream.schema(DDL).parquet(stream_dir)
    validated = validate_stream(stream, compile_schema(SCHEMA), instance_columns=["event_type", "value"])
    viols = basic_output(validated, ["ts"])
    q = (
        viols.writeStream.format("memory")
        .queryName("viol_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from viol_sink").toPandas()
    finally:
        q.stop()
    assert sorted(out["keyword"].tolist()) == ["enum", "maximum"]


def test_running_flag_state_accumulates(spark, tmp_path):
    """applyInPandasWithState: totals must ACCUMULATE across
    micro-batches (maxFilesPerTrigger=1 forces two batches)."""
    from jschon_spark.streaming import running_flag_state

    src = tmp_path / "src"
    src.mkdir()
    ddl = "part_id long, value double"  # long key: out schema must follow
    spark.createDataFrame([(0, 5.0), (0, -1.0), (1, 3.0)], ddl).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    spark.createDataFrame([(0, 7.0), (1, -2.0)], ddl).coalesce(1).write.parquet(
        str(src / "b2.parquet")
    )
    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(
        str(src / "*.parquet")
    )
    validated = validate_stream(
        stream, compile_schema({"properties": {"value": {"minimum": 0}}}), instance_columns=["value"]
    )
    q = (
        running_flag_state(validated)
        .writeStream.format("memory")
        .queryName("running_flag")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM running_flag"
        ).toPandas()
    finally:
        q.stop()
    # last emitted row per partition carries the cumulative totals
    last = rows.groupby("part_id").last()
    assert int(last.loc[0, "n_rows"]) == 3 and int(last.loc[0, "n_valid"]) == 2
    assert int(last.loc[1, "n_rows"]) == 2 and int(last.loc[1, "n_valid"]) == 1
    assert bool(last.loc[0, "partition_valid"]) is False


def test_streaming_exact_dedup(spark, tmp_path):
    from jschon_spark.streaming import streaming_exact_dedup

    src = tmp_path / "src"
    src.mkdir()
    ddl = "ts timestamp, doc_id long, text string"
    rows = [
        (dt.datetime(2026, 1, 1, 12, 0, 0), 0, "alpha"),
        (dt.datetime(2026, 1, 1, 12, 0, 5), 1, "alpha"),  # duplicate content
        (dt.datetime(2026, 1, 1, 12, 0, 9), 2, "beta"),
    ]
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(str(src / "b.parquet"))
    stream = spark.readStream.schema(ddl).parquet(str(src / "*.parquet"))
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT doc_id FROM dedup_sink").toPandas()
    finally:
        q.stop()
    kept = sorted(out["doc_id"].tolist())
    assert len(kept) == 2 and 2 in kept
    assert kept[0] in (0, 1)  # exactly one of the duplicate pair


def test_streaming_near_dedup(spark, tmp_path):
    """Byte-identical docs and word-identical replays share a full
    MinHash signature and collapse; genuinely different docs pass.
    (Full-signature equality is deliberately high-precision: a one-word
    edit on a long doc usually changes some permutation minimum and is
    the batch clusterer's job — see the operator docstring.)"""
    from jschon_spark.streaming import streaming_near_dedup

    src = tmp_path / "src_near"
    src.mkdir()
    ddl = "ts timestamp, doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (dt.datetime(2026, 1, 1, 12, 0, 0), 0, base),
        (dt.datetime(2026, 1, 1, 12, 0, 3), 1, base),          # replay
        (dt.datetime(2026, 1, 1, 12, 0, 5), 2, base + " "),    # whitespace-only edit
        (dt.datetime(2026, 1, 1, 12, 0, 7), 3, "completely different content here " * 8),
    ]
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(str(src / "b.parquet"))
    stream = spark.readStream.schema(ddl).parquet(str(src / "*.parquet"))
    q = (
        streaming_near_dedup(stream)
        .writeStream.format("memory")
        .queryName("near_dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_near"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT doc_id, minhash_sig FROM near_dedup_sink").toPandas()
    finally:
        q.stop()
    kept = sorted(out["doc_id"].tolist())
    assert len(kept) == 2 and 3 in kept
    assert kept[0] in (0, 1, 2)  # one survivor from the near-dup trio
    assert all(len(s) == 16 for s in out["minhash_sig"])  # signature rides along


# ---------------------------------------------- audio payload streaming


@pytest.fixture(scope="module")
def clips_stream_dir(spark, tmp_path_factory):
    import numpy as np

    from jschon_spark import fixtures as fx

    d = tmp_path_factory.mktemp("clips_stream")
    pdf = fx.gen_clips_batch(np.arange(500), audio=True)
    spark.createDataFrame(pdf, schema=fx.CLIPS_DDL).coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(d / "in"))
    return str(d / "in")


def test_streaming_audio_invariant(spark, clips_stream_dir, tmp_path):
    """The zero-copy audio invariant (mapInArrow) is a stateless map,
    so the SAME stage runs under Structured Streaming unchanged: decode
    + SNR per micro-batch, bytes never leave the stage."""
    from jschon_spark import fixtures as fx
    from jschon_spark.audio import with_audio_invariant

    stream = spark.readStream.schema(fx.CLIPS_DDL).parquet(clips_stream_dir)
    assert stream.isStreaming
    checked = with_audio_invariant(stream).select("clip_id", "audio_valid", "snr_db")
    q = (
        checked.writeStream.format("memory")
        .queryName("audio_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_audio"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from audio_sink").toPandas()
    finally:
        q.stop()
    assert len(out) == 500
    # injected faults among ids 0..499: SLOT_MAX=4 (frame count),
    # SLOT_SNR=8 (noise burst), SLOT_TRUNC=9 (truncated payload)
    assert int((~out["audio_valid"]).sum()) == 3


def test_streaming_audio_features(spark, clips_stream_dir, tmp_path):
    """DSP feature extraction + quality gates stream the same way."""
    from jschon_spark import fixtures as fx
    from jschon_spark.audio.features import audio_quality_flags, with_audio_features

    stream = spark.readStream.schema(fx.CLIPS_DDL).parquet(clips_stream_dir)
    gated = audio_quality_flags(with_audio_features(stream), max_tokens_per_sec=1e9)
    q = (
        gated.select("clip_id", "features_ok", "dominant_freq_hz", "keep")
        .writeStream.format("memory")
        .queryName("feat_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_feat"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from feat_sink").toPandas()
    finally:
        q.stop()
    assert len(out) == 500
    assert out["features_ok"].mean() > 0.95
    assert out["keep"].mean() > 0.8


def test_streaming_windowed_drift(spark, tmp_path):
    """Windowed drift: minute-windows of a value stream are binned by a
    watermarked streaming aggregation; drift_per_window scores each
    closed window against a static baseline. The injected shifted
    window must light up on BOTH statistics, and every window's numbers
    must agree exactly with the batch drift_statistics oracle on the
    same rows."""
    import numpy as np
    from pyspark.sql import functions as F

    from jschon_spark.operators.table_checks import drift_statistics
    from jschon_spark.streaming import drift_per_window, windowed_bin_counts

    rng = np.random.default_rng(7)
    base_vals = rng.normal(500.0, 80.0, 4000).round(1)

    rows = []
    for minute in range(3):
        # minute 1 is SHIFTED by +300; minutes 0/2 match the baseline
        shift = 300.0 if minute == 1 else 0.0
        for i in range(200):
            ts = BASE + dt.timedelta(minutes=minute, seconds=i % 60, milliseconds=i)
            rows.append((ts, float(base_vals[minute * 200 + i] + shift)))
    src = tmp_path / "drift_src"
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "value"]), "ts timestamp, value double"
    ).coalesce(1).write.parquet(str(src))

    baseline = spark.createDataFrame(
        pd.DataFrame({"value": base_vals})
    ).groupBy(F.floor(F.col("value") / F.lit(100.0)).alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
    baseline.cache().count()

    stream = spark.readStream.schema("ts timestamp, value double").parquet(str(src))
    bins = windowed_bin_counts(stream, "value", "ts", bin_width=100.0)

    out = []
    q = (
        bins.writeStream.outputMode("update")
        .foreachBatch(lambda bdf, _id: out.append(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    flat = [r for batch in out for r in batch]
    assert flat, "stream produced no bin counts"
    bins_batch = spark.createDataFrame(
        flat, "window_start timestamp, window_end timestamp, bin long, n long"
    )
    scored = {r["window_start"].minute: r for r in drift_per_window(bins_batch, baseline).collect()}
    assert set(scored) == {0, 1, 2}
    # the shifted window dominates both statistics
    assert scored[1]["psi"] > 4 * max(scored[0]["psi"], scored[2]["psi"])
    assert scored[1]["ks"] > 4 * max(scored[0]["ks"], scored[2]["ks"])
    assert scored[1]["ks"] > 0.5 and scored[0]["ks"] < 0.2

    # exact agreement with the batch drift_statistics plan per window
    df_all = spark.createDataFrame(pd.DataFrame(rows, columns=["ts", "value"]))
    base_df = spark.createDataFrame(pd.DataFrame({"value": base_vals}))
    for minute, r in scored.items():
        cur = df_all.where(F.minute("ts") == minute)
        want = drift_statistics(cur, base_df, "value", 100.0).collect()[0]
        assert abs(r["psi"] - want["psi"]) < 1e-9, (minute, r, want)
        assert abs(r["ks"] - want["ks"]) < 1e-9, (minute, r, want)


def test_streaming_audio_dedup(spark, tmp_path):
    """Bit-exact replays and pure gain changes share the 128-bit
    spectral fingerprint and collapse; different content passes;
    undecodable rows are never deduped against each other."""
    import numpy as np

    from jschon_spark.streaming import streaming_audio_dedup

    def tone_mix(seed):
        rng = np.random.default_rng(seed)
        n = 32000
        t = np.arange(n) / 16000.0
        x = sum(
            a * np.sin(2 * np.pi * f * t + p)
            for f, a, p in zip(
                rng.uniform(320, 2800, 5), rng.uniform(0.3, 1.0, 5), rng.uniform(0, 6.28, 5)
            )
        )
        bed = np.fft.irfft(np.fft.rfft(rng.standard_normal(n)) * 0.5, n)
        x = x + 0.8 * bed / np.std(bed)
        x = x / np.max(np.abs(x))
        return np.clip(x * 0.5 * 32767.0, -32768, 32767).astype(np.int16)

    a = tone_mix(1)
    gain = (a.astype(np.float64) * 0.5).astype(np.int16)  # pure gain change
    rows = [
        (dt.datetime(2026, 1, 1, 12, 0, 0), "a", a.tobytes(), "pcm_s16le", 16000),
        (dt.datetime(2026, 1, 1, 12, 0, 2), "a_replay", a.tobytes(), "pcm_s16le", 16000),
        (dt.datetime(2026, 1, 1, 12, 0, 4), "a_gain", gain.tobytes(), "pcm_s16le", 16000),
        (dt.datetime(2026, 1, 1, 12, 0, 6), "b", tone_mix(2).tobytes(), "pcm_s16le", 16000),
        (dt.datetime(2026, 1, 1, 12, 0, 7), "bad1", b"\x00", "pcm_s16le", 16000),
        (dt.datetime(2026, 1, 1, 12, 0, 8), "bad2", b"\x00", "pcm_s16le", 16000),
    ]
    ddl = "ts timestamp, clip_id string, bytes binary, codec string, sr_hz int"
    src = tmp_path / "src_audio_dedup"
    src.mkdir()
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(str(src / "b.parquet"))
    stream = spark.readStream.schema(ddl).parquet(str(src / "*.parquet"))
    q = (
        streaming_audio_dedup(stream)
        .writeStream.format("memory")
        .queryName("audio_dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_audio_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT clip_id, bytes IS NOT NULL AS has_payload FROM audio_dedup_sink"
        ).toPandas()
    finally:
        q.stop()
    kept = set(out["clip_id"])
    assert "b" in kept and {"bad1", "bad2"} <= kept  # undecodables both pass
    assert len(kept & {"a", "a_replay", "a_gain"}) == 1  # one survivor
    # survivors keep their audio payload (except the undecodable rows)
    assert all(out[out.clip_id == "b"]["has_payload"])


def test_streaming_conditioning(spark, tmp_path):
    """condition_clips is a stateless mapInArrow stage, so it runs
    unchanged inside Structured Streaming — mixed-rate clips canonicalize
    to 16 kHz on a stream."""
    import numpy as np

    from jschon_spark.audio.conditioning import condition_clips

    t8 = np.clip(0.2 * 32767 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000.0),
                 -32768, 32767).astype(np.int16)
    t22 = np.clip(0.2 * 32767 * np.sin(2 * np.pi * 880 * np.arange(22050) / 22050.0),
                  -32768, 32767).astype(np.int16)
    rows = [
        (dt.datetime(2026, 1, 1), "a8k", t8.tobytes(), "pcm_s16le", 8000),
        (dt.datetime(2026, 1, 1), "b22k", t22.tobytes(), "pcm_s16le", 22050),
    ]
    ddl = "ts timestamp, clip_id string, bytes binary, codec string, sr_hz int"
    src = tmp_path / "src_cond"
    src.mkdir()
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(str(src / "b.parquet"))
    stream = spark.readStream.schema(ddl).parquet(str(src / "*.parquet"))
    q = (
        condition_clips(stream, target_sr=16000)
        .writeStream.format("memory")
        .queryName("cond_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cond"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT clip_id, sr_hz, conditioned_ok, length(bytes) AS n FROM cond_sink"
        ).collect()
    finally:
        q.stop()
    by_id = {r["clip_id"]: r for r in out}
    assert all(r["conditioned_ok"] and r["sr_hz"] == 16000 for r in out)
    assert by_id["a8k"]["n"] == 2 * 16000  # 1 s upsampled


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Native session windows over a stream reproduce the batch
    sessionize rollup (event counts + bounds per session)."""
    from datetime import datetime

    from jschon_spark.operators.temporal import session_stats
    from jschon_spark.streaming import streaming_sessions

    rows = [
        (0, datetime(2024, 1, 1, 10, 0, 0), 1),
        (1, datetime(2024, 1, 1, 10, 20, 0), 1),
        (2, datetime(2024, 1, 1, 10, 55, 0), 1),   # 35-min gap -> new session
        (3, datetime(2024, 1, 1, 9, 0, 0), 2),
        (4, datetime(2024, 1, 1, 9, 10, 0), 2),
        (5, datetime(2024, 1, 1, 23, 0, 0), 2),    # far gap -> new session
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    src = str(tmp_path / "sess_src")
    df.write.parquet(src)

    stream = spark.readStream.schema("event_id long, ts timestamp, user_id long").parquet(src)
    sess = streaming_sessions(stream, gap="30 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "select user_id, n_events, session_start, session_end from sess_sink"
        ).toPandas()
    finally:
        q.stop()

    batch = session_stats(df).toPandas()
    key = ["user_id", "n_events", "session_start", "session_end"]
    got = sorted(map(tuple, out[key].values.tolist()))
    want = sorted(map(tuple, batch[key].values.tolist()))
    assert got == want and len(got) == 4


def test_streaming_transcript_gate_batch_parity(spark, clips_stream_dir, tmp_path):
    """Streaming WER gate (stream-static join + Arrow WER kernel) keeps
    EXACTLY the rows the batch gate keeps on the same 500 clips: no
    reference row (SLOT_NO_TRANSCRIPT) and null transcripts fail
    closed; the fixture's near-identical second-source texts pass;
    appended-MISMATCH rows pass or fail purely by the shared max_wer
    threshold — identical in both engines."""
    import numpy as np
    from pyspark.sql import functions as F

    from jschon_spark import fixtures as fx
    from jschon_spark.operators.transcripts import transcript_agreement_gate
    from jschon_spark.streaming import streaming_transcript_gate

    refs = spark.createDataFrame(
        fx.gen_transcripts_batch(np.arange(500)), schema=fx.TRANSCRIPTS_DDL
    )
    max_wer = 0.05  # tight: the ' MISMATCH' suffix on short texts must fail

    stream = spark.readStream.schema(fx.CLIPS_DDL).parquet(clips_stream_dir)
    gated = streaming_transcript_gate(stream, refs, max_wer=max_wer).select(
        "clip_id", "wer"
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("wer_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wer"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from wer_sink").toPandas()
    finally:
        q.stop()

    batch_clips = spark.createDataFrame(
        fx.gen_clips_batch(np.arange(500), audio=True), schema=fx.CLIPS_DDL
    )
    want = (
        transcript_agreement_gate(
            batch_clips.join(
                refs.select("clip_id", F.col("text").alias("ref_transcript")),
                "clip_id",
                "left",
            ),
            max_wer=max_wer,
        )
        .where(F.col("keep_transcript"))
        .select("clip_id", "wer")
        .toPandas()
    )
    assert sorted(got["clip_id"]) == sorted(want["clip_id"])
    assert len(got) < 500  # the gate really dropped the injected rows
    gw = dict(zip(got["clip_id"], got["wer"]))
    for cid, wer in zip(want["clip_id"], want["wer"]):
        assert abs(gw[cid] - wer) < 1e-12


def test_streaming_audit_output_parity(spark, tmp_path):
    """audit_output is a stateless projection+explode, so the SAME call
    runs under Structured Streaming — a live audit trail per
    micro-batch. Rows must match the batch audit over the same input
    exactly."""
    from pyspark.sql import functions as F

    from jschon_spark.output import audit_output

    schema = {
        "type": "object",
        "required": ["a"],
        "properties": {"a": {"minimum": 3}, "b": {"maxLength": 2}},
    }
    src = str(tmp_path / "audit_src")
    rows = [(i, i - 2, "x" * (i % 4)) for i in range(20)]
    df = spark.createDataFrame(rows, "rid int, a int, b string")
    df.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema("rid int, a int, b string").parquet(src)
    audited = audit_output(
        schema, stream, instance_columns=["a", "b"], id_cols=["rid"],
        where=F.col("rid") % 2 == 0,
    )
    assert audited.isStreaming
    q = (
        audited.writeStream.format("memory")
        .queryName("audit_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_audit"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from audit_sink").toPandas()
    finally:
        q.stop()

    want = audit_output(
        schema, df, instance_columns=["a", "b"], id_cols=["rid"],
        where=F.col("rid") % 2 == 0,
    ).toPandas()
    key = ["rid", "keyword_path", "instance_path"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) > 0
    for col in ("rid", "keyword_path", "valid", "applied"):
        assert list(g[col]) == list(w[col]), col
