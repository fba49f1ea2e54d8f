"""Structured Streaming validation.

The compiled schema predicates are ordinary Column expressions, so the
same CompiledSchema drives ``readStream`` sources unchanged. Streaming
adds: event-time watermarks for late rows and windowed violation-count
aggregation (≙ the flag output rolled up per window instead of per
partition).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jschon_spark.compiler import CompiledSchema


def validate_stream(
    stream_df: DataFrame,
    compiled: CompiledSchema,
    instance_columns: Optional[list[str]] = None,
) -> DataFrame:
    """Append valid/violations to a streaming DataFrame — identical
    plan fragments as the batch path (Catalyst treats them the same)."""
    return compiled.validate(stream_df, instance_columns=instance_columns)


def windowed_flag_summary(
    validated: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-event-time-window pass/fail counts with a watermark bounding
    state (late rows beyond the watermark are dropped — documented
    streaming semantics, not a silent loss)."""
    return (
        validated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("valid").cast("long")).alias("n_valid"),
            F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
            F.min("valid").alias("window_valid"),
        )
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_rows", "n_valid", "n_invalid", "window_valid")
    )


def running_flag_state(
    validated: DataFrame,
    key_col: str = "part_id",
    valid_col: str = "valid",
) -> DataFrame:
    """CUSTOM STATEFUL operator: cumulative per-partition pass/fail
    counters maintained across micro-batches via
    ``applyInPandasWithState`` — the streaming analogue of the batch
    ``flag_summary`` where each trigger emits the RUNNING totals for
    every partition it touched (state = two longs per partition, so
    state size is bounded by partition count, not row count)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = validated.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_rows long, n_valid long, n_invalid long, partition_valid boolean"
    )
    state_schema = "n_rows long, n_valid long"

    def update(key, pdfs, state: GroupState):
        rows = 0
        valid = 0
        for pdf in pdfs:
            rows += len(pdf)
            valid += int(pdf[valid_col].fillna(False).astype(bool).sum())
        prev_rows, prev_valid = state.get if state.exists else (0, 0)
        n_rows, n_valid = prev_rows + rows, prev_valid + valid
        state.update((n_rows, n_valid))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_rows": [n_rows],
                "n_valid": [n_valid],
                "n_invalid": [n_rows - n_valid],
                "partition_valid": [n_valid == n_rows],
            }
        )

    return validated.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    content_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash
    within the watermark horizon passes, replays/duplicates are
    dropped. Built on ``dropDuplicatesWithinWatermark`` (state expiry
    handled by the engine — bounded state, no custom bookkeeping)."""
    return (
        stream_df.withColumn("content_hash", F.md5(F.col(content_col).cast("binary")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_near_dedup(
    stream_df: DataFrame,
    content_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    n_perm: int = 16,
    shingle_size: int = 5,
) -> DataFrame:
    """Streaming NEAR-dup dedup: drop documents whose full MinHash
    signature collides with an earlier document inside the watermark
    horizon. Full-signature equality is the streaming-safe tightening
    of the batch LSH (dedup.minhash_near_duplicates): band-join +
    exact-verify needs a stream-stream self-join with unbounded reach,
    while an equality key rides ``dropDuplicatesWithinWatermark``'s
    engine-managed bounded state. At 16 permutations a signature
    collision implies estimated Jaccard ≈ 1 (every per-permutation
    minimum equal), so this catches the boilerplate/replay tier of
    near-dups and never drops a non-near-dup (P[all-16 collide] at
    J=0.9 is ~0.19: a conservative, high-precision gate — run the batch
    clusterer over the sink for full recall). Signature computation is
    the same whole-batch Arrow kernel as the batch path."""
    from jschon_spark.operators.dedup import minhash_udf

    sig = minhash_udf(n_perm=n_perm, shingle_size=shingle_size)
    return (
        stream_df.withColumn("minhash_sig", sig(F.col(content_col)))
        # the dedup key must be an orderable scalar: pack the signature
        # longs into one string key (state stores the key per row)
        .withColumn("sig_key", F.concat_ws(",", F.col("minhash_sig").cast("array<string>")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["sig_key"])
        .drop("sig_key")
    )


def windowed_bin_counts(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    bin_width: float = 100.0,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming half of windowed drift detection: per-event-time-window
    histogram bin counts of ``value_col`` — a plain watermarked
    streaming aggregation (map-side partial combine on (window, bin);
    state bounded by windows-in-watermark × occupied bins). Emit it in
    append mode and run :func:`drift_per_window` on each closed batch
    (foreachBatch) or on the sink table."""
    return (
        stream_df.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.floor(F.col(value_col) / F.lit(bin_width)).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bin",
            "n",
        )
    )


def drift_per_window(bins_df: DataFrame, baseline: DataFrame) -> DataFrame:
    """Batch half of windowed drift detection: PSI + two-sample KS of
    each window's bin distribution against a static ``baseline`` of
    (bin, n) counts — one fully distributed plan, grouped per window
    (the per-window analogue of table_checks.drift_statistics: per-side
    share normalization, full-outer bin join, window-partitioned
    cumulative ECDFs; everything after the input aggregation is
    O(windows × bins)). Returns one row per window:
    (window_start, window_end, psi double, ks double), 6dp."""
    from pyspark.sql import Window

    eps = 1e-6
    cur_tot = bins_df.groupBy("window_start", "window_end").agg(
        F.sum("n").alias("ct")
    )
    cur = (
        bins_df.join(cur_tot, ["window_start", "window_end"])
        .select("window_start", "window_end", "bin", (F.col("n") / F.col("ct")).alias("p"))
    )
    base_tot = baseline.select(F.sum("n").alias("bt"))
    base = baseline.crossJoin(F.broadcast(base_tot)).select(
        "bin", (F.col("n") / F.col("bt")).alias("q")
    )
    # every window needs every baseline bin (full-outer semantics per
    # window): cross the windows with the baseline bins, then left-join
    # the current shares
    windows = cur.select("window_start", "window_end").distinct()
    all_bins = (
        cur.select("window_start", "window_end", "bin")
        .union(windows.crossJoin(F.broadcast(base.select("bin"))))
        .distinct()
    )
    joined = (
        all_bins.join(cur, ["window_start", "window_end", "bin"], "left")
        .join(F.broadcast(base), ["bin"], "left")
        .select(
            "window_start",
            "window_end",
            "bin",
            F.coalesce("p", F.lit(0.0)).alias("p"),
            F.coalesce("q", F.lit(0.0)).alias("q"),
        )
    )
    pc = F.greatest(F.col("p"), F.lit(eps))
    qc = F.greatest(F.col("q"), F.lit(eps))
    w = Window.partitionBy("window_start", "window_end").orderBy("bin")
    scored = joined.select(
        "window_start",
        "window_end",
        ((pc - qc) * F.log(pc / qc)).alias("psi_term"),
        F.abs(
            F.sum("p").over(w) - F.sum("q").over(w)
        ).alias("ecdf_gap"),
    )
    return (
        scored.groupBy("window_start", "window_end")
        .agg(
            F.round(F.sum("psi_term"), 6).alias("psi"),
            F.round(F.max("ecdf_gap"), 6).alias("ks"),
        )
        .orderBy("window_start")
    )


def streaming_audio_dedup(
    stream_df: DataFrame,
    id_col: str = "clip_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming perceptual audio dedup: the first clip with each
    128-bit spectral fingerprint (audio/fingerprint.py) inside the
    watermark horizon passes; later clips with the IDENTICAL
    fingerprint — bit-exact replays, re-encodes, pure gain changes
    (the fingerprint is gain-sign-invariant) — are dropped.

    Exact-fingerprint equality is the streaming-safe tightening of the
    batch Hamming banding (audio_near_duplicates), by the same argument
    as streaming_near_dedup vs the batch MinHash LSH: a radius join
    needs a stream-stream self-join with unbounded reach, while an
    equality key rides ``dropDuplicatesWithinWatermark``'s
    engine-managed bounded state. High-precision / reduced-recall tier
    — run the batch near-dup clusterer over the sink for the noisy-copy
    tier. Fingerprinting itself is the stateless zero-copy mapInArrow
    stage (payload passes through so survivors keep their audio).

    Undecodable rows are never treated as duplicates of each other:
    their dedup key falls back to the row's own ``id_col``."""
    from jschon_spark.audio.fingerprint import with_audio_fingerprint

    fp = with_audio_fingerprint(stream_df, keep_bytes=True)
    key = F.when(
        F.col("fingerprint_ok"),
        F.concat_ws(":", F.col("audio_fp_a"), F.col("audio_fp_b")),
    ).otherwise(F.concat(F.lit("raw:"), F.col(id_col).cast("string")))
    return (
        fp.withColumn("audio_fp_key", key)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["audio_fp_key"])
        .drop("audio_fp_key")
    )


def streaming_sessions(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(user, session) rollup over a STREAM via the engine's native
    session windows: ``F.session_window`` merges events whose windows
    chain within ``gap``, state is engine-managed and bounded by the
    watermark (a session closes — and in append mode emits — once the
    watermark passes its end). The streaming analogue of
    ``operators.temporal.session_stats``; same grouping up to the exact
    -gap boundary (the batch operator keeps a gap of exactly ``gap`` in
    one session, session windows split it)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "session_start",
            "session_end",
        )
    )


def streaming_transcript_gate(
    stream_df: DataFrame,
    ref_transcripts: DataFrame,
    max_wer: float = 0.3,
    id_col: str = "clip_id",
    hyp_col: str = "transcript",
) -> DataFrame:
    """Streaming WER transcript-agreement gate — the curation stage
    curate_clips runs batch-side (jobs/curate_clips.py), now available
    on the live ingest path: a stream-STATIC left join brings in the
    second-source transcript by ``id_col`` (stateless — stream-static
    joins need no watermark or state store; the static side is
    broadcast or re-scanned per micro-batch by size), then the same
    Arrow-batched word-DP WER kernel as the batch gate
    (operators/transcripts.py) scores each row. Rows whose transcripts
    disagree beyond ``max_wer`` — or that have NO reference row — are
    dropped (fail closed, identical rule to the batch gate), so a
    disagreeing clip never reaches the payload-sized decode stages
    downstream. Per-micro-batch plan fragments are the batch plan
    fragments; parity is pinned in tests/test_streaming.py."""
    from jschon_spark.operators.transcripts import transcript_agreement_gate

    refs = ref_transcripts.select(
        F.col(id_col), F.col("text").alias("ref_transcript")
    )
    joined = stream_df.join(refs, id_col, "left")
    return (
        transcript_agreement_gate(joined, max_wer=max_wer, hyp_col=hyp_col)
        .where(F.col("keep_transcript"))
        .drop("ref_transcript")
    )
