"""The flagship job: validate an audio clips table end-to-end.

One scan feeds the compiled per-row predicates (Catalyst, codegen'd) and
the flag/basic outputs; a second, column-pruned projection feeds the
Arrow audio stage; table-level checks (uniqueness, referential, drift)
run as separate jobs over the same source. Per-partition results land in
a checkpoint manifest for resume (SURVEY.md §3.3 pipeline shape).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jschon_spark.audio import with_audio_invariant
from jschon_spark.compiler import compile_schema
from jschon_spark.operators import table_checks as tc
from jschon_spark.output import basic_output, flag_summary

# The clip schema — jschon keyword semantics over the input_hint shape.
# `bytes` is opaque binary and deliberately NOT in this metadata schema:
# requiring it here would force every scan to read the audio payload.
# Its presence/decodability is asserted by the audio stage instead.
CLIP_SCHEMA = {
    "$id": "https://jschon-spark.dev/clip",
    "type": "object",
    "required": ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"],
    "properties": {
        "clip_id": {"type": "string", "pattern": "^clip-[0-9a-f]"},
        "sr_hz": {"enum": [8000, 16000, 22050, 44100, 48000]},
        "dur_ms": {"type": "integer", "minimum": 20, "maximum": 600000},
        "codec": {"enum": ["pcm_s16le", "wav", "flac", "opus"]},
        "transcript": {"type": "string", "maxLength": 4096},
    },
}

METADATA_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript", "part_id"]


def validate_clips_rows(clips: DataFrame, schema: Optional[dict] = None) -> DataFrame:
    """Per-row keyword validation — metadata columns only, so the scan
    never reads the audio payload (column pruning hygiene)."""
    compiled = compile_schema(schema or CLIP_SCHEMA)
    cols = [c for c in METADATA_COLS if c in clips.columns and c != "part_id"]
    return compiled.validate(clips, instance_columns=cols)


def run_validation(
    spark: SparkSession,
    clips: DataFrame,
    transcripts: Optional[DataFrame] = None,
    baseline: Optional[pd.DataFrame] = None,
    schema: Optional[dict] = None,
    audio: bool = True,
    partition_col: str = "part_id",
) -> dict:
    """Full pipeline. Returns a dict of result DataFrames + driver-side
    drift stats. Nothing is collected here except tiny aggregates."""
    meta = clips.select(*[c for c in METADATA_COLS if c in clips.columns])
    validated = validate_clips_rows(meta, schema)

    out: dict = {
        "rows": validated,
        "flag": flag_summary(validated, partition_col),
        "violations": basic_output(validated, ["clip_id", partition_col]),
        "stats": tc.column_stats(meta, [c for c in meta.columns if c != partition_col]),
        # one scan + one shuffle for both histograms (grouping sets) —
        # separate groupBys would rescan the table per column
        "categorical_histograms": tc.categorical_histograms(meta, ["codec", "sr_hz"]),
        "duplicates": tc.duplicate_keys(meta, "clip_id"),
    }

    if "transcript" in meta.columns and "dur_ms" in meta.columns:
        # transcript-duration plausibility (speakingRate/articulationRate)
        # — map-only, no shuffle, rides the same metadata scan shape
        out["speaking_rate"] = tc.speaking_rate_checks(meta)

    if audio:
        # persist post-decode (bytes dropped → tiny rows) so the flag and
        # violation outputs don't each re-decode the whole audio payload;
        # caller unpersists via out["audio"].unpersist()
        audio_df = with_audio_invariant(
            clips.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", partition_col)
        ).drop("bytes").persist()
        out["audio"] = audio_df
        out["audio_flag"] = flag_summary(audio_df, partition_col, valid_col="audio_valid")
        out["audio_violations"] = basic_output(
            audio_df, ["clip_id", partition_col], violations_col="audio_violations"
        )

    if transcripts is not None:
        # all three referential checks from ONE full-outer join (both
        # sides are fact-sized at the design point — three separate
        # anti/anti/inner joins would shuffle them three times); the
        # combined frame is tiny (violating keys only) and persisted so
        # the three derived outputs are filters, not re-joins. Caller
        # unpersists via out["transcript_checks"].unpersist().
        combined = tc.transcript_checks(
            meta.select("clip_id", "transcript"), transcripts
        ).persist()
        out["transcript_checks"] = combined
        out["missing_transcripts"] = combined.where(
            F.col("check") == "missing_transcript"
        ).select(
            F.col("clip_id"),
            F.lit("/clip_id").alias("instance_path"),
            F.lit("/$ref").alias("keyword_path"),
            F.lit("$ref").alias("keyword"),
            F.lit("no matching row for clip_id").alias("error"),
        )
        out["orphan_transcripts"] = combined.where(
            F.col("check") == "orphan_transcript"
        ).select(*transcripts.columns)
        # distinct keys: duplicate clip_ids fan out in the join, but one
        # mismatching key is one violation
        out["transcript_mismatches"] = (
            combined.where(F.col("check") == "transcript_mismatch")
            .select("clip_id")
            .distinct()
        )

    if baseline is not None:
        # fully distributed PSI/KS plan (table_checks.drift_plan); only
        # the single (ks_dur, psi_sr) row is collected
        out["drift"] = tc.drift_check_distributed(meta, baseline)

    return out


def run_resumable(
    spark: SparkSession,
    clips_path: str,
    manifest_path: str,
    run_id: Optional[str] = None,
    schema: Optional[dict] = None,
    partition_col: str = "part_id",
) -> dict:
    """Checkpointed, partition-granular validation (north rule: resume
    from a manifest keyed by the Iceberg-style partition).

    1. anti-join the table's partitions against the manifest,
    2. validate ONLY pending partitions — the ``part_id`` filter prunes
       parquet directories, so completed partitions are never rescanned,
    3. append one manifest row per finished partition (lineage = run_id
       + source path, metrics = flag counts).

    Crash-and-rerun resumes where the previous run stopped; an empty
    pending set is a no-op.

    Semantics: output/manifest appends are at-least-once, but the
    manifest row is the COMMIT — readers use ``manifest.read_committed``
    to see exactly-once results (orphan rows from a crashed run carry a
    run_id the manifest never recorded)."""
    from jschon_spark import manifest as mf

    clips = spark.read.parquet(clips_path)
    all_parts = clips.select(partition_col).distinct()
    pending = mf.pending_partitions(spark, manifest_path, all_parts)
    subset, parts, n_pending = select_pending(clips, pending, partition_col)
    if n_pending == 0:
        return {"run_id": run_id, "n_partitions": 0, "processed_partitions": []}
    run_id = run_id or mf.new_run_id()
    flags = flag_summary(validate_clips_rows(subset, schema), partition_col)
    mf.append_results(spark, manifest_path, flags, run_id=run_id, source_path=clips_path)
    return {"run_id": run_id, "n_partitions": n_pending, "processed_partitions": parts}


# below this many pending partitions the literal IN-list is planned as a
# static partition filter (directory pruning at plan time); above it the
# list would bloat the plan, so a broadcast semi-join (runtime DPP) is
# used instead and the partition ids are not collected to the driver
MAX_INLINE_PARTITIONS = 10_000


def select_pending(
    clips: DataFrame, pending: DataFrame, partition_col: str = "part_id"
) -> tuple[DataFrame, Optional[list], int]:
    """(pending-only clips, partition list or None, pending count).

    Small frontiers inline as an ``isin`` partition filter — statically
    pruned directories. Large frontiers (1e5 partitions at 10^12 rows)
    stay distributed: broadcast semi-join, pruned at runtime by dynamic
    partition pruning, nothing collected."""
    # one job decides both the count and the inline list for the common
    # small case; only an over-limit frontier pays a second (count) job
    rows = pending.limit(MAX_INLINE_PARTITIONS + 1).collect()
    n = len(rows)
    if n == 0:
        return clips.where(F.lit(False)), [], 0
    if n <= MAX_INLINE_PARTITIONS:
        parts = sorted(r[0] for r in rows)
        return clips.where(F.col(partition_col).isin(parts)), parts, n
    return clips.join(F.broadcast(pending), partition_col, "semi"), None, pending.count()
