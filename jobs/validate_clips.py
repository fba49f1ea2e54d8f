#!/usr/bin/env python
"""spark-submit entry point for the resumable clips-validation job.

Cluster launch (the north-rule shape — multi-executor, package shipped
via --py-files):

    zip -r jschon_spark.zip jschon_spark
    spark-submit --master <cluster> --py-files jschon_spark.zip \
        jobs/validate_clips.py \
        --clips s3://bucket/clips --transcripts s3://bucket/transcripts \
        --out s3://bucket/validation_out --manifest s3://bucket/manifest

Local smoke: spark-submit --master "local[4]" --py-files jschon_spark.zip ...

Behavior: partitions already recorded in the manifest are skipped
(anti-join; the part_id filter prunes parquet directories), violations /
flag / audio results land under --out as parquet tagged with this run's
run_id, and ONLY THEN does each completed partition append its manifest
row (lineage + metrics) — the manifest append is the commit point.
Writes are therefore at-least-once: a crash between the output writes
and the manifest append leaves orphan output rows whose run_id never
reached the manifest, and the rerun reprocesses those partitions under
a new run_id. Read results through `manifest.read_committed` (semi-join
on (part_id, run_id)) for exactly-once visibility.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="Validate an audio clips table (jschon_spark)")
    p.add_argument("--clips", required=True, help="clips parquet path (partitioned by part_id)")
    p.add_argument("--transcripts", default=None, help="transcripts parquet path (referential check)")
    p.add_argument("--out", required=True, help="output directory for violations/flag/audio parquet")
    p.add_argument("--manifest", default=None, help="checkpoint manifest path (enables resume)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--no-audio", action="store_true", help="skip the audio invariant stage")
    p.add_argument("--partition-col", default="part_id")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jschon_spark import manifest as mf
    from jschon_spark.pipeline import run_validation

    spark = SparkSession.builder.appName("jschon_spark_validate_clips").getOrCreate()
    clips = spark.read.parquet(args.clips)

    if args.manifest:
        from jschon_spark.pipeline import select_pending

        all_parts = clips.select(args.partition_col).distinct()
        pending = mf.pending_partitions(spark, args.manifest, all_parts)
        clips, parts, n_pending = select_pending(clips, pending, args.partition_col)
        if n_pending == 0:
            print("validate_clips: manifest complete, nothing to do")
            return 0
        print(f"validate_clips: processing {n_pending} pending partitions"
              + (f": {parts}" if parts and len(parts) <= 50 else ""))

    transcripts = spark.read.parquet(args.transcripts) if args.transcripts else None
    run_id = args.run_id or mf.new_run_id()

    out = run_validation(
        spark,
        clips,
        transcripts=transcripts,
        audio=not args.no_audio,
        partition_col=args.partition_col,
    )

    # every output row carries the run_id; rows become visible to
    # committed readers only after the manifest append below
    def _write(df, name):
        df.withColumn("run_id", F.lit(run_id)).write.mode("append").parquet(f"{args.out}/{name}")

    _write(out["violations"], "violations")
    _write(out["flag"], "flag")
    _write(out["stats"], "column_stats")
    _write(out["duplicates"], "duplicate_clip_ids")
    if not args.no_audio:
        _write(out["audio_violations"], "audio_violations")
        _write(out["audio_flag"], "audio_flag")
        out["audio"].unpersist()
    if transcripts is not None:
        _write(out["missing_transcripts"], "missing_transcripts")
        _write(out["orphan_transcripts"], "orphan_transcripts")
        _write(out["transcript_mismatches"], "transcript_mismatches")
        out["transcript_checks"].unpersist()

    if args.manifest:
        # COMMIT: one manifest row per completed partition, after all
        # output appends succeeded
        mf.append_results(spark, args.manifest, out["flag"], run_id=run_id, source_path=args.clips)
    print(f"validate_clips: run {run_id} complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
