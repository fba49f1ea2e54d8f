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
(anti-join; the part_id filter prunes parquet directories), each
completed partition appends one manifest row with lineage + metrics,
and violations / flag / audio results land under --out as parquet.
Rerunning after a crash resumes exactly where the previous run stopped.
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
        all_parts = clips.select(args.partition_col).distinct()
        pending = mf.pending_partitions(spark, args.manifest, all_parts)
        parts = sorted(r[0] for r in pending.collect())
        if not parts:
            print("validate_clips: manifest complete, nothing to do")
            return 0
        clips = clips.where(F.col(args.partition_col).isin(parts))
        print(f"validate_clips: processing {len(parts)} pending partitions: {parts}")

    transcripts = spark.read.parquet(args.transcripts) if args.transcripts else None
    run_id = args.run_id or mf.new_run_id()

    out = run_validation(
        spark,
        clips,
        transcripts=transcripts,
        audio=not args.no_audio,
        partition_col=args.partition_col,
    )

    out["violations"].write.mode("append").parquet(f"{args.out}/violations")
    out["flag"].write.mode("append").parquet(f"{args.out}/flag")
    out["stats"].write.mode("append").parquet(f"{args.out}/column_stats")
    out["duplicates"].write.mode("append").parquet(f"{args.out}/duplicate_clip_ids")
    if not args.no_audio:
        out["audio_violations"].write.mode("append").parquet(f"{args.out}/audio_violations")
        out["audio_flag"].write.mode("append").parquet(f"{args.out}/audio_flag")
        out["audio"].unpersist()
    if transcripts is not None:
        out["missing_transcripts"].write.mode("append").parquet(f"{args.out}/missing_transcripts")

    if args.manifest:
        mf.append_results(spark, args.manifest, out["flag"], run_id=run_id, source_path=args.clips)
    print(f"validate_clips: run {run_id} complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
