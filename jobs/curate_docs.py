#!/usr/bin/env python
"""spark-submit entry point for the resumable TEXT-curation job:
PII scrub → quality/language/repetition gates → normalized exact dedup
→ edit-verified near-dup clustering → committed output. The text-side
sibling of curate_clips.py, composing only tested operators.

Cluster launch:

    zip -r jschon_spark.zip jschon_spark
    spark-submit --master <cluster> --py-files jschon_spark.zip \
        jobs/curate_docs.py \
        --docs s3://bucket/documents --out s3://bucket/curated \
        --manifest s3://bucket/curation_manifest

Pipeline (each stage is one of the tested operators):

1. ``text.with_pii_scrub`` — emails / IPv4s / phone runs replaced with
   typed tokens; the scrubbed text is what every later stage (and the
   output) sees. Pure codegen'd regexp chain.
2. ``text.with_quality_score`` + ``with_lang_id`` +
   ``with_repetition_signals`` — the curation gates, one staged
   projection (the repetition gate references named signal columns, so
   nothing is computed twice).
3. ``text.normalized_dedup`` — case/punct/whitespace duplicates
   collapse to the min-id representative (one 16-byte-key shuffle).
4. ``dedup.minhash_band_pairs_sql`` → ``dedup.edit_verified_pairs`` →
   ``graph.dedup_by_components`` — content-blocked candidates,
   character-Levenshtein verification (length prefilter + banded DP),
   transitive clusters collapsed to canonical docs. Only (id, key)
   metadata enters the banded join; document text shuffles once, in
   the final anti-join by id.
5. Curated docs land under --out tagged with this run's run_id;
   per-partition manifest rows append ONLY afterwards (the commit
   point) — `manifest.read_committed` readers get exactly-once
   visibility over at-least-once writes.

Same resume caveat as curate_clips.py: near-dup detection is
corpus-global within a run; cross-run duplicates straddle commit
boundaries and are handled by a batch pass over the curated table.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="Scrub, gate, and dedup a documents table")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="output directory for curated docs parquet")
    p.add_argument("--manifest", default=None, help="checkpoint manifest path (enables resume)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--langs", default="en", help="comma-separated keep languages")
    p.add_argument("--edit-threshold", type=float, default=0.8)
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--partition-col", default="source")
    return p.parse_args(argv)


def curate(
    spark,
    docs,
    min_quality: float = 0.3,
    langs: tuple = ("en",),
    edit_threshold: float = 0.8,
    dedup: bool = True,
):
    """The curation plan (importable for tests): returns
    (curated DataFrame with scrubbed text + signals, stats dict)."""
    from pyspark.sql import functions as F

    from jschon_spark.operators.dedup import edit_verified_pairs, minhash_band_pairs_sql
    from jschon_spark.operators.graph import dedup_by_components
    from jschon_spark.operators.text import (
        normalized_dedup,
        with_lang_id,
        with_pii_scrub,
        with_quality_score,
        with_repetition_signals,
    )

    scrubbed = with_pii_scrub(docs).drop("text").withColumnRenamed("scrubbed_text", "text")
    staged = with_repetition_signals(
        with_quality_score(with_lang_id(scrubbed))
    )
    kept = staged.where(
        (F.col("quality_score") >= min_quality)
        & F.col("lang_pred").isin(*langs)
        & F.col("repetition_ok")
    )

    exact = normalized_dedup(kept)
    if not dedup:
        return exact, {}

    cand = minhash_band_pairs_sql(exact, n=4, n_bands=3)
    pairs = edit_verified_pairs(exact, cand, threshold=edit_threshold).select("id_a", "id_b")
    curated = dedup_by_components(exact, pairs, id_col="doc_id", src="id_a", dst="id_b")
    return curated, {"dedup_pairs": pairs}


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jschon_spark import manifest as mf

    spark = SparkSession.builder.appName("jschon_spark_curate_docs").getOrCreate()
    docs = spark.read.parquet(args.docs)

    # The manifest keys partitions by an int part_id (validate_clips
    # contract). A documents table partitions by a STRING column
    # (source), so derive a stable int key from the partition value —
    # the same trick an Iceberg-bucket transform uses. Collisions just
    # coarsen resume granularity (two sources sharing a key commit
    # together), never correctness.
    part_key = F.pmod(F.xxhash64(args.partition_col), F.lit(1 << 31)).cast("int")
    docs = docs.withColumn("_part_id", part_key)

    if args.manifest:
        from jschon_spark.pipeline import select_pending

        all_parts = docs.select(F.col("_part_id").alias("part_id")).distinct()
        pending = mf.pending_partitions(spark, args.manifest, all_parts)
        docs, parts, n_pending = select_pending(
            docs, pending.withColumnRenamed("part_id", "_part_id"), "_part_id"
        )
        if n_pending == 0:
            print("curate_docs: manifest complete, nothing to do")
            return 0
        print(f"curate_docs: processing {n_pending} pending partitions")

    run_id = args.run_id or mf.new_run_id()
    curated, _ = curate(
        spark,
        docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        edit_threshold=args.edit_threshold,
        dedup=not args.no_dedup,
    )
    curated.withColumn("run_id", F.lit(run_id)).write.mode("append").parquet(
        f"{args.out}/curated"
    )

    if args.manifest:
        # COMMIT: per-partition rows only after the curated append;
        # keyed off the PROCESSED input so fully-gated-out partitions
        # still commit (no infinite reprocess).
        processed = docs.groupBy(F.col("_part_id").alias("part_id")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        surv = curated.groupBy(F.col("_part_id").alias("part_id")).agg(
            F.count(F.lit(1)).alias("n_valid")
        )
        per_part = (
            processed.join(surv, "part_id", "left")
            .withColumn("n_valid", F.coalesce(F.col("n_valid"), F.lit(0)))
            .withColumn("n_invalid", F.col("n_rows") - F.col("n_valid"))
            .withColumn("partition_valid", F.col("n_invalid") == 0)
        )
        mf.append_results(
            spark, args.manifest, per_part, run_id=run_id, source_path=args.docs
        )
    print(f"curate_docs: run {run_id} complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
