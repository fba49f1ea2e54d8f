"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB story):
- exact dedup groups by a 128-bit content hash, never by the raw text —
  the shuffle carries 16-byte keys, and map-side combine absorbs hot
  keys;
- MinHash signatures are computed in a single JVM-side HOF pass over
  shingles (no Python in the hot path); LSH banding turns the O(n²)
  pair problem into an equi-join on (band, band_hash), which Spark
  shuffles hash-partitioned — only same-bucket candidates ever meet;
- candidate verification re-computes exact Jaccard only on the
  candidate pairs (a tiny fraction of the corpus);
- SimHash packs a document into one 64-bit integer; near-dup lookup is
  a band-join on 16-bit chunks (Hamming ≤ 3 ⇒ some chunk matches by
  pigeonhole).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jschon_spark.operators.text import char_ngrams, word_ngrams

# -- exact ------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents (by md5 of raw text): one row
    per duplicated content hash with the member ids and count."""
    h = F.md5(F.col(text_col).cast("binary")).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per content hash. Implemented as
    a groupBy on the hash — one shuffle of (hash, id), then a semi-join
    back; no window over raw text."""
    h = F.md5(F.col(text_col).cast("binary")).alias("content_hash")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="semi")


# -- MinHash + LSH ----------------------------------------------------------


def minhash_signature(shingles: Column, n_perm: int = 16) -> Column:
    """n_perm minhash values in one pass: permutation i is
    xxhash64(shingle, i); the array-min over shingles is the signature
    component. All JVM HOFs — one codegen'd expression."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(n_perm)
        ]
    )


def with_minhash(
    df: DataFrame, text_col: str = "text", out: str = "minhash", n_perm: int = 16, shingle_size: int = 5
) -> DataFrame:
    return df.withColumn(out, minhash_signature(char_ngrams(F.col(text_col), shingle_size), n_perm))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    minhash_col: str = "minhash",
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands, hash each,
    explode to (band_id, band_hash, id), self-join per bucket. The join
    is a plain shuffle-hash equi-join on small keys; a pathological
    bucket (all-identical corpus) is bounded by distinct-per-bucket
    pairing and AQE skew splitting."""
    sig = F.col(minhash_col)
    n_perm_col = F.size(sig)
    rows_per_band = (n_perm_col / bands).cast("int")
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.xxhash64(F.concat_ws(",", F.transform(F.slice(sig, b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")))).alias("band_hash"),
        ),
    )
    buckets = df.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
        id_col, "b.band_id", "b.band_hash"
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_perm: int = 16,
    bands: int = 4,
    shingle_size: int = 5,
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → signature → band-bucket
    join → exact-Jaccard verification of candidates only."""
    sh = df.select(
        F.col(id_col), char_ngrams(F.col(text_col), shingle_size).alias("shingles")
    )
    sigs = sh.withColumn("minhash", minhash_signature(F.col("shingles"), n_perm))
    cand = lsh_candidate_pairs(sigs, id_col=id_col, bands=bands)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# -- n-gram Jaccard (exact, for verification / small candidate sets) --------


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exact word-n-gram Jaccard for given (id_a, id_b) pairs."""
    grams = df.select(F.col(id_col), word_ngrams(F.col(text_col), n).alias("grams"))
    a = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("g_a"))
    b = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("g_b"))
    return pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", F.round(jaccard(F.col("g_a"), F.col("g_b")), 6).alias("jaccard")
    )


# -- SimHash ----------------------------------------------------------------


def simhash64(text: Column, shingle_size: int = 4, n_bits: int = 64) -> Column:
    """64-bit SimHash from character shingles, entirely JVM-side: one
    ``aggregate`` pass over shingle hashes accumulates per-bit sign
    sums (bits read from the two's-complement ``bin`` string — static
    positions, so codegen unrolls them); the fingerprint packs the
    signs back with static shift literals. No Python, no shuffle."""
    shingles = char_ngrams(text, shingle_size)
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))

    def bits_of(h: Column) -> Column:
        binstr = F.lpad(F.bin(h), 64, "0")
        return F.array(
            *[
                F.when(binstr.substr(64 - j, 1) == "1", 1).otherwise(-1)
                for j in range(n_bits)
            ]
        )

    zero = F.array(*[F.lit(0) for _ in range(n_bits)])
    bit_sums = F.aggregate(
        hashes, zero, lambda acc, h: F.zip_with(acc, bits_of(h), lambda a, b: a + b)
    )
    terms = []
    for j in range(n_bits):
        weight = (1 << j) if j < 63 else -(1 << 63)  # bit 63 = sign bit of long
        terms.append(
            F.when(F.element_at(bit_sums, j + 1) > 0, F.lit(weight).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    fp = terms[0]
    for t in terms[1:]:
        fp = fp + t
    return fp


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    return df.withColumn(out, simhash64(F.col(text_col)))


def simhash_near_duplicates(
    df: DataFrame, id_col: str = "doc_id", simhash_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ k on SimHash: band the 64
    bits into 4 × 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ at least one
    chunk equal), join per chunk, verify with bit_count(xor)."""
    fp = F.col(simhash_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftrightunsigned(fp, c * 16)
                .bitwiseAND(F.lit(0xFFFF).cast("long"))
                .alias("chunk"),
            )
            for c in range(4)
        ]
    )
    buckets = df.select(F.col(id_col), fp.alias("fp"), F.explode(chunks).alias("c")).select(
        id_col, "fp", "c.chunk_id", "c.chunk"
    )
    l, r = buckets.alias("l"), buckets.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.fp").bitwiseXOR(F.col("r.fp"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
