"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB story):
- exact dedup groups by a 128-bit content hash, never by the raw text —
  the shuffle carries 16-byte keys, and map-side combine absorbs hot
  keys;
- MinHash/SimHash signatures are computed in ONE Arrow-batched numpy
  pass per document (byte-window shingle packing + splitmix mixing —
  no per-shingle string objects; measured ~40x over the JVM HOF form
  on this host, where UTF8String allocation costs ~10us/shingle);
  pure-Column variants are kept for SQL-oracle parity;
- LSH banding turns the O(n²) pair problem into an equi-join on
  (band, band_hash), which Spark shuffles hash-partitioned — only
  same-bucket candidates ever meet; the self-join is hinted
  shuffle_hash so both sides share one Exchange (ReusedExchange ⇒ the
  signature pipeline runs once, and broadcast is impossible at the
  10^12-row design point anyway);
- candidate verification computes exact Jaccard only on candidate
  pairs, after semi-join pruning the corpus to documents that appear
  in some candidate pair;
- SimHash packs a document into one 64-bit integer; near-dup lookup is
  a band-join on 16-bit chunks (Hamming ≤ 3 ⇒ some chunk matches by
  pigeonhole).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def shingle_hashes(shingles: Column) -> Column:
    """One string-hash pass: shingle → xxhash64 long. Every downstream
    permutation works on these longs — the strings are hashed exactly
    once per document."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


# -- vectorized shingle hashing (Arrow) -------------------------------------
#
# Materializing shingle substrings JVM-side costs ~10us per shingle on
# this host (UTF8String allocation churn): ~19s just to shingle 5k short
# docs. The Arrow path packs each n-byte window (n<=8) of the normalized
# utf-8 text into a uint64 with vectorized shifts and mixes it with
# splitmix64 — no per-shingle object ever exists. The hash family is
# internal to minhash/simhash; the SQL-oracle-checkable operators
# (ngram_jaccard) keep the HOF form.


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))


def _norm_texts(texts: pd.Series) -> pd.Series:
    # mirrors char_ngrams' normalization: lower, trim, collapse whitespace
    return texts.fillna("").str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


def _shingle_hash_row(t: str, n: int) -> np.ndarray:
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.int64)
    if len(b) < n:
        acc = np.zeros(1, dtype=np.uint64)
        for k in range(len(b)):
            acc |= np.uint64(b[k]) << np.uint64(8 * k)
    else:
        m = len(b) - n + 1
        acc = np.zeros(m, dtype=np.uint64)
        for k in range(n):
            acc |= b[k : m + k].astype(np.uint64) << np.uint64(8 * k)
    return np.unique(_mix64(acc)).astype(np.int64)


_SHINGLE_UDFS: dict = {}


def shingle_hash_udf(shingle_size: int):
    """pandas_udf: text → array<long> of distinct hashed character
    shingles (vectorized byte-window packing; see module comment)."""
    if shingle_size > 8:
        raise ValueError("byte-packed shingles support n <= 8")
    if shingle_size not in _SHINGLE_UDFS:

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def f(text: pd.Series) -> pd.Series:
            return _norm_texts(text).map(lambda t: _shingle_hash_row(t, shingle_size))

        _SHINGLE_UDFS[shingle_size] = f
    return _SHINGLE_UDFS[shingle_size]


def minhash_signature_from_hashes(hashes: Column, n_perm: int = 16) -> Column:
    """n_perm minhash components over pre-hashed shingles: permutation i
    re-hashes the 8-byte long with seed i (xxhash64 over a long is a
    handful of ALU ops — no per-permutation scan of the shingle string,
    which is what made the naive form ~10x slower). Long-multiply
    bijections would be cheaper still but overflow-throw under ANSI
    mode (Spark 4 default)."""
    def perm(i: int):
        # closure factory — a second lambda param (even defaulted) is
        # bound to the HOF's element-index column by pyspark
        return lambda h: F.xxhash64(h, F.lit(i))

    return F.array(*[F.array_min(F.transform(hashes, perm(i))) for i in range(n_perm)])


def minhash_signature(shingles: Column, n_perm: int = 16) -> Column:
    return minhash_signature_from_hashes(shingle_hashes(shingles), n_perm)


def _minhash_row(h: np.ndarray, consts: np.ndarray) -> np.ndarray:
    if len(h) == 0:
        return np.zeros(len(consts), dtype=np.int64)
    hu = h.astype(np.uint64)
    return (
        _mix64(hu[:, None] ^ consts[None, :]).min(axis=0).astype(np.int64)
    )


_MINHASH_UDFS: dict = {}


def minhash_udf(n_perm: int = 16, shingle_size: int = 5):
    """pandas_udf: text → n_perm-component MinHash signature, fully
    vectorized (shingle byte-packing + an m x n_perm mix-and-min)."""
    key = (n_perm, shingle_size)
    if key not in _MINHASH_UDFS:
        consts = _mix64(np.arange(1, n_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def f(text: pd.Series) -> pd.Series:
            return _norm_texts(text).map(
                lambda t: _minhash_row(_shingle_hash_row(t, shingle_size), consts)
            )

        _MINHASH_UDFS[key] = f
    return _MINHASH_UDFS[key]


def with_minhash(
    df: DataFrame, text_col: str = "text", out: str = "minhash", n_perm: int = 16, shingle_size: int = 5
) -> DataFrame:
    return df.withColumn(out, minhash_udf(n_perm, shingle_size)(F.col(text_col)))


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
    # shuffle-hash self-join (not broadcast): both sides then share one
    # identical Exchange, so ReusedExchange computes the whole
    # shingle→signature→band pipeline ONCE. Also the only viable shape
    # at 10^12 rows, where no side is broadcastable.
    left = buckets.hint("shuffle_hash").alias("l")
    right = buckets.hint("shuffle_hash").alias("r")
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
    """Full MinHash-LSH pipeline: shingle → hash once → signature →
    band-bucket join → exact-Jaccard verification of candidates only.

    Verification runs over the hashed shingle sets (64-bit collisions
    are negligible) and only for documents that appear in a candidate
    pair — a semi-join prunes the corpus before the shingle arrays are
    recomputed, so the expensive array shuffle is proportional to the
    candidate set, not the corpus."""
    hs = df.select(
        F.col(id_col),
        shingle_hash_udf(shingle_size)(F.col(text_col)).alias("shingle_hs"),
    )
    # NB: the candidate pipeline appears three times in the static plan
    # (verify join + both semi-join sides), but the shuffle_hash hint
    # makes the three band-join Exchanges canonically identical, so AQE
    # computes the shuffle once and ReusedExchange serves the rest —
    # measured equivalent to (and cold-path faster than) persisting the
    # intermediates, without holding executor storage across queries.
    sigs = df.select(
        F.col(id_col), minhash_udf(n_perm, shingle_size)(F.col(text_col)).alias("minhash")
    )
    cand = lsh_candidate_pairs(sigs, id_col=id_col, bands=bands)
    ids_a = cand.select(F.col("id_a").alias(id_col)).distinct()
    ids_b = cand.select(F.col("id_b").alias(id_col)).distinct()
    a = hs.join(ids_a, id_col, "semi").select(
        F.col(id_col).alias("id_a"), F.col("shingle_hs").alias("sh_a")
    )
    b = hs.join(ids_b, id_col, "semi").select(
        F.col(id_col).alias("id_b"), F.col("shingle_hs").alias("sh_b")
    )
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


def _bit_weights(n_bits: int) -> Column:
    # literal [1, 2, 4, ..., 2^62, MIN_LONG]: weight of bit j as a signed
    # long (bit 63 is the two's-complement sign bit)
    ws = [(1 << j) if j < 63 else -(1 << 63) for j in range(n_bits)]
    return F.array(*[F.lit(w).cast("long") for w in ws])


def simhash64_from_hashes(hashes: Column, n_bits: int = 64) -> Column:
    """64-bit SimHash over pre-hashed shingles, entirely JVM-side
    integer ops: one ``aggregate`` pass accumulates per-bit set counts
    (``h & 2^j != 0`` via ``zip_with`` against a literal powers array),
    then a second ``zip_with`` packs the majority votes back into a
    long. Deliberately a COMPACT expression tree — an unrolled
    per-bit-filter variant is the same arithmetic but ~10x the
    generated code, and Janino compile time dominates at that size."""
    weights = _bit_weights(n_bits)
    zero = F.array_repeat(F.lit(0).cast("long"), n_bits)
    counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            weights,
            lambda a, w: a
            + F.when(h.bitwiseAND(w) != 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
        ),
    )
    n = F.size(hashes)
    votes = F.zip_with(
        counts, weights, lambda c, w: F.when(c * 2 > n, w).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(votes, F.lit(0).cast("long"), lambda acc, v: acc + v)


def simhash64(text: Column, shingle_size: int = 4, n_bits: int = 64) -> Column:
    return simhash64_from_hashes(shingle_hashes(char_ngrams(text, shingle_size)), n_bits)


def _simhash_row(h: np.ndarray, shifts: np.ndarray) -> int:
    if len(h) == 0:
        return 0
    hu = h.astype(np.uint64)
    bits = ((hu[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
    maj = (bits * 2 > len(hu)).astype(np.uint64)
    return int(np.int64((maj << shifts).sum(dtype=np.uint64).astype(np.int64)))


@F.pandas_udf(T.LongType())
def _simhash_text_udf(text: pd.Series) -> pd.Series:
    """text → 64-bit SimHash, Arrow-batched numpy end-to-end.

    Rationale (measured on this host): materializing shingle substrings
    JVM-side costs ~10us/shingle; the unrolled Column vote is fast to
    run but takes >10s to Janino-compile; the compact HOF vote compiles
    fast but evaluates interpreted. A cache-resident ~300x64 numpy
    matrix per row beats all three by an order of magnitude.
    """
    shifts = np.arange(64, dtype=np.uint64)
    return _norm_texts(text).map(lambda t: _simhash_row(_shingle_hash_row(t, 4), shifts))


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    return df.withColumn(out, _simhash_text_udf(F.col(text_col)))


def simhash_near_duplicates(
    df: DataFrame, id_col: str = "doc_id", simhash_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ k on SimHash: band the 64
    bits into ``max_hamming + 1`` chunks — the pigeonhole guarantee
    (d ≤ k over k+1 disjoint chunks ⇒ at least one chunk untouched)
    REQUIRES the chunk count to track k; a fixed 4-way split silently
    loses recall for k > 3. Join per chunk, verify with bit_count(xor)."""
    n_chunks = max(1, min(16, max_hamming + 1))
    # as-equal-as-possible chunk widths covering all 64 bits
    base_w, extra = divmod(64, n_chunks)
    fp = F.col(simhash_col)
    parts, off = [], 0
    for c in range(n_chunks):
        w = base_w + (1 if c < extra else 0)
        mask = (1 << w) - 1
        parts.append(
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftrightunsigned(fp, off).bitwiseAND(F.lit(mask).cast("long")).alias("chunk"),
            )
        )
        off += w
    chunks = F.array(*parts)
    buckets = df.select(F.col(id_col), fp.alias("fp"), F.explode(chunks).alias("c")).select(
        id_col, "fp", "c.chunk_id", "c.chunk"
    )
    # shuffle-hash self-join → identical Exchanges → the SimHash
    # fingerprint pipeline is computed once and reused (see
    # lsh_candidate_pairs); broadcast would recompute it per side
    l, r = buckets.hint("shuffle_hash").alias("l"), buckets.hint("shuffle_hash").alias("r")
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
