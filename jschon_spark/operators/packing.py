"""Sequence packing for training-data pipelines.

Pretraining consumes fixed-length token sequences (e.g. 8192 tokens);
the corpus arrives as variable-length documents.  Packing assigns every
document a position in some sequence with minimal padding waste.  A
single global pack is inherently sequential, so both operators here
shard the corpus into ``n_buckets`` INDEPENDENT streams by a stable
hash of the document key — the bucket is the unit of parallelism and
of determinism: results depend only on (key, tokens, budget, salt),
never on partitioning or row order, and each bucket's pack is
reproducible in any engine that can evaluate md5 (the DuckDB oracle
runs the identical window arithmetic).

Two strategies, matching the two packing disciplines in real pipelines:

- ``pack_concat_chop``: the GPT-style discipline — concatenate the
  bucket's token stream in a deterministic hash order and chop it at
  every ``budget`` boundary.  Zero padding waste by construction;
  documents may straddle a boundary (emitted as ``seq_first`` /
  ``seq_last`` / ``offset_in_seq`` so the reader can split).  Pure
  window arithmetic over one bucket-keyed shuffle; fully
  SQL-expressible, so it carries a DuckDB oracle.

- ``pack_first_fit``: the no-split discipline (finetuning / eval) —
  first-fit-decreasing bin packing per bucket (guaranteed ≤ 11/9·OPT+1
  bins), documents never straddle, oversize documents get flagged
  singleton bins.  Sequential per bucket, hence an Arrow-batched
  ``applyInPandas`` grouped stage; the 100 TB story is the bucket
  count: size ``n_buckets`` so one bucket's (key, tokens) pairs — a
  few dozen bytes/doc — fit one task's memory, e.g. 10^5 buckets for
  10^11 docs.

At 100 TB the bucket-keyed exchange shuffles only (key, tokens) —
payload columns stay where they are and re-join the plan by key
afterwards, exactly like dedup's anti-join discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jschon_spark.operators.sampling import hash_coin


def _bucket(key: Column, n_buckets: int, salt: str) -> Column:
    """Engine-portable stable bucket: int value of 4 hex chars of md5.

    ``conv(hex,16,10)`` here ≡ ``CAST('0x'||hex AS INTEGER)`` in
    DuckDB — both yield the same uint16, so the oracle reconstructs
    the exact same streams."""
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit("|" + salt))), 1, 4)
    return (F.conv(h, 16, 10).cast("int") % n_buckets).alias("bucket")


def pack_concat_chop(
    df: DataFrame,
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 8192,
    n_buckets: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chop packing plan: one row per document with its
    placement in the bucket's chopped token stream.

    Output columns: key, ``bucket``, ``n_tokens``, ``start_off``
    (exclusive prefix sum within the bucket stream), ``seq_first`` /
    ``seq_last`` (the budget-sized sequences the document touches),
    ``offset_in_seq`` (position within seq_first) and ``straddles``.
    Zero-token documents occupy no stream space (seq_last < seq_first
    is avoided by clamping to seq_first).

    One exchange (the bucket window); everything else is codegen'd
    integer arithmetic.  Deterministic order within a bucket is the
    hash coin itself (ties broken by key), so appends re-pack only via
    an explicit salt change — same discipline as sampling.py.
    """
    if budget <= 0 or n_buckets <= 0:
        raise ValueError("budget and n_buckets must be positive")
    coin = hash_coin(F.col(key_col), salt)
    base = df.select(
        F.col(key_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        _bucket(F.col(key_col), n_buckets, salt),
        coin.alias("ord_"),
    )
    w = Window.partitionBy("bucket").orderBy("ord_", key_col)
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_off")
    out = base.select(key_col, "bucket", "n_tokens", start)
    seq_first = (F.col("start_off") / budget).cast("long")
    last_tok = F.col("start_off") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    seq_last = F.greatest((last_tok / budget).cast("long"), seq_first)
    return out.select(
        key_col,
        "bucket",
        "n_tokens",
        "start_off",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (F.col("start_off") % budget).alias("offset_in_seq"),
        (seq_last > seq_first).alias("straddles"),
    )


_FF_SCHEMA = (
    "{key} {ktype}, bucket int, n_tokens long, bin_idx long, bin_fill long, oversize boolean"
)


def pack_first_fit(
    df: DataFrame,
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 8192,
    n_buckets: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """First-fit-decreasing packing per bucket — documents never split.

    Output: key, ``bucket``, ``n_tokens``, ``bin_idx`` (per-bucket bin
    number, descending-size first-fit), ``bin_fill`` (the bin's total
    after packing) and ``oversize`` (tokens > budget: the document
    gets a singleton bin and the flag; the caller decides to chop or
    drop).  ``bin_fill <= budget`` holds for every non-oversize bin.

    Per-bucket work is O(n log n) in that bucket's row count via a
    fill-ordered bisect over open bins; ties (equal sizes) break on
    the hash coin then key, so the pack is partition/order independent.
    """
    if budget <= 0 or n_buckets <= 0:
        raise ValueError("budget and n_buckets must be positive")
    ktype = dict(df.dtypes)[key_col]
    schema = _FF_SCHEMA.format(key=key_col, ktype=ktype)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(
            ["n_tokens", "ord_", key_col], ascending=[False, True, True]
        ).reset_index(drop=True)
        n = len(pdf)
        toks = pdf["n_tokens"].to_numpy()
        bin_idx = np.empty(n, dtype=np.int64)
        oversize = toks > budget
        # open bins kept sorted by REMAINING capacity; first-fit picks
        # the lowest-numbered bin that fits, which under FFD is
        # equivalent to any fitting bin for the bound — we use
        # best-fit-decreasing (tightest fitting bin) for better fills
        rema: list[int] = []  # sorted remaining capacities
        rid: list[int] = []  # bin id aligned with rema
        fills: list[int] = []
        for i in range(n):
            t = int(toks[i])
            if t > budget:
                bin_idx[i] = len(fills)
                fills.append(t)
                continue
            j = bisect.bisect_left(rema, t)
            if j < len(rema):
                b = rid.pop(j)
                r = rema.pop(j) - t
                fills[b] += t
                if r > 0:
                    k = bisect.bisect_left(rema, r)
                    rema.insert(k, r)
                    rid.insert(k, b)
                bin_idx[i] = b
            else:
                b = len(fills)
                fills.append(t)
                bin_idx[i] = b
                r = budget - t
                if r > 0:
                    k = bisect.bisect_left(rema, r)
                    rema.insert(k, r)
                    rid.insert(k, b)
        fill_arr = np.asarray(fills, dtype=np.int64)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "bucket": pdf["bucket"],
                "n_tokens": pdf["n_tokens"],
                "bin_idx": bin_idx,
                "bin_fill": fill_arr[bin_idx],
                "oversize": oversize,
            }
        )

    base = df.select(
        F.col(key_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        _bucket(F.col(key_col), n_buckets, salt),
        hash_coin(F.col(key_col), salt).alias("ord_"),
    )
    return base.groupBy("bucket").applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Utilization rollup for a ``pack_first_fit`` result: per-bucket
    bin count, token totals, and padding waste fraction (excluding
    oversize singleton bins, which carry no padding decision)."""
    bins = (
        packed.where(~F.col("oversize"))
        .groupBy("bucket", "bin_idx")
        .agg(F.first("bin_fill").alias("fill"))
    )
    return bins.groupBy("bucket").agg(
        F.count("*").alias("n_bins"),
        F.sum("fill").alias("n_tokens"),
        F.round(1 - F.sum("fill") / (F.count("*") * F.lit(budget)), 4).alias(
            "waste_frac"
        ),
    )
