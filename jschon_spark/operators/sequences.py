"""Training-sequence assembly: turn per-document token-id arrays into
fixed-length packed sequences (the materialization step behind
packing.pack_concat_chop's placement plan).

``pack_concat_chop`` answers "where does each document land"; this
module actually BUILDS the ``input_ids`` rows a trainer consumes:

    docs ──(ids)──► placement window ──explode──► per-(doc, seq) piece
         ──groupBy (bucket, seq)──► flatten ordered pieces ──► sequence

Design-for-10^12-docs properties:
- the hash bucket is the unit of determinism, parallelism AND resume:
  each bucket's token stream is an independent function of only the
  keys hashed into it (md5 coin order, same discipline as
  sampling.py), so buckets can be packed, committed, and re-driven
  independently (jobs/pack_docs.py leans on this);
- ONE exchange: the bucket window hash-partitions by ``bucket``; the
  following groupBy (bucket, seq_idx) is satisfied by that
  partitioning (grouping keys ⊇ partition keys), so Catalyst plans no
  second shuffle — asserted in tests/test_sequences.py;
- everything is built-in Column algebra (sequence/slice/flatten/
  array_sort) — no Python in the hot path; the only UDF in this file
  is the optional real-vocabulary id lookup (Arrow-batched);
- the whole pipeline is engine-portable: with hash-derived token ids
  the driver query ``training_packed_sequences`` is replayed
  token-for-token by DuckDB (same md5 order, same window cumsum, same
  slices) — an exact oracle for the assembled sequences themselves.

Reference scope note: handrews/jschon (pure JSON Schema validation,
jschon/jsonschema.py) has no training-data surface; this extends the
pipeline family the brief mandates beyond reference parity.
"""

from __future__ import annotations

from typing import Mapping, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from jschon_spark.operators.packing import _bucket
from jschon_spark.operators.sampling import hash_coin
from jschon_spark.operators.text import words_col

# Engine-portable token ids: 16-bit value of the first 4 md5 hex chars
# (DuckDB: CAST(('0x' || substr(md5(w), 1, 4)) AS INTEGER)).
# A REAL vocabulary goes through vocab_ids_udf instead.


def hash_token_ids(text: Column) -> Column:
    """array<int> of md5-derived ids for the whitespace tokens of
    ``text`` — SQL-portable (an external engine reproduces the exact
    ids), used by the oracle-checked driver query. Not a tokenizer;
    the ids are stand-ins with realistic cardinality (2^16)."""
    return F.transform(
        words_col(text),
        lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("int"),
    )


def vocab_ids_udf(vocab: Mapping[str, int], unk_id: int = 0):
    """Arrow-batched real-vocabulary lookup: array<string> tokens →
    array<int> ids. The dict rides task-broadcast once per executor
    (a 32k-entry vocab is ~1 MB); per batch it's one Python dict hit
    per token — the classic post-BPE id-ing step."""
    v = dict(vocab)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def ids(tokens: pd.Series) -> pd.Series:
        def one(toks):
            if toks is None:
                return None
            return [v.get(t, unk_id) for t in toks]

        return tokens.map(one)

    return ids


def assemble_sequences(
    df: DataFrame,
    key_col: str = "doc_id",
    ids_col: str = "token_ids",
    budget: int = 512,
    n_buckets: int = 64,
    salt: str = "pack-v1",
    pad_id: Optional[int] = None,
) -> DataFrame:
    """Concat-and-chop the corpus token stream into ``budget``-length
    sequences, materialized as ``input_ids`` arrays.

    Placement is IDENTICAL to packing.pack_concat_chop (same bucket
    hash, same md5 ordering coin, same window cumsum — parity is
    pytest-pinned), so the plan query and the materialization never
    disagree. Output, one row per (bucket, seq_idx):

    - ``input_ids``     array<int>, length == budget for complete
                        sequences; the tail sequence of each bucket is
                        shorter (padded to budget with ``pad_id`` when
                        given, and then ``n_real`` still reports the
                        unpadded length)
    - ``n_real``        real (unpadded) token count
    - ``n_docs``        documents contributing to the sequence
    - ``complete``      n_real == budget
    """
    if budget <= 0 or n_buckets <= 0:
        raise ValueError("budget and n_buckets must be positive")
    base = df.select(
        F.col(key_col).alias("key_"),
        F.col(ids_col).alias("ids_"),
        F.size(F.col(ids_col)).cast("long").alias("n_tokens"),
        _bucket(F.col(key_col), n_buckets, salt),
        hash_coin(F.col(key_col), salt).alias("ord_"),
    ).where(F.col("n_tokens") > 0)
    w = Window.partitionBy("bucket").orderBy("ord_", "key_")
    placed = base.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    seq_first = (F.col("start_off") / budget).cast("long")
    seq_last = ((F.col("start_off") + F.col("n_tokens") - 1) / budget).cast("long")
    pieces = placed.select(
        "bucket",
        "start_off",
        "n_tokens",
        "ids_",
        F.explode(F.sequence(seq_first, seq_last)).alias("seq_idx"),
    )
    seq_lo = F.col("seq_idx") * budget  # stream offset where this sequence starts
    piece_from = F.greatest(seq_lo - F.col("start_off"), F.lit(0))  # 0-based in doc
    piece_upto = F.least(
        (F.col("seq_idx") + 1) * F.lit(budget), F.col("start_off") + F.col("n_tokens")
    ) - F.col("start_off")
    pieces = pieces.select(
        "bucket",
        "seq_idx",
        F.greatest(F.col("start_off") - seq_lo, F.lit(0)).alias("pos_in_seq"),
        F.slice(
            F.col("ids_"), (piece_from + 1).cast("int"), (piece_upto - piece_from).cast("int")
        ).alias("piece"),
    )
    sorted_pieces = F.array_sort(
        F.collect_list(F.struct(F.col("pos_in_seq"), F.col("piece")))
    )
    grouped = pieces.groupBy("bucket", "seq_idx").agg(
        F.flatten(F.transform(sorted_pieces, lambda s: s["piece"])).alias("input_ids"),
        # per-document boundaries within the sequence — what a trainer
        # needs for block-diagonal attention / loss masking across
        # packed documents (start offset + length of each contribution,
        # in order)
        F.transform(
            sorted_pieces,
            lambda s: F.struct(
                s["pos_in_seq"].cast("int").alias("start"),
                F.size(s["piece"]).alias("len"),
            ),
        ).alias("doc_spans"),
        F.count(F.lit(1)).cast("int").alias("n_docs"),
    )
    out = grouped.select(
        "bucket",
        "seq_idx",
        "input_ids",
        "doc_spans",
        F.size("input_ids").alias("n_real"),
        "n_docs",
        (F.size("input_ids") == budget).alias("complete"),
    )
    if pad_id is not None:
        out = out.withColumn(
            "input_ids",
            F.concat(
                F.col("input_ids"),
                F.array_repeat(
                    F.lit(int(pad_id)), F.lit(budget) - F.size("input_ids")
                ),
            ),
        )
    return out
