"""Sequence assembly: byte-exact agreement with a pure-Python replica
of the concat-and-chop stream, placement parity with
packing.pack_concat_chop, padding/tail semantics, the single-exchange
plan shape, and the id-mapping helpers."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jschon_spark.operators import sequences
from jschon_spark.operators.packing import pack_concat_chop

BUDGET = 16
BUCKETS = 4
SALT = "pack-v1"


def _coin(key: str) -> str:
    return hashlib.md5(f"{key}|{SALT}".encode()).hexdigest()[:8]


def _bucket(key: str) -> int:
    return int(hashlib.md5(f"{key}|{SALT}".encode()).hexdigest()[:4], 16) % BUCKETS


def _replica_streams(docs: dict[str, list[int]]) -> dict[int, list[int]]:
    """The ground-truth bucket streams: docs ordered by (coin, key),
    ids concatenated."""
    streams: dict[int, list[int]] = {b: [] for b in range(BUCKETS)}
    for key in sorted(docs, key=lambda k: (_coin(k), k)):
        if docs[key]:
            streams[_bucket(key)].extend(docs[key])
    return streams


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    docs = {
        f"d{i:03d}": [int(x) for x in rng.integers(0, 1000, rng.integers(1, 40))]
        for i in range(60)
    }
    docs["dempty"] = []  # zero-token doc must occupy no stream space
    pdf = pd.DataFrame(
        {"doc_id": list(docs), "token_ids": [list(v) for v in docs.values()]}
    )
    df = spark.createDataFrame(pdf, schema="doc_id string, token_ids array<int>")
    out = sequences.assemble_sequences(
        df, budget=BUDGET, n_buckets=BUCKETS, salt=SALT
    ).toPandas()
    return docs, df, out


def test_streams_match_python_replica(corpus):
    docs, _, out = corpus
    streams = _replica_streams(docs)
    for b in range(BUCKETS):
        rows = out[out["bucket"] == b].sort_values("seq_idx")
        got = [t for ids in rows["input_ids"] for t in ids]
        assert got == streams[b], f"bucket {b} stream mismatch"
        # seq indices are dense from 0 and sized to the stream
        assert list(rows["seq_idx"]) == list(range(len(rows)))
        for _, r in rows.iterrows():
            assert r["n_real"] == len(r["input_ids"])
            assert r["complete"] == (r["n_real"] == BUDGET)
        # every sequence but the bucket tail is complete
        assert rows["complete"].iloc[:-1].all() if len(rows) else True


def test_placement_parity_with_pack_plan(corpus, spark):
    """assemble_sequences and pack_concat_chop must agree on where each
    document starts (same coin, bucket, cumsum)."""
    docs, df, out = corpus
    plan = pack_concat_chop(
        df.withColumn("n_tokens", F.size("token_ids")),
        key_col="doc_id",
        tokens_col="n_tokens",
        budget=BUDGET,
        n_buckets=BUCKETS,
        salt=SALT,
    ).toPandas()
    streams = _replica_streams(docs)
    for _, r in plan[plan["n_tokens"] > 0].iterrows():
        b, off, key = int(r["bucket"]), int(r["start_off"]), r["doc_id"]
        assert streams[b][off : off + len(docs[key])] == docs[key], key


def test_n_docs_counts_contributors(corpus):
    docs, _, out = corpus
    total = sum(
        (len(v) > 0)
        * (  # number of sequences the doc touches = seq_last-seq_first+1
            1
        )
        for v in docs.values()
    )
    # sum of n_docs == sum over docs of sequences touched
    streams = _replica_streams(docs)
    touched = 0
    offsets = {b: 0 for b in range(BUCKETS)}
    for key in sorted(docs, key=lambda k: (_coin(k), k)):
        n = len(docs[key])
        if not n:
            continue
        b = _bucket(key)
        start = offsets[b]
        touched += (start + n - 1) // BUDGET - start // BUDGET + 1
        offsets[b] += n
    assert int(out["n_docs"].sum()) == touched


def test_pad_id(spark, corpus):
    docs, df, _ = corpus
    padded = sequences.assemble_sequences(
        df, budget=BUDGET, n_buckets=BUCKETS, salt=SALT, pad_id=-1
    ).toPandas()
    for _, r in padded.iterrows():
        assert len(r["input_ids"]) == BUDGET
        body, pad = r["input_ids"][: r["n_real"]], r["input_ids"][r["n_real"] :]
        assert all(t == -1 for t in pad)
        assert -1 not in body


def test_single_exchange_plan(spark, corpus):
    """The groupBy(bucket, seq_idx) must reuse the window's bucket
    partitioning: exactly ONE Exchange in the whole plan."""
    _, df, _ = corpus
    plan = (
        sequences.assemble_sequences(df, budget=BUDGET, n_buckets=BUCKETS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_hash_token_ids_portable(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["hello  world", "", None, "hello"]})
    )
    got = df.select(sequences.hash_token_ids(F.col("text")).alias("ids")).toPandas()
    hid = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:4], 16)
    assert list(got["ids"][0]) == [hid("hello"), hid("world")]
    assert list(got["ids"][1]) == []
    assert got["ids"][2] is None
    assert list(got["ids"][3]) == [hid("hello")]


def test_vocab_ids_udf(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"toks": [["a", "b", "zz"], None, []]}),
        schema="toks array<string>",
    )
    ids = sequences.vocab_ids_udf({"a": 5, "b": 7}, unk_id=0)
    got = df.select(ids(F.col("toks")).alias("ids")).toPandas()
    assert list(got["ids"][0]) == [5, 7, 0]
    assert got["ids"][1] is None
    assert list(got["ids"][2]) == []


def test_doc_spans_partition_sequences(corpus):
    """doc_spans tile each sequence contiguously: ordered, gap-free,
    summing to n_real, one span per contributing document — the
    block-diagonal attention-mask contract."""
    _, df, _ = corpus
    out = sequences.assemble_sequences(
        df, budget=BUDGET, n_buckets=BUCKETS, salt=SALT
    ).toPandas()
    for _, r in out.iterrows():
        spans = [(s["start"], s["len"]) for s in r["doc_spans"]]
        assert len(spans) == r["n_docs"]
        pos = 0
        for start, ln in spans:
            assert start == pos and ln > 0
            pos += ln
        assert pos == r["n_real"]
