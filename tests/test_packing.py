"""Sequence packing: concat-chop placement math against an independent
pandas recomputation of the hash-ordered stream, first-fit-decreasing
bin invariants (capacity, FFD bound, oversize isolation), determinism
across partitionings, and the one-exchange plan shape."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.packing import (
    pack_concat_chop,
    pack_first_fit,
    packing_stats,
)

BUDGET = 100


def coin(key, salt="pack-v1"):
    return hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:8]


def bucket_of(key, n_buckets, salt="pack-v1"):
    return int(hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:4], 16) % n_buckets


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.Generator(np.random.PCG64(11))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "n_tokens": rng.integers(0, 150, 500).astype(np.int64),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def reference_chop(pdf, budget, n_buckets):
    """Independent pandas recomputation of the concat-chop placement."""
    rows = []
    work = pdf.copy()
    work["bucket"] = [bucket_of(k, n_buckets) for k in work["doc_id"]]
    work["ord_"] = [coin(k) for k in work["doc_id"]]
    for b, grp in work.groupby("bucket"):
        grp = grp.sort_values(["ord_", "doc_id"])
        off = 0
        for _, r in grp.iterrows():
            t = int(r["n_tokens"])
            sf = off // budget
            sl = max((off + max(t - 1, 0)) // budget, sf)
            rows.append((int(r["doc_id"]), int(b), t, off, sf, sl, off % budget, sl > sf))
            off += t
    return sorted(rows)


def test_concat_chop_matches_reference(docs, spark):
    pdf, df = docs
    got = sorted(
        tuple(r) for r in pack_concat_chop(
            df, budget=BUDGET, n_buckets=4
        ).collect()
    )
    assert got == reference_chop(pdf, BUDGET, 4)


def test_concat_chop_partition_independent(docs, spark):
    pdf, df = docs
    a = sorted(tuple(r) for r in pack_concat_chop(df.repartition(13), budget=BUDGET, n_buckets=4).collect())
    b = sorted(tuple(r) for r in pack_concat_chop(df.coalesce(1), budget=BUDGET, n_buckets=4).collect())
    assert a == b


def test_concat_chop_stream_is_dense(docs, spark):
    pdf, df = docs
    out = pack_concat_chop(df, budget=BUDGET, n_buckets=4).toPandas()
    for b, grp in out.groupby("bucket"):
        grp = grp.sort_values("start_off")
        expect = np.concatenate([[0], grp["n_tokens"].cumsum().to_numpy()[:-1]])
        assert (grp["start_off"].to_numpy() == expect).all()
        # zero-waste: total stream length == total tokens
        assert grp["n_tokens"].sum() == grp["start_off"].iloc[-1] + grp["n_tokens"].iloc[-1]


def test_concat_chop_zero_token_rows(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 50), (3, 0)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r for r in pack_concat_chop(df, budget=BUDGET, n_buckets=1).collect()}
    for k in (1, 3):
        assert out[k]["seq_first"] == out[k]["seq_last"]
        assert not out[k]["straddles"]


def test_concat_chop_straddle_math(spark):
    # single bucket, fixed stream: offsets 0..; a doc crossing the
    # budget boundary reports both sequences and its in-seq offset
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 100)], "doc_id long, n_tokens long"
    )
    out = pack_concat_chop(df, budget=BUDGET, n_buckets=1).toPandas()
    out = out.sort_values("start_off")
    straddlers = out[out["straddles"]]
    for _, r in straddlers.iterrows():
        assert r["start_off"] // BUDGET == r["seq_first"]
        assert (r["start_off"] + r["n_tokens"] - 1) // BUDGET == r["seq_last"]
        assert r["offset_in_seq"] == r["start_off"] % BUDGET
    # 220 total tokens -> stream touches seqs 0..2 with no gaps
    assert out["seq_last"].max() == 2


def test_concat_chop_single_exchange(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("n_tokens")
    )
    plan = (
        pack_concat_chop(df, budget=BUDGET, n_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_concat_chop_rejects_bad_params(spark):
    df = spark.range(1).select(F.col("id").alias("doc_id"), F.lit(5).alias("n_tokens"))
    with pytest.raises(ValueError):
        pack_concat_chop(df, budget=0)
    with pytest.raises(ValueError):
        pack_concat_chop(df, n_buckets=0)


# -------------------------------------------------------------- first fit


def test_first_fit_capacity_and_coverage(docs, spark):
    pdf, df = docs
    out = pack_first_fit(df, budget=BUDGET, n_buckets=4).toPandas()
    assert len(out) == len(pdf)  # every doc placed exactly once
    ok = out[~out["oversize"]]
    # non-oversize bins respect the budget
    fills = ok.groupby(["bucket", "bin_idx"])["n_tokens"].sum()
    assert (fills <= BUDGET).all()
    assert (ok["bin_fill"] <= BUDGET).all()
    # bin_fill is consistent with the bin's member sum
    merged = ok.merge(
        fills.rename("sum_fill").reset_index(), on=["bucket", "bin_idx"]
    )
    assert (merged["bin_fill"] == merged["sum_fill"]).all()


def test_first_fit_oversize_isolated(spark):
    df = spark.createDataFrame(
        [(1, 250), (2, 40), (3, 40), (4, 250)], "doc_id long, n_tokens long"
    )
    out = pack_first_fit(df, budget=BUDGET, n_buckets=1).toPandas()
    big = out[out["oversize"]]
    assert set(big["doc_id"]) == {1, 4}
    # oversize docs sit alone in their bins
    for _, r in big.iterrows():
        assert (out["bin_idx"] == r["bin_idx"]).sum() == 1
    assert (big["bin_fill"] == 250).all()


def test_first_fit_ffd_bound(docs, spark):
    pdf, df = docs
    out = pack_first_fit(df, budget=BUDGET, n_buckets=4).toPandas()
    ok = out[~out["oversize"]]
    for b, grp in ok.groupby("bucket"):
        n_bins = grp["bin_idx"].nunique()
        lower = math.ceil(grp["n_tokens"].sum() / BUDGET)
        assert n_bins <= math.ceil(lower * 11 / 9) + 1, (b, n_bins, lower)


def test_first_fit_partition_independent(docs, spark):
    pdf, df = docs
    a = sorted(tuple(r) for r in pack_first_fit(df.repartition(13), budget=BUDGET, n_buckets=4).collect())
    b = sorted(tuple(r) for r in pack_first_fit(df.coalesce(1), budget=BUDGET, n_buckets=4).collect())
    assert a == b


def test_packing_stats(docs, spark):
    pdf, df = docs
    packed = pack_first_fit(df, budget=BUDGET, n_buckets=4)
    stats = packing_stats(packed, BUDGET).toPandas()
    assert set(stats["bucket"]) <= {0, 1, 2, 3}
    assert (stats["waste_frac"] >= 0).all() and (stats["waste_frac"] < 1).all()
    # FFD at this size distribution packs tightly: <25% padding
    assert stats["waste_frac"].mean() < 0.25
