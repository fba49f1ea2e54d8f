"""Product quantization: codebook fit, encode geometry, ADC scoring
math (pinned against a pure-numpy replica), recall vs brute force, and
plan shape (encode map-only; candidate cut is a TakeOrdered, not a
full sort)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jschon_spark.operators import pq, similarity


def _clustered(rng, n_centers=6, per=60, dim=16):
    centers = rng.normal(size=(n_centers, dim)) * 4
    return np.vstack([c + rng.normal(size=(per, dim)) for c in centers]).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(22)
    pts = _clustered(rng)
    pdf = pd.DataFrame({"vec_id": range(len(pts)), "embedding": list(pts)})
    df = spark.createDataFrame(pdf)
    books = pq.pq_fit(df, m=4, sample_n=1000, iters=10)
    coded = pq.with_pq_codes(df, books).cache()
    coded.count()
    return pts, df, books, coded


def test_fit_shape_and_determinism(spark, corpus):
    pts, df, books, _ = corpus
    assert books.shape == (4, 256, 4)
    again = pq.pq_fit(df, m=4, sample_n=1000, iters=10)
    np.testing.assert_allclose(books, again)


def test_encode_matches_numpy(corpus):
    """Distributed codes == plain-numpy nearest-centroid per subspace."""
    pts, _, books, coded = corpus
    got = (
        coded.select("vec_id", "pq_code").toPandas().set_index("vec_id").sort_index()
    )
    m, _, dsub = books.shape
    for i in [0, 57, 200, 359]:
        v = pts[i].astype(np.float64)
        expect = [
            int(
                np.argmin(
                    ((books[j] - v[j * dsub : (j + 1) * dsub]) ** 2).sum(1)
                )
            )
            for j in range(m)
        ]
        assert list(got.loc[i, "pq_code"]) == expect


def test_norm_column(corpus):
    pts, _, _, coded = corpus
    got = coded.select("vec_id", "vnorm").toPandas().set_index("vec_id")
    np.testing.assert_allclose(
        got.loc[5, "vnorm"], np.linalg.norm(pts[5].astype(np.float64)), rtol=1e-5
    )


def test_adc_score_matches_table_lookup(corpus):
    pts, _, books, coded = corpus
    q = pts[100].astype(np.float64)
    m, _, dsub = books.shape
    table = np.stack([books[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)])
    score = pq.adc_score_udf(books, q)
    got = (
        coded.select("vec_id", score(F.col("pq_code")).alias("s"))
        .toPandas()
        .set_index("vec_id")
    )
    codes = coded.select("vec_id", "pq_code").toPandas().set_index("vec_id")
    for i in [0, 100, 250]:
        expect = sum(table[j][codes.loc[i, "pq_code"][j]] for j in range(m))
        assert got.loc[i, "s"] == pytest.approx(expect, rel=1e-12)
        # ADC approximates the true dot product
        true_dot = float(pts[i].astype(np.float64) @ q)
        assert got.loc[i, "s"] == pytest.approx(true_dot, rel=0.35, abs=2.0)


def test_pq_topk_recall(corpus):
    pts, df, books, coded = corpus
    rng = np.random.default_rng(7)
    query = (pts[200] + rng.normal(size=16) * 0.01).tolist()
    got = [r["vec_id"] for r in pq.pq_topk(coded, books, query, k=10).collect()]
    exact = [r["vec_id"] for r in similarity.brute_force_topk(df, query, k=10).collect()]
    # 4x-rescore ADC candidates + exact re-rank: high recall on
    # clustered data (same gate shape as the int8 path)
    assert len(set(got) & set(exact)) >= 8
    assert got[0] == exact[0] == 200


def test_null_vectors_skipped(spark, corpus):
    pts, _, books, _ = corpus
    pdf = pd.DataFrame(
        {"vec_id": [0, 1], "embedding": [None, list(map(float, pts[0]))]}
    )
    df = spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<double>"
    )
    coded = pq.with_pq_codes(df, books)
    rows = coded.toPandas().set_index("vec_id")
    assert rows.loc[0, "pq_code"] is None
    assert rows.loc[1, "pq_code"] is not None
    out = pq.pq_topk(coded, books, list(map(float, pts[0])), k=2).toPandas()
    assert list(out["vec_id"]) == [1]


def test_candidate_cut_is_take_ordered(corpus):
    """The rescore_factor*k global cut must plan as TakeOrdered (heap
    top-k per partition + driver merge), not a full Exchange+Sort."""
    pts, _, books, coded = corpus
    plan = (
        pq.pq_topk(coded, books, list(map(float, pts[0])), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------- IVF-PQ


def test_ivfpq_recall_and_pruning(spark, tmp_path, corpus):
    """IVF-PQ on clustered data: recall@10 vs exact L2 brute force,
    probes read ONLY the nprobe partitions (PartitionFilters in the
    plan), and the layout is one file tree per list."""
    pts, df, _, _ = corpus
    path = str(tmp_path / "ivfpq")
    pq.write_ivfpq_index(df, path, n_lists=12, m=4, sample_rows=1000)

    rng = np.random.default_rng(11)
    query = (pts[100] + rng.normal(size=16) * 0.01).astype(np.float64)

    got_df = pq.ivfpq_topk(spark, path, list(query), k=10, nprobe=4)
    got = [r["vec_id"] for r in got_df.collect()]

    # exact L2 ground truth
    d = ((pts.astype(np.float64) - query[None, :]) ** 2).sum(1)
    exact = list(np.argsort(d)[:10])
    assert len(set(got) & set(exact)) >= 8, (got, exact)
    assert got[0] == exact[0] == 100

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_ivfpq_meta_and_determinism(spark, tmp_path, corpus):
    import json
    import os

    pts, df, _, _ = corpus
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    pq.write_ivfpq_index(df, p1, n_lists=8, m=4, sample_rows=1000)
    pq.write_ivfpq_index(df, p2, n_lists=8, m=4, sample_rows=1000)
    m1 = json.load(open(os.path.join(p1, "_ivfpq_meta.json")))
    m2 = json.load(open(os.path.join(p2, "_ivfpq_meta.json")))
    assert m1["centroids"] == m2["centroids"]
    assert m1["codebooks"] == m2["codebooks"]
    a = spark.read.parquet(p1).select("vec_id", "list_id", "pq_code").toPandas()
    b = spark.read.parquet(p2).select("vec_id", "list_id", "pq_code").toPandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert (a["list_id"] == b["list_id"]).all()
    assert all(list(x) == list(y) for x, y in zip(a["pq_code"], b["pq_code"]))
