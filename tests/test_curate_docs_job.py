"""End-to-end text curation job (jobs/curate_docs.py): PII scrub +
quality/lang/repetition gating + normalized and edit-verified dedup
compose correctly, outputs commit through the manifest, and a rerun is
a no-op."""

import pytest
from pyspark.sql import functions as F

from jobs.curate_docs import curate, main


_STOPS = ["the", "of", "is", "it", "was", "in", "and", "a", "for", "they", "with", "on", "as", "that"]


def _good(i: int) -> str:
    """An English-looking doc whose content words are unique per doc,
    ALTERNATING with stopwords so no 4 consecutive words are shared
    across docs (cross-doc 4-gram Jaccard = 0 — the docs are genuinely
    distinct to the blocker); passes quality (length, alpha, stopwords)
    and repetition gates."""
    words = []
    for j in range(15):
        words += [f"u{i}w{j}", _STOPS[j % len(_STOPS)]]
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(6):
        rows.append((i, _good(i), "s0" if i % 2 == 0 else "s1"))
    # 10: near-duplicate of doc 0 (one content word edited)
    rows.append((10, _good(0).replace("u0w3", "edited"), "s0"))
    # 11: case/punct duplicate of doc 1
    rows.append((11, _good(1).upper() + "!!!", "s1"))
    # 12: PII-bearing good doc
    rows.append((12, _good(7) + " contact me at jane@example.com today", "s0"))
    # 13: repetitive spam with stopwords (passes lang, fails repetition)
    rows.append((13, "the offer " * 30, "s1"))
    # 14: French (fails the lang gate)
    rows.append(
        (14, "le chat est dans la maison et il est content avec le chien pour la vie", "s0")
    )
    # 15: too short / low quality
    rows.append((15, "x", "s1"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_composition(spark, corpus):
    curated, _ = curate(spark, corpus)
    got = {r["doc_id"]: r for r in curated.collect()}
    ids = set(got)
    # gates
    assert 13 not in ids  # repetition spam
    assert 14 not in ids  # language
    assert 15 not in ids  # quality
    # near-dup pair (0, 10): canonical min id survives
    assert 0 in ids and 10 not in ids
    # normalized dup pair (1, 11): min id survives
    assert 1 in ids and 11 not in ids
    # remaining good docs survive
    assert {2, 3, 4, 5, 12} <= ids
    # PII scrubbed in the surviving text
    assert "<EMAIL>" in got[12]["text"] and "jane@example.com" not in got[12]["text"]
    assert got[12]["n_email"] == 1


def test_curate_no_dedup_keeps_near_dups(spark, corpus):
    curated, _ = curate(spark, corpus, dedup=False)
    ids = {r["doc_id"] for r in curated.collect()}
    assert 10 in ids  # near-dup survives without the clustering stage
    assert 11 not in ids  # normalized EXACT dedup still applies


def test_job_main_with_manifest_resume(spark, corpus, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated_out")
    man = str(tmp_path / "manifest")
    corpus.write.partitionBy("source").parquet(src)

    assert main(["--docs", src, "--out", out, "--manifest", man]) == 0
    from jschon_spark import manifest as mf

    curated = spark.read.parquet(f"{out}/curated")
    committed = mf.read_committed(spark, man, curated, partition_col="_part_id")
    n1 = committed.count()
    assert n1 == 7  # docs 0-5 + 12; near-dup 10 and normalized-dup 11 collapsed

    # rerun: manifest complete, no new rows appended
    assert main(["--docs", src, "--out", out, "--manifest", man]) == 0
    assert spark.read.parquet(f"{out}/curated").count() == n1
