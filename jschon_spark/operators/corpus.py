"""Corpus-level curation operators for training-data pipelines.

Cross-document signals that single-row text ops (text.py) cannot see:
boilerplate-phrase discovery (n-grams shared by many documents — the
CCNet/RefinedWeb-style repetition filter) and benchmark-contamination
reporting (n-gram overlap between the training corpus and a held-out
evaluation set — the standard decontamination step before training).

Like text.py, every operator here is deliberately expressible in ANSI
SQL so the DuckDB oracle can verify it value-for-value (driver
contract).  All hot-path logic is JVM-side ``pyspark.sql.functions``:
n-grams via HOFs (sequence/transform/slice), counting via hash
aggregation with map-side combine, phrase/benchmark lookup via
broadcast hash join.

100 TB notes (design points, each asserted in tests/test_corpus_ops.py
where plan-visible):

- The per-gram shuffle keys are the gram strings themselves (~20-40
  bytes for word 3/5-grams) — comparable to a 32-byte md5 hex key, so
  no pre-hashing step is needed for the shuffle, and the oracle stays
  value-exact.  The explode is map-side; partial aggregation
  (``partial_count``) collapses repeated grams before the exchange.
- ``boilerplate_phrases`` output and benchmark-gram sets are tiny
  relative to the corpus (bounded by vocabulary, further cut by
  ``min_docs`` / the benchmark's size), so the second pass joins them
  back **broadcast**; at 10^12 rows you would checkpoint the phrase
  table to parquet between the two passes instead of recomputing the
  upstream (both passes are declared here so Catalyst/AQE can reuse
  the exchange when the plan is run as one query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jschon_spark.operators.text import word_ngrams, words_col


def doc_ngrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, gram) pairs, one row per DISTINCT n-gram per document."""
    return df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )


def boilerplate_phrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 100,
) -> DataFrame:
    """Word n-grams appearing in at least ``min_docs`` DISTINCT
    documents — boilerplate/template phrases a curation pipeline strips
    or downweights.  ``doc_ngrams`` already emits each gram at most
    once per document (``word_ngrams`` is distinct-per-doc), so the
    document count is a plain ``count(*)`` — no count-distinct shuffle
    of (gram, id) pairs is needed."""
    return (
        doc_ngrams(df, text_col, id_col, n)
        .groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def with_boilerplate_fraction(
    df: DataFrame,
    phrases: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 100,
) -> DataFrame:
    """Per-document boilerplate load: of the document's distinct word
    n-grams, what fraction are corpus-boilerplate (per
    ``boilerplate_phrases``)?  Returns the input plus
    ``n_distinct_grams`` / ``boilerplate_grams`` / ``boilerplate_frac``.

    The phrase table is broadcast (bounded by ``min_docs``); the
    per-doc side needs one hash aggregation keyed by the 8-byte id."""
    if phrases is None:
        phrases = boilerplate_phrases(df, text_col, id_col, n, min_docs)
    grams = doc_ngrams(df, text_col, id_col, n)
    hits = (
        grams.join(F.broadcast(phrases.select("gram")), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("boilerplate_grams"))
    )
    per_doc = df.select(
        F.col(id_col),
        F.size(word_ngrams(F.col(text_col), n)).alias("n_distinct_grams"),
    )
    return (
        per_doc.join(hits, id_col, "left")
        .select(
            id_col,
            "n_distinct_grams",
            F.coalesce(F.col("boilerplate_grams"), F.lit(0)).alias("boilerplate_grams"),
            F.round(
                F.when(
                    F.col("n_distinct_grams") > 0,
                    F.coalesce(F.col("boilerplate_grams"), F.lit(0))
                    / F.col("n_distinct_grams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("boilerplate_frac"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, how many
    of its distinct word ``n``-grams appear anywhere in the benchmark
    set?  Returns ``(id, n_distinct_grams, hit_grams, contamination)``
    for documents with at least one hit — the rows a pipeline would
    quarantine before training.

    The benchmark gram set is deduplicated once and broadcast (an eval
    set is tiny next to a training corpus); the corpus side is a single
    explode → broadcast-semi lookup → per-doc count, no corpus-×-bench
    pair blowup at any scale."""
    bench_grams = (
        doc_ngrams(benchmark, text_col, id_col, n).select("gram").distinct()
    )
    grams = doc_ngrams(corpus, text_col, id_col, n)
    hits = (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("hit_grams"))
    )
    per_doc = corpus.select(
        F.col(id_col),
        F.size(word_ngrams(F.col(text_col), n)).alias("n_distinct_grams"),
    )
    return per_doc.join(hits, id_col).select(
        id_col,
        "n_distinct_grams",
        "hit_grams",
        F.round(F.col("hit_grams") / F.col("n_distinct_grams"), 6).alias("contamination"),
    )


def top_k_vocabulary(
    df: DataFrame, text_col: str = "text", k: int = 1000
) -> DataFrame:
    """The corpus's top-``k`` lowercased words by frequency — the
    vocabulary a tokenizer-prep pass would freeze. Deterministic
    tie-break (freq desc, then word asc) so an external engine
    reproduces the exact set. One explode → hash-agg (map-side
    combinable: word strings are the shuffle keys, bounded by the
    Heaps'-law-small distinct-word count) → one top-k window over the
    AGGREGATED table (vocabulary-sized, not corpus-sized)."""
    from pyspark.sql import Window

    words = df.select(F.explode(words_col(F.lower(F.col(text_col)))).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("word").asc())
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("word", "freq", "rank")
    )


def with_oov_rate(
    df: DataFrame,
    vocabulary: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a ``vocabulary``
    DataFrame with a ``word`` column — the coverage check a pipeline
    runs before committing to a tokenizer vocabulary. Scale shape:
    explode → BROADCAST left join against the (tiny) vocabulary →
    per-doc count of misses; word-less documents keep oov_rate 0.0.
    Returns (id, n_words, oov_words, oov_rate)."""
    words = df.select(
        F.col(id_col), F.explode(words_col(F.lower(F.col(text_col)))).alias("word")
    )
    misses = (
        words.join(
            F.broadcast(vocabulary.select("word", F.lit(True).alias("_in_vocab"))),
            "word",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias("oov_words"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(misses, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("oov_words", F.lit(0)).alias("oov_words"),
            F.round(
                F.when(
                    F.coalesce("n_words", F.lit(0)) > 0,
                    F.coalesce("oov_words", F.lit(0)) / F.col("n_words"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("oov_rate"),
        )
    )


def unigram_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram language model: ``(word, freq, logp)`` with
    ``logp = ln(freq / total)``. One explode → hash agg (Heaps'-law-
    small result); the total folds in via a scalar cross join the
    optimizer broadcasts. The building block of perplexity-family
    quality filters (CCNet-style): documents whose words are improbable
    under the corpus model are boilerplate/noise candidates."""
    words = df.select(F.explode(words_col(F.lower(F.col(text_col)))).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    total = freq.agg(F.sum("freq").alias("_total"))
    return freq.crossJoin(F.broadcast(total)).select(
        "word", "freq", F.log(F.col("freq") / F.col("_total")).alias("logp")
    )


def with_unigram_logprob(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under ``model``
    (a `unigram_model` output): explode → broadcast join on word →
    per-doc average. Words absent from the model are scored at the
    model's minimum logp (the rare-word floor) so cross-corpus scoring
    is total. Word-less documents keep a null score (no evidence).
    Returns (id, n_words, avg_logprob)."""
    floor = model.agg(F.min("logp").alias("_floor"))
    words = df.select(
        F.col(id_col), F.explode(words_col(F.lower(F.col(text_col)))).alias("word")
    )
    scored = (
        words.join(F.broadcast(model.select("word", "logp")), "word", "left")
        .crossJoin(F.broadcast(floor))
        .select(F.col(id_col), F.coalesce("logp", "_floor").alias("lp"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_words"), F.avg("lp").alias("avg_logprob"))
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.col("avg_logprob"),
        )
    )
