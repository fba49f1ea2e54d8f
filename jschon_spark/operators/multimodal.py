"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode/feature-extract/resize/frame-sample run as Arrow-batched
``mapInPandas`` stages. The sandbox has no image/audio codec libraries,
so the actual pixel/sample decode is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless a decoder callable is injected, and the
deterministic fake extractor derives features from a content hash — the
Spark-side contract (schemas, batching, partitioning, column pruning)
is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_DIM = 32

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha1", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(blob: bytes, fmt: str, decoder: Optional[Callable] = None) -> np.ndarray:
    """Decode an image payload to HxWxC uint8. No codec libs in this
    environment — callers must inject ``decoder`` (e.g. PIL.Image.open
    on a real cluster)."""
    if decoder is None:
        raise NotImplementedError(
            "image decode requires a codec library (e.g. Pillow); "
            "inject `decoder=` on a cluster image that ships one"
        )
    return decoder(blob, fmt)


def fake_features(blob: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: sha1-seeded uniforms.
    Keeps the pipeline end-to-end testable without codecs."""
    h = hashlib.sha1(blob or b"").digest()
    seed = int.from_bytes(h[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.random(dim, dtype=np.float32)


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "payload",
    feature_fn: Callable[[bytes], np.ndarray] = fake_features,
) -> DataFrame:
    """mapInPandas feature extraction: the projection ships ONLY
    (id, payload) into the Python workers; Arrow batch size is capped
    session-wide because payloads are large."""
    fields = [id_col, blob_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            feats = [feature_fn(b if b is not None else b"") for b in blobs]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "n_bytes": [len(b) if b is not None else 0 for b in blobs],
                    "content_sha1": [hashlib.sha1(b or b"").hexdigest() for b in blobs],
                    "features": feats,
                }
            )

    return df.select(*fields).mapInPandas(run, _FEATURES_SCHEMA)


def sample_frames_meta(df: DataFrame, meta_col: str = "meta", every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: JVM-side arithmetic over the
    metadata struct (which frames to decode), so the expensive decode
    stage receives an explicit, pruned work list."""
    n = F.col(f"{meta_col}.n_frames")
    idx = F.when(
        n.isNotNull() & (n > 0),
        F.sequence(F.lit(0), n - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("frames_to_sample", idx)
