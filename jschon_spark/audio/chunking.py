"""Chunk planning for long audio clips.

Training pipelines over speech data window long clips into fixed-size
overlapping segments (e.g. 5 s windows, 4 s hop) before feature
extraction or tokenization.  The PLAN — which (clip, start, end)
segments exist — is pure integer arithmetic on ``dur_ms``/``sr_hz`` and
belongs JVM-side: one ``sequence``+``explode`` per clip, no UDF, no
shuffle (explode is map-side, so at 10^12 clips this pipelines straight
out of the scan).  The byte-slicing itself stays in the Arrow decode
kernels (audio/features.py) which can consume these offsets.

Chunking rule (standard fencepost): chunk ``i`` starts at ``i*hop_ms``;
the number of chunks is ``1 + ceil(max(dur-window, 0)/hop)`` so the
final chunk always reaches the end of the clip (clipped to ``dur_ms``),
and a clip shorter than one window yields exactly one short chunk.
Every expression here is ANSI-SQL-expressible (generate_series /
unnest), so the DuckDB oracle verifies the plan value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_plan(
    df: DataFrame,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
    sr_col: str = "sr_hz",
    window_ms: int = 5000,
    hop_ms: int = 4000,
) -> DataFrame:
    """One row per planned chunk: (id, chunk_idx, start_ms, end_ms,
    n_samples).  ``n_samples`` is the decoded sample count of the
    chunk at the clip's sample rate (floor at the ms boundary)."""
    if hop_ms <= 0 or window_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")
    dur = F.col(dur_col).cast("long")
    extra = F.greatest(dur - F.lit(window_ms), F.lit(0).cast("long"))
    # ceil(extra/hop) in exact integer arithmetic
    n_extra = F.floor((extra + F.lit(hop_ms - 1)) / F.lit(hop_ms)).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), n_extra * hop_ms, F.lit(hop_ms).cast("long"))
    out = df.select(
        F.col(id_col),
        dur.alias("dur_ms_"),
        F.col(sr_col).cast("long").alias("sr_"),
        F.explode(starts).alias("start_ms"),
    )
    end = F.least(F.col("start_ms") + F.lit(window_ms), F.col("dur_ms_"))
    return out.select(
        id_col,
        (F.col("start_ms") / F.lit(hop_ms)).cast("long").alias("chunk_idx"),
        "start_ms",
        end.alias("end_ms"),
        F.floor((end - F.col("start_ms")) * F.col("sr_") / F.lit(1000)).cast("long").alias("n_samples"),
    )
