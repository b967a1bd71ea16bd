"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (shape +
checksum from the bytes) exercises the full Spark-side pipeline —
schema, partition sizing, UDF signature, and Arrow batch shape are real.

At 100 TB: binaries ride in their own parquet column (never in memory as
a whole partition — ``spark.sql.files.maxPartitionBytes`` bounds scan
tasks), metadata columns stay queryable/prunable without touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("media_type", T.StringType()),   # image/png, audio/wav, ...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata derived without decoding: byte length + crc32.
    Pure JVM expressions — cheap at any scale."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "checksum", F.crc32(F.col(content_col))
    )


def _fake_decode(buf: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake 'decode': derives an 8-dim feature from byte
    statistics. Stands in for a real image/audio decode."""
    if buf is None:
        return 0, 0, [0.0] * 8
    n = len(buf)
    acc = [0] * 8
    for i, by in enumerate(buf[:4096]):
        acc[i % 8] += by
    feat = [a / max(n, 1) for a in acc]
    return n % 1024, (n // 1024) % 1024, feat


def decode_and_featurize(
    df: DataFrame, content_col: str = "content", fake: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """mapInPandas decode→feature pipeline over Arrow batches.

    Real decode is not available in this container: pass ``fake=True``
    for the deterministic stand-in, otherwise NotImplementedError
    (by design — see module docstring)."""
    if not fake:
        raise NotImplementedError(
            "image/audio decode libraries are not installed; "
            "use fake=True for the deterministic pipeline stand-in"
        )

    import zlib

    cols = [f.name for f in FEATURE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = pdf[content_col]
            # the decode itself is inherently per-item (a codec call);
            # everything around it is vectorized columnar assembly —
            # no iterrows, one DataFrame construction per Arrow batch
            feats = [_fake_decode(b)[2] for b in bufs]
            out = pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "media_type": (
                    pdf["media_type"]
                    if "media_type" in pdf.columns
                    else pd.Series(
                        ["application/octet-stream"] * len(pdf), index=pdf.index
                    )
                ),
                "n_bytes": bufs.map(
                    lambda b: len(b) if b is not None else 0
                ).astype("int64"),
                "checksum": [
                    zlib.crc32(b) if b is not None else 0 for b in bufs
                ],
                "feature": feats,
            })
            yield out[cols]

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, frame_col: str = "frame_idx") -> DataFrame:
    """Keep every n-th frame of a video frame table — a pure filter, no
    shuffle; partition pruning applies if frame tables are partitioned
    by video_id."""
    return df.filter(F.col(frame_col) % every_n == 0)
