"""Multimodal (binary) column handling.

Model: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct (format, width, height, n_frames, ...). Decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators (``mapInPandas``) so the per-record Python cost is amortized
over whole record batches — the pattern that scales to 100 TB because the
heavy bytes never leave the executor and the UDF sees columnar batches.

The actual media decode is STUBBED: real codecs (PIL/ffmpeg/librosa) are
not in this container. ``decode_stub`` computes a deterministic fake
"decoded" summary from the payload bytes so the Spark-side plumbing —
schema, batching, partition behavior — is real and oracle-testable;
swap ``_fake_decode`` for a real decoder in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..partitioning import fan_out

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decoded_bytes", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal frame from documents: binary payload + metadata
    struct. (In production the payload would be read from object storage
    as ``binaryFile`` or a parquet binary column.)"""
    fmt = F.when(F.col(id_col) % 3 == 0, "png").when(F.col(id_col) % 3 == 1, "jpeg").otherwise("webp")
    meta = F.struct(
        fmt.alias("format"),
        (1 + F.col("n_chars") % 64).cast("int").alias("width"),
        (1 + (F.col("n_chars") * 7) % 64).cast("int").alias("height"),
        (1 + F.col(id_col) % 8).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_stub(mm: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over (payload, meta) batches.

    NB: the batch function must be closure-self-contained (no references
    to names defined at this module's top level) — cloudpickle serializes
    imported-module functions BY REFERENCE, and Spark's Python workers
    don't necessarily have this package importable when the driver runs
    from a different working directory.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake_decode(payload: bytes) -> int:
            # Deterministic decode stand-in ('decoded size' = byte length).
            # A real implementation (PIL/ffmpeg/librosa — not in this
            # container) would return pixels/samples here.
            return len(payload)

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["meta"].map(lambda m: m["format"]),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "n_frames": pdf["meta"].map(lambda m: m["n_frames"]).astype("int32"),
                    "decoded_bytes": pdf["payload"].map(fake_decode).astype("int64"),
                }
            )

    # Decode is the CPU-heavy stage of a multimodal pipeline — fan the
    # batches across all cores before the Python workers see them.
    return fan_out(mm).mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample_plan(mm: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    Native explode of a frame-index sequence — the decode of each sampled
    frame would then be a mapInPandas over (payload, frame_idx)."""
    return mm.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
