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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        T.StructField("resized_bytes", T.LongType()),
    ]
)


def resize_stub(mm: DataFrame, max_side: int = 32) -> DataFrame:
    """Arrow-batched 'resize' plumbing: aspect-preserving fit into a
    ``max_side`` square. The pixel work is STUBBED (no PIL/ffmpeg in this
    container): output dims/scales are computed for real from the metadata
    struct, and 'resized_bytes' models area-proportional payload shrink —
    deterministic, so the whole pipeline stays oracle-checkable. Swap the
    body for a real interpolating resample in production; the schema,
    batching, and partition behavior are what this operator pins down.
    """

    def resize_batches(batches):
        import numpy as _np
        import pandas as _pd

        side = max_side  # bind into the closure (no module-level refs)

        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"]).astype("int64")
            h = pdf["meta"].map(lambda m: m["height"]).astype("int64")
            n_bytes = pdf["payload"].map(len).astype("int64")
            scale = (side / w.combine(h, max)).clip(upper=1.0)
            # floor, not round: banker's rounding differs between engines
            # at exact .5 — floor is unambiguous on the same IEEE double.
            out_w = _np.floor(w * scale).clip(lower=1).astype("int64")
            out_h = _np.floor(h * scale).clip(lower=1).astype("int64")
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": out_w.astype("int32"),
                    "out_height": out_h.astype("int32"),
                    "scale_x": (out_w / w).astype("float64"),
                    "scale_y": (out_h / h).astype("float64"),
                    "resized_bytes": (n_bytes * out_w * out_h // (w * h)).astype(
                        "int64"
                    ),
                }
            )

    return fan_out(mm).mapInPandas(resize_batches, RESIZED_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def feature_extract_stub(mm: DataFrame) -> DataFrame:
    """Arrow-batched 'feature extraction' over the raw payload bytes.

    Computes real, deterministic byte-level features (mean byte value,
    Shannon entropy of the byte histogram) with vectorized numpy per
    batch — the stand-in for an embedding model forward pass. The
    features are exactly reproducible in SQL, so the Arrow plumbing is
    value-checked end-to-end, not just schema-checked."""

    def feature_batches(batches):
        import math as _math

        import numpy as _np
        import pandas as _pd

        def feats(payload: bytes):
            arr = _np.frombuffer(payload, dtype=_np.uint8)
            if arr.size == 0:
                return 0.0, 0.0, 0
            counts = _np.bincount(arr, minlength=256)
            # Sequential fold in ascending byte order — numpy's pairwise
            # .sum() would differ from a single-threaded SQL oracle by
            # ULPs; this order is reproducible in any engine.
            ent_sum = 0.0
            for c in counts[counts > 0]:
                p = int(c) / arr.size
                ent_sum += p * _math.log2(p)
            mean = int(arr.sum(dtype=_np.int64)) / arr.size
            return mean, -ent_sum, int(arr.size)

        for pdf in batches:
            rows = pdf["payload"].map(feats)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mean_byte": rows.map(lambda r: r[0]),
                    "byte_entropy": rows.map(lambda r: r[1]),
                    "n_bytes": rows.map(lambda r: r[2]).astype("int64"),
                }
            )

    return fan_out(mm).mapInPandas(feature_batches, FEATURES_SCHEMA)


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
