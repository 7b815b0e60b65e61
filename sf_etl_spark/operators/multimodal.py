"""Multimodal column conventions: image/audio/video as opaque
``binary`` payloads with a typed metadata struct, plus Arrow-batched
feature extraction / decode / resize / frame-sample operators.

Layout convention (what a 100 TB media lake table looks like):

    media_id   bigint        -- stable key
    payload    binary        -- opaque encoded bytes (never parsed JVM-side)
    meta       struct<format string, width int, height int,
                      n_bytes bigint, sample_rate int>

The payload column rides through shuffles/joins untouched; all
byte-level work happens in ``mapInPandas`` (Arrow batches → zero-copy
numpy views), which is the only sane shape at scale: decode cost is
embarrassingly parallel, per-partition, and never touches the driver.

The container has no image/audio codecs, so ``decode_media`` is a
clearly-marked stub: it raises ``NotImplementedError`` unless PIL is
importable; ``extract_features`` instead computes a deterministic
byte-level feature vector (mean/std/entropy over the raw payload) so
the Spark-side plumbing — schema, batch shape, partitioning — is real
and testable without codecs.

Reference parity: nater540/sf-etl models binary only as the Salesforce
``Base64`` field type (oxidized-force/src/response.rs:100) with no
processing; this module is north-star surface per the build brief.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_std", DoubleType()),
        StructField("byte_entropy", DoubleType()),
        # exact-integer features: these make the numpy path externally
        # verifiable — an engine that can enumerate payload bytes (the
        # DuckDB oracle does, via bitstring extraction) can restate
        # them bit-for-bit, no float tolerance needed
        StructField("byte_sum", LongType()),
        StructField("byte_min", IntegerType()),
        StructField("byte_max", IntegerType()),
    ]
)

_FORMATS = ["png", "jpeg", "wav"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media-lake-shaped DataFrame from the ``documents``
    table: utf-8 payload bytes + deterministic typed metadata.

    This is the test-fixture generator (the container ships no real
    media); the *schema* is the contract. All columns are narrow
    per-row expressions — no shuffle.
    """
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in _FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            fmt.alias("format"),
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
            F.when(fmt == "wav", F.lit(16000)).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, fmt: str):
    """Decode an encoded media payload to a pixel/sample array.

    STUB: real decode requires codec libraries not present in this
    container. The gate keeps the operator surface honest — callers
    get the real thing the moment PIL/soundfile are installed.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - codec-less container
        raise NotImplementedError(
            f"decode for {fmt!r} needs codec libs (PIL/soundfile) not in this container"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction over payloads.

    Deterministic stand-in for codec decode: per-payload byte
    mean/std/entropy via numpy over zero-copy Arrow buffers. The
    mapInPandas shape (schema, batch iteration, no driver collect)
    is exactly what a real decoder drops into.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"], strict=True
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:  # degenerate payload: all-null features
                    rows.append(
                        {
                            "media_id": int(mid),
                            "format": meta["format"],
                            "n_bytes": 0,
                            "byte_mean": None,
                            "byte_std": None,
                            "byte_entropy": None,
                            "byte_sum": 0,
                            "byte_min": None,
                            "byte_max": None,
                        }
                    )
                    continue
                counts = np.bincount(arr, minlength=256)
                probs = counts[counts > 0] / arr.size
                rows.append(
                    {
                        "media_id": int(mid),
                        "format": meta["format"],
                        "n_bytes": int(arr.size),
                        "byte_mean": float(arr.mean()),
                        "byte_std": float(arr.std()),
                        "byte_entropy": float(-(probs * np.log2(probs)).sum()),
                        "byte_sum": int(arr.sum(dtype=np.int64)),
                        "byte_min": int(arr.min()),
                        "byte_max": int(arr.max()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize operator: plumbing-real, decode-stubbed.

    Returns the post-resize *metadata* plan (what the lake tracks);
    the pixel transform itself sits behind ``decode_media``. At scale
    this is a narrow map — payloads stay partition-local.
    """
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame sampling for video/audio payloads: one row per sampled
    offset. Expressed as sequence+explode (JVM-side, no Python), so
    a 100 TB corpus fans out to frame tasks without a UDF.
    """
    n_frames = F.greatest(
        F.ceil(F.col("meta.n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
    ).withColumn("byte_offset", F.col("frame_no").cast("bigint") * every_n_bytes)


def shannon_entropy(counts: list[int]) -> float:
    """Reference scalar entropy (test oracle for extract_features)."""
    total = sum(counts)
    return -sum(c / total * math.log2(c / total) for c in counts if c)
