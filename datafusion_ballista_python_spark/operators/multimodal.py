"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by built-in binary expressions where possible and
Arrow-batched ``mapInPandas`` where a real codec would run.

The reference engine has no media operators; this is the training-data-
pipeline extension mandated by the blueprint (SURVEY §7 step 8).  The
container has no image/audio codecs, so the *decode* kernels are stubs with
deterministic fake outputs — the Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested.

Scale notes:
- payload stays an opaque ``binary`` column end-to-end; nothing is collected
  to the driver;
- metadata ops (byte length, checksums, frame offsets, slicing) are pure
  JVM expressions inside whole-stage codegen — no Python in that path;
- decode fans out via ``mapInPandas`` so each Arrow batch is decoded where
  the bytes already live; at 100 TB the stage is a pure map, no shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# metadata carried alongside every media payload
MEDIA_META_FIELDS = [
    StructField("format", StringType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("n_frames", LongType(), True),
    StructField("sample_rate", LongType(), True),
]

_FORMATS = ["png", "wav", "mp4"]


def attach_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a deterministic synthetic media payload + metadata struct.

    Stands in for an ingest step that would read real bytes; payload is the
    utf-8 encoding of the text column (opaque to everything downstream),
    format/width/height/n_frames derive from the id so every engine can
    reproduce them.  All JVM-side expressions.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    fmt = F.element_at(F.array(*[F.lit(x) for x in _FORMATS]), (F.col(id_col) % 3 + 1).cast("int"))
    meta = F.struct(
        fmt.alias("format"),
        (F.col(id_col) % 7 * 64 + 64).cast("long").alias("width"),
        (F.col(id_col) % 5 * 64 + 64).cast("long").alias("height"),
        F.when(fmt == "mp4", (F.col(id_col) % 9 + 2).cast("long")).alias("n_frames"),
        F.when(fmt == "wav", F.lit(16000).cast("long")).alias("sample_rate"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("media_meta")
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-format corpus stats over payload bytes + metadata — the triage
    query a pipeline runs before spending decode cycles.  One partial-
    aggregated groupBy; payload never leaves the JVM."""
    return (
        media.groupBy(F.col("media_meta.format").alias("format"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
            F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
            F.min("media_meta.width").alias("min_width"),
            F.max("media_meta.height").alias("max_height"),
        )
    )


def media_checksums(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Integrity fingerprints: md5 + byte length per item (dedup / corruption
    sweep primitive). Hex-encodes first so the hash matches any engine that
    lacks blob md5."""
    return media.select(
        F.col(id_col),
        F.col("media_meta.format").alias("format"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"),
    )


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Evenly-spaced frame sampling from a video payload: computes byte
    offsets with array expressions and slices frames with ``substring`` on
    the binary — zero Python, one row per sampled frame via posexplode.

    Frames are surfaced as uppercase hex so results are portable; the raw
    ``binary`` slice is kept too for downstream decode.
    """
    total = F.octet_length("payload")
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.floor(
            (i * F.greatest(total - F.lit(frame_bytes), F.lit(0)))
            / F.lit(max(n_frames - 1, 1))
        ),
    )
    frames = F.transform(
        offsets, lambda off: F.substring(F.col("payload"), off.cast("int") + 1, frame_bytes)
    )
    return (
        media.filter(F.col("media_meta.format") == "mp4")
        .select(
            F.col(id_col),
            total.cast("long").alias("n_bytes"),
            F.posexplode(frames).alias("frame_idx", "frame"),
        )
        .select(
            F.col(id_col),
            "n_bytes",
            "frame_idx",
            F.hex("frame").alias("frame_hex"),
            F.col("frame"),
        )
    )


# ---------------------------------------------------------------------------
# decode kernels — mapInPandas plumbing is real; the codec itself is a STUB
# (no image/audio libraries in this container).  A production build swaps
# `_fake_decode_vec` for PIL/librosa/av inside the same iterator.
# ---------------------------------------------------------------------------

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def _fake_decode_vec(payload: bytes, dim: int) -> list[float]:
    """STUB decode: deterministic per-byte-bucket means standing in for a
    real feature extractor.  Replace with a codec; keep the signature."""
    if not payload:
        return [0.0] * dim
    acc = [0.0] * dim
    cnt = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
        cnt[i % dim] += 1
    return [round(a / c, 4) if c else 0.0 for a, c in zip(acc, cnt)]


def decode_features(media: DataFrame, dim: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Decode payloads to fixed-dim feature vectors via ``mapInPandas``.

    Arrow-batched: each executor decodes the payloads of its own partitions
    batch-by-batch (no shuffle, no driver involvement); output schema is
    fixed so downstream ANN/dedup can consume ``features`` directly.
    """
    import pandas as pd  # local import keeps the module importable sans pandas

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": pdf["format"],
                    "features": [_fake_decode_vec(p, dim) for p in pdf["payload"]],
                }
            )

    flat = media.select(
        F.col(id_col), F.col("media_meta.format").alias("format"), "payload"
    )
    return flat.mapInPandas(decode, schema=DECODE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize plumbing: images flow through an Arrow-batched pandas iterator
    that would call a real resampler; the STUB emits a deterministic
    truncated payload + updated metadata.  Filter (format='png') is pushed
    before the Python stage so only image bytes cross the Arrow boundary."""
    import pandas as pd

    out_schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
            StructField("n_bytes", LongType(), False),
        ]
    )
    target = max(width * height // 64, 1)

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # STUB: a real build decodes + resamples; we model the byte-size
            # change so downstream cost accounting is exercised.
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "n_bytes": [min(len(p), target) for p in pdf["payload"]],
                }
            )

    imgs = media.filter(F.col("media_meta.format") == "png").select(
        F.col(id_col), "payload"
    )
    return imgs.mapInPandas(resize, schema=out_schema)
