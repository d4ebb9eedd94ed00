"""Multimodal corpus: binary media payload + typed metadata over documents.

The synthetic ingest (``attach_media``) is deterministic — payload is the
utf-8 encoding of ``text`` and metadata derives from ``doc_id`` — so every
metadata/slicing operator is exactly reproducible in DuckDB
(``encode``/``octet_length``/``hex``) and hash-checked.  The decode /
resize / audio mapInPandas stages are ALSO fully oracle-checked: corpus
payloads take the deterministic non-media fallback kernels, which DuckDB
replays from the hex payload; the real PNG/BMP/WAV codec branches are
pinned pixel-/sample-exact in tests/test_imagecodec.py and
tests/test_audiocodec.py on in-test generated media.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal
from . import query
from .util import load

# DuckDB mirror of attach_media's derived columns
_MEDIA_CTE = """
media AS (
    SELECT doc_id,
           ENCODE(text) AS payload,
           ['png','wav','mp4'][(doc_id % 3 + 1)] AS format,
           doc_id % 7 * 64 + 64 AS width,
           doc_id % 5 * 64 + 64 AS height
    FROM documents
)
"""


@query(
    "mm_media_stats",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT format,
           COUNT(*) AS n_items,
           CAST(SUM(OCTET_LENGTH(payload)) AS BIGINT) AS total_bytes,
           CAST(MAX(OCTET_LENGTH(payload)) AS BIGINT) AS max_bytes,
           CAST(MIN(width) AS BIGINT) AS min_width,
           CAST(MAX(height) AS BIGINT) AS max_height
    FROM media GROUP BY format ORDER BY format
    """,
)
def mm_media_stats(spark, sf_dir):
    """Per-format byte/metadata rollup — JVM-only aggregation over binary."""
    docs = load(spark, sf_dir, "documents")["documents"]
    media = multimodal.attach_media(docs)
    return multimodal.media_stats(media).orderBy("format")


@query(
    "mm_checksums",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT doc_id, format,
           CAST(OCTET_LENGTH(payload) AS BIGINT) AS n_bytes,
           MD5(HEX(payload)) AS payload_md5
    FROM media ORDER BY doc_id
    """,
)
def mm_checksums(spark, sf_dir):
    """Integrity fingerprint per media item (corruption/dedup sweep)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    media = multimodal.attach_media(docs)
    return multimodal.media_checksums(media).orderBy("doc_id")


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH {_MEDIA_CTE},
    vids AS (
        SELECT doc_id, payload, OCTET_LENGTH(payload) AS nb, HEX(payload) AS hx
        FROM media WHERE format = 'mp4'
    ),
    frames AS (
        SELECT doc_id, CAST(nb AS BIGINT) AS n_bytes,
               CAST(i AS INTEGER) AS frame_idx,
               SUBSTRING(hx, CAST(i * GREATEST(nb - 16, 0) // 3 AS INTEGER) * 2 + 1, 32)
                 AS frame_hex
        FROM vids CROSS JOIN (SELECT UNNEST(RANGE(4)) AS i)
    )
    SELECT doc_id, n_bytes, frame_idx, frame_hex FROM frames
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Evenly-spaced video frame sampling via binary substring (no Python).

    Oracle slices the hex encoding at byte_offset*2 — byte-identical to
    Spark's substring on the raw binary."""
    docs = load(spark, sf_dir, "documents")["documents"]
    media = multimodal.attach_media(docs)
    return (
        multimodal.sample_frames(media, n_frames=4, frame_bytes=16)
        .select("doc_id", "n_bytes", "frame_idx", "frame_hex")
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "mm_decode_features",
    oracle=f"""
    WITH {_MEDIA_CTE},
    b AS (
        SELECT doc_id, format, HEX(payload) AS hx,
               CAST(OCTET_LENGTH(payload) AS BIGINT) AS nb
        FROM media
    ),
    bl AS (
        SELECT doc_id, format, nb,
               LIST_TRANSFORM(RANGE(0, nb),
                   i -> CAST(CONCAT('0x', SUBSTRING(hx, CAST(i*2+1 AS INT), 2)) AS BIGINT)) AS bytes
        FROM b
    )
    SELECT doc_id, format,
           ARRAY_TO_STRING(
               LIST_TRANSFORM(RANGE(0, 8),
                   d -> printf('%.4f', COALESCE(
                            ROUND_EVEN(LIST_AVG(bytes[CAST(d+1 AS INT):nb:8]), 4), 0.0))),
               ',') AS features_csv
    FROM bl ORDER BY doc_id
    """,
)
def mm_decode_features(spark, sf_dir):
    """Arrow-batched decode to feature vectors via mapInPandas (the codec is
    a declared deterministic STUB — per-byte-bucket means, see
    operators/multimodal.py).  Because the stub is deterministic, the whole
    decode pipeline IS oracle-checkable: DuckDB re-derives bucket means
    from the hex payload.  Features are serialized %.4f-csv at the result
    boundary (driver canonicalizer can't hash array cells); the float32
    storage error (<2e-5 for byte means <=255) never crosses a 4th-decimal
    rounding boundary, so the string form is exact."""
    docs = load(spark, sf_dir, "documents")["documents"]
    media = multimodal.attach_media(docs)
    feats = multimodal.decode_features(media, dim=8)
    return feats.select(
        "doc_id",
        "format",
        F.array_join(
            F.transform(
                "features", lambda x: F.format_string("%.4f", x.cast("double"))
            ),
            ",",
        ).alias("features_csv"),
    ).orderBy("doc_id")


@query(
    "mm_audio_features",
    oracle=f"""
    WITH {_MEDIA_CTE},
    b AS (
        SELECT doc_id, HEX(payload) AS hx,
               CAST(OCTET_LENGTH(payload) AS BIGINT) AS nb
        FROM media WHERE format = 'wav'
    ),
    samples AS (
        SELECT doc_id, nb,
               LIST_TRANSFORM(RANGE(0, nb),
                   i -> CAST(CONCAT('0x', SUBSTRING(hx, CAST(i*2+1 AS INT), 2))
                             AS BIGINT) - 128) AS s
        FROM b
    )
    SELECT doc_id,
           CAST(16000 AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS channels,
           nb AS n_samples,
           ROUND_EVEN(SQRT(CAST(LIST_SUM(LIST_TRANSFORM(s, x -> x * x))
                                AS DOUBLE) / nb), 4) AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(s, x -> ABS(x))) AS BIGINT) AS peak
    FROM samples ORDER BY doc_id
    """,
)
def mm_audio_features(spark, sf_dir):
    """Audio stats via mapInPandas (operators/multimodal.audio_features):
    the corpus payloads are not RIFF, so they take the documented
    headerless-8-bit-PCM fallback — which shares the real codec path's
    exact stats kernel (integer-exact sum of squares, one
    correctly-rounded sqrt, half-even round), so the WHOLE operator is
    oracle-checkable; the real-WAV branch is pinned sample-exact in
    tests/test_audiocodec.py with generated sine waves."""
    docs = load(spark, sf_dir, "documents")["documents"]
    media = multimodal.attach_media(docs)
    return multimodal.audio_features(media).orderBy("doc_id")


@query(
    "mm_resize_images",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT doc_id,
           CAST(64 AS BIGINT) AS width,
           CAST(64 AS BIGINT) AS height,
           CAST(LEAST(OCTET_LENGTH(payload), 64) AS BIGINT) AS n_bytes
    FROM media WHERE format = 'png'
    ORDER BY doc_id
    """,
)
def mm_resize_images(spark, sf_dir):
    """Resize plumbing through mapInPandas
    (operators/multimodal.resize_images, 64x64): corpus payloads are not
    decodable images, so they take the deterministic byte-size model
    (min(len, w*h/64)) — making the whole Python-crossing stage
    oracle-checkable; the real-PNG branch (decode -> nearest resample ->
    re-encode) is pinned byte-exact in tests/test_imagecodec.py."""
    docs = load(spark, sf_dir, "documents")["documents"]
    media = multimodal.attach_media(docs)
    return multimodal.resize_images(media, 64, 64).orderBy("doc_id")
