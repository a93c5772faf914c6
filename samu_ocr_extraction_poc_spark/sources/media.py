"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is stubbed — the
sandbox image has no PIL/ffmpeg — behind ``use_real_codecs``: the real path
raises NotImplementedError at the decode call, and the default path derives
a deterministic fake from the bytes (sha256-seeded) so every downstream
operator (resize, frame-sample, feature-extract -> embedding similarity) is
exercised end-to-end.

Scale notes: media rows are processed by ``mapInPandas`` with the session's
Arrow batch cap, so a partition of 100 MB blobs streams through bounded
batches; features come out as ``array<float>`` columns that feed
operators/similarity.py unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_ref string, doc_id string, media_type string, width int, height int, "
    "n_frames int, feature array<float>"
)

FEATURE_DIM = 16


def _fake_decode(content: bytes, media_type: str) -> dict:
    """Deterministic decode stand-in: dimensions + per-frame count + a
    FEATURE_DIM-float feature vector, all derived from sha256(content)."""
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if media_type == "image" else 1 + h[2] % 30
    feats = [
        struct.unpack(">H", hashlib.sha256(h + bytes([i])).digest()[:2])[0] / 65535.0
        for i in range(FEATURE_DIM)
    ]
    return {"width": width, "height": height, "n_frames": n_frames, "feature": feats}


def _real_decode(content: bytes, media_type: str) -> dict:
    """Real codec path — requires PIL / av, which this container lacks."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "real media decode needs Pillow/av; not available in this image — "
            "use use_real_codecs=False (deterministic fake) instead"
        ) from exc
    raise NotImplementedError("real decode wiring lands when codecs are present")


def decode_media(df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """(media rows) -> decoded metadata + feature vectors, Arrow-batched."""
    decode = _real_decode if use_real_codecs else _fake_decode

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, doc_id, mtype, content in zip(
                pdf["media_ref"], pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                d = decode(bytes(content) if content is not None else b"", mtype)
                rows.append(
                    {
                        "media_ref": ref,
                        "doc_id": doc_id,
                        "media_type": mtype,
                        **{k: d[k] for k in ("width", "height", "n_frames")},
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "doc_id", "media_type", "width", "height",
                    "n_frames", "feature",
                ],
            )

    return df.select("media_ref", "doc_id", "media_type", "content").mapInPandas(
        _run, DECODED_SCHEMA
    )


def frame_sample(decoded: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling plan for video rows: one row per kept frame index —
    pure relational explode (the decode of each frame stays in the stub)."""
    from pyspark.sql import functions as F

    return decoded.where(F.col("media_type") == "video").select(
        "media_ref",
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_plan(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize metadata computation (aspect-preserving target dims) — the
    arithmetic is JVM-side; actual pixel work would live in the codec UDF."""
    from pyspark.sql import functions as F

    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "media_ref",
        "doc_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture rows (binary content from sha256)."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 7)
        mtype = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                f"m-{i:04d}",
                hashlib.sha256(f"doc-{i % 16}".encode()).hexdigest(),
                mtype,
                content,
                {"mime": f"{mtype}/x-fake", "width": None, "height": None, "duration_ms": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
