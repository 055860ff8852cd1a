"""Multimodal column handling: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB (driver north-star): media rides as
``binary`` columns with a metadata struct; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so bytes
never round-trip through Python row-at-a-time.

The decode kernels themselves are environment-gated: PIL/cv2/librosa are NOT
in this container, so ``decode_image_meta`` raises NotImplementedError
unless ``fake=True`` selects the deterministic stand-in — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and tested
either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<width:int, height:int, n_bytes:long>"
)

DECODED_SCHEMA = "media_id long, width int, height int, n_bytes long, content_hash string"


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from any corpus: utf-8 bytes stand in for
    an encoded image payload. Real ingestion would read image files with
    ``spark.read.format('binaryFile')``."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for an image decoder: derives stable
    pseudo-dimensions and a content hash from the bytes."""
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[:4], 16) % 2032
    height = 16 + int(h[4:8], 16) % 2032
    return width, height, len(payload), h


def decode_image_meta(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage: (media_id, payload) -> (media_id, width, height,
    n_bytes, content_hash) via mapInPandas (one Arrow batch per call)."""
    try:  # pragma: no cover - not installed in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not fake:
        raise NotImplementedError(
            "image decode requires PIL (unavailable here); pass fake=True "
            "for the deterministic stand-in decoder"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake or not have_pil:
                    w, h, n, digest = _fake_decode(bytes(payload))
                else:  # pragma: no cover
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(bytes(payload)))
                    w, h = img.size
                    n = len(payload)
                    digest = hashlib.md5(bytes(payload)).hexdigest()
                rows.append((int(mid), w, h, n, digest))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "content_hash"]
            )

    return media.select("media_id", "payload").mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: explodes frame indices 0..n-1 step
    every_n per media row (the real decoder would emit frame payloads).
    Demonstrates the fan-out pattern without a codec dependency."""
    n_frames = (F.octet_length("payload") % 100 + 1).alias("n_frames")
    return (
        media.select("media_id", n_frames)
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
