"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` content + typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The Spark-side contract is real and tested — schema, batch shape,
partitioning, UDF signature. The codec step itself is stubbed: the
image/audio libraries are not in this container, so ``decode_image``
raises ``NotImplementedError`` unless Pillow is importable, and the
pipelines default to ``fake_decode_dims`` — a deterministic function
of the content bytes that the DuckDB oracle reproduces, keeping even
the multimodal path value-checked.

At 100 TB: binary payloads dominate row size, so the feature-extract
stage should run straight off the scan (no shuffle before mapInPandas
— column pruning drops the payload everywhere it isn't needed), and
outputs are skinny (id + features), so the shuffle after is cheap.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, digest string, "
    "fake_width int, fake_height int"
)


def gen_media(spark: SparkSession, n: int = 256) -> DataFrame:
    """Synthetic media table: content = md5(media_id) as 16 raw bytes
    (deterministic, reproducible as unhex(md5(...)) in any engine),
    media_type cycling over image/audio/video."""
    ids = spark.range(n)
    return ids.select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("media_type"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("content"),
    )


def decode_image(content: bytes):  # pragma: no cover - stub
    """Real decode path — requires an image codec library."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; this container ships none — "
            "use fake_decode_dims for plumbing tests"
        )
    import io

    return Image.open(io.BytesIO(content))


def fake_decode_dims(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: 'dimensions' derived from the
    first two content bytes — byte k → dim = byte + 1 (1..256)."""
    return content[0] + 1, content[1] + 1


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: digest, size, (stub-)decoded
    dimensions. One Arrow batch in, one skinny feature frame out —
    the template for real decode/resize/frame-sample stages."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len).astype("int64"),
                    # digest over the lowercase-hex encoding (not raw
                    # bytes): every SQL engine can md5 a string, not
                    # all can md5 a blob — keeps the oracle exact
                    "digest": content.map(
                        lambda b: hashlib.md5(b.hex().encode()).hexdigest()
                    ),
                    "fake_width": content.map(lambda b: b[0] + 1).astype(
                        "int32"
                    ),
                    "fake_height": content.map(lambda b: b[1] + 1).astype(
                        "int32"
                    ),
                }
            )

    return media.mapInPandas(compute, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 4) -> DataFrame:
    """Frame-sampling stub: emit one row per sampled 'frame' offset —
    the explode-shaped stage a video pipeline needs (1 input row → k
    output rows), demonstrated with byte offsets instead of decoded
    frames."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for off in range(0, len(content), every_n_bytes):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_offset": off,
                            "frame_byte": content[off],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_offset", "frame_byte"]
            )

    return media.mapInPandas(
        compute, schema="media_id long, frame_offset int, frame_byte int"
    )


def audio_windows(
    media: DataFrame, win: int = 8, hop: int = 4
) -> DataFrame:
    """Audio framing stub: treat the payload as PCM samples (a real
    pipeline would decode the codec first — same gate as
    ``decode_image``) and emit fixed-size windows at a hop, with the
    per-window energy Σ sample². The spectrogram-framing stage of any
    audio featurizer: 1 input row → ⌊(n−win)/hop⌋+1 window rows, all
    integer arithmetic so the oracle is exact."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for start in range(0, len(content) - win + 1, hop):
                    chunk = content[start : start + win]
                    rows.append(
                        {
                            "media_id": mid,
                            "win_start": start,
                            "energy": sum(b * b for b in chunk),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "win_start", "energy"]
            )

    return media.mapInPandas(
        compute, schema="media_id long, win_start int, energy long"
    )
