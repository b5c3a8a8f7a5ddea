"""Multimodal columns (SURVEY.md §2.11 L5) — binary media + typed metadata.

Image/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side plumbing here is real and tested: schemas,
``spark.read.format("binaryFile")`` ingestion, Arrow-batched
``mapInPandas`` transforms with correct batch shapes and partitioning.
The actual codecs are STUBBED behind ``decoder=`` hooks (the image and
audio libraries are not in this container): the default decoder raises
``NotImplementedError``; tests inject a deterministic fake. Swapping in
Pillow/torchaudio later changes one callable, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-table schema: path + opaque bytes + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("modification_time", LongType(), True),
        StructField("length", LongType(), True),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def read_media(spark: SparkSession, path: str, media_type: str = "image") -> DataFrame:
    """Ingest a directory of media files as a binary-column table.

    Built on Spark's ``binaryFile`` source — distributed, partition-per
    file-group, predicate pushdown on path/length works.
    """
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.col("path"),
        F.unix_timestamp("modificationTime").alias("modification_time"),
        F.col("length"),
        F.col("content"),
        F.lit(media_type).alias("media_type"),
    )


def default_image_decoder(content: bytes) -> dict[str, Any]:
    """STUB — no image codec in this environment.

    Replace with e.g. PIL: ``img = Image.open(io.BytesIO(content))``.
    """
    raise NotImplementedError(
        "image decoding requires an image library (e.g. Pillow); "
        "inject decoder=... with a real or fake implementation"
    )


def fake_image_decoder(content: bytes) -> dict[str, Any]:
    """Deterministic fake decoder for tests: derives shape + a tiny
    'embedding' from the bytes' md5 — stable across runs/machines."""
    import hashlib

    h = hashlib.md5(content or b"").digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "n_channels": 1 + h[2] % 3,
        "embedding": [b / 255.0 for b in h[:8]],
    }


def extract_image_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = default_image_decoder,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    The decode runs once per row inside a batch loop (codecs are
    per-item anyway); Arrow moves the binary column executor→Python in
    large batches, not per record. Output schema is fixed
    (IMAGE_FEATURES_SCHEMA) so downstream relational ops compose.
    """

    def decode_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {
                "path": [], "width": [], "height": [],
                "n_channels": [], "embedding": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                feats = decoder(bytes(content) if content is not None else b"")
                out["path"].append(path)
                out["width"].append(feats.get("width"))
                out["height"].append(feats.get("height"))
                out["n_channels"].append(feats.get("n_channels"))
                out["embedding"].append(feats.get("embedding"))
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(
        decode_batches, IMAGE_FEATURES_SCHEMA
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through a mapInPandas stage with
    the real signature; the pixel op raises until a codec is injected."""
    return extract_image_features(df)  # same stub boundary


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    decoder: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling plumbing: one row in → N frame rows out
    (mapInPandas is the UDTF shape). Default 'decoder' fakes frames by
    slicing the byte stream deterministically."""

    def split_frames(batches):
        import pandas as pd

        for pdf in batches:
            paths, idxs, frames = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                if decoder is not None:
                    fs = decoder(data)
                else:
                    step = max(1, len(data) // max(1, every_n))
                    fs = [data[i : i + step] for i in range(0, len(data), step)]
                for i, fr in enumerate(fs):
                    paths.append(path)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"path": paths, "frame_idx": idxs, "frame": frames})

    schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )
    return df.select("path", "content").mapInPandas(split_frames, schema)
