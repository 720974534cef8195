"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition sizing, Arrow batch shape,
mapInPandas signatures) is real and tested. The actual byte decoding is
STUBBED: the decode libraries are not in this container, so ``decode=real``
raises NotImplementedError while ``decode=fake`` derives deterministic
pseudo-metadata from the bytes — letting every downstream operator
(resize planning, frame sampling, feature batching) be exercised at full
fidelity without the codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Literal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary plumbing can run against the driver-provided tables."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("origin"), F.lit("documents")).alias("meta"),
    )


def decode_media(df: DataFrame, mode: Literal["fake", "real"] = "fake", batch_size_hint: int = 1024) -> DataFrame:
    """Decode payloads to typed metadata via mapInPandas (Arrow batches).

    ``real`` is the integration point for PIL/ffmpeg-style codecs — not
    available in this container, so it raises. ``fake`` derives width/
    height/channels/duration deterministically from the payload bytes, so
    partitioning, batch shapes and downstream logic are fully exercised.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real media decode requires codec libraries not present in this environment"
                )
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = hashlib.sha256(b).digest()
                w = 16 + h[0] % 240
                ht = 16 + h[1] % 240
                out.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": len(b),
                        "width": w if kind in ("image", "video") else None,
                        "height": ht if kind in ("image", "video") else None,
                        "channels": 1 + h[2] % 4 if kind == "image" else None,
                        "duration_ms": 100 + h[3] * 37 if kind in ("audio", "video") else None,
                        "sha256": hashlib.sha256(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(_decode, DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning (pure Catalyst): scale factors + output dims for the
    shorter-side=target policy; a real resizer consumes this plan."""
    short = F.least("width", "height")
    scale = F.when(short.isNotNull() & (short > 0), F.lit(target) / short.cast("double"))
    return decoded.where(F.col("width").isNotNull()).select(
        "media_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"),
    )


def frame_sample_plan(decoded: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video/audio: timestamps to decode, exploded
    from duration — sequence+explode, columnar."""
    return decoded.where(F.col("duration_ms").isNotNull()).select(
        "media_id",
        "kind",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ms"),
    )
