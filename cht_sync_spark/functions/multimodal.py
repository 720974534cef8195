"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition sizing, Arrow batch shape,
mapInPandas signatures) is real and tested. ``decode=real`` decodes real
bytes: Pillow when importable (full codec surface), else a pure-stdlib
header parser for PNG/JPEG/GIF/BMP image dimensions and ``wave`` for WAV
duration — so common formats decode for real even in codec-less
containers; payloads neither path understands yield null dims (or raise
under ``strict=True``). ``decode=fake`` derives deterministic
pseudo-metadata from the bytes — letting every downstream operator
(resize planning, frame sampling, feature batching) be exercised at full
fidelity without any codec.
"""

from __future__ import annotations

import hashlib
import io
import struct
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


# channels by PNG color type (IHDR byte 25): gray, rgb, palette, gray+a, rgba
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG start-of-frame markers (baseline/extended/progressive/lossless)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB}


def parse_image_header(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from real container headers — PNG, JPEG,
    GIF87a/89a, BMP — pure stdlib byte-parsing, no codec library. Returns
    None for anything else (the caller decides null-vs-raise)."""
    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h), _PNG_CHANNELS.get(b[25], 3)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h), 3
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return int(w), abs(int(h)), 3
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # scan marker segments for a start-of-frame header
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
                i += 2
                continue
            if i + 4 > len(b):
                return None
            seg = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF and i + 9 < len(b):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h), int(b[i + 9])
            i += 2 + seg
    return None


def parse_wav_duration_ms(b: bytes) -> int | None:
    """WAV duration via the stdlib ``wave`` module; None if not a WAV."""
    import wave

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as w:
            rate = w.getframerate()
            if rate <= 0:
                return None
            return int(round(w.getnframes() * 1000 / rate))
    except Exception:
        return None


def _real_decode_row(kind: str, b: bytes, strict: bool) -> dict:
    """One payload through the real path: Pillow if importable, else the
    stdlib header parsers. Unparseable -> null dims (or raise)."""
    w = h = ch = dur = None
    try:
        from PIL import Image  # full codec surface when present

        if kind in ("image", "video"):
            try:
                with Image.open(io.BytesIO(b)) as im:
                    w, h = im.size
                    ch = len(im.getbands())
            except Exception:
                pass
    except ImportError:
        pass
    if w is None and kind in ("image", "video"):
        parsed = parse_image_header(b)
        if parsed is not None:
            w, h, ch = parsed
    if kind in ("audio", "video") and dur is None:
        dur = parse_wav_duration_ms(b)
    if strict and w is None and dur is None:
        raise ValueError(
            f"real decode: unrecognized {kind} payload ({len(b)} bytes; "
            "supported without Pillow: PNG/JPEG/GIF/BMP headers, WAV)"
        )
    return {
        "width": w,
        "height": h,
        "channels": ch if kind == "image" else None,
        "duration_ms": dur,
    }


def decode_media(
    df: DataFrame,
    mode: Literal["fake", "real"] = "fake",
    batch_size_hint: int = 1024,
    strict: bool = False,
) -> DataFrame:
    """Decode payloads to typed metadata via mapInPandas (Arrow batches).

    ``real`` decodes actual bytes: Pillow when importable, else stdlib
    header parsing (PNG/JPEG/GIF/BMP dims, WAV duration); payloads
    neither path understands yield null dims, or raise with
    ``strict=True``. ``fake`` derives width/height/channels/duration
    deterministically from the payload bytes, so partitioning, batch
    shapes and downstream logic are fully exercised without any codec.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if mode == "real":
                    dims = _real_decode_row(kind, b, strict)
                else:
                    h = hashlib.sha256(b).digest()
                    dims = {
                        "width": 16 + h[0] % 240 if kind in ("image", "video") else None,
                        "height": 16 + h[1] % 240 if kind in ("image", "video") else None,
                        "channels": 1 + h[2] % 4 if kind == "image" else None,
                        "duration_ms": 100 + h[3] * 37 if kind in ("audio", "video") else None,
                    }
                out.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": len(b),
                        **dims,
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
