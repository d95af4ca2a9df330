"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (SURVEY §7.6 / task brief): media travels as a ``binary`` column with
a metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas`` so each executor processes
whole record batches (the only sane shape at 100 TB: media bytes never hit
the driver, work is partition-parallel, Python cost is amortized per batch).

Pixel-level codec calls are STUBBED (image/audio libraries are not in this
environment), but metadata decode is real: ``decode_image_meta`` parses PNG
IHDR and walks JPEG SOF markers for true dimensions with no library. The
Spark-side plumbing -- schema, batching, UDF signatures, partitioning -- is
real and tested with deterministic synthetic payloads.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("meta_format", StringType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_bytes", LongType(), True),
    ]
)


def make_synthetic_png(width: int, height: int) -> bytes:
    """Deterministic PNG-header-shaped payload (real IHDR layout)."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return sig + ihdr + b"\x00" * 16


def make_synthetic_jpeg(width: int, height: int) -> bytes:
    """Deterministic JPEG-shaped payload: SOI, an APP0 segment, a baseline
    SOF0 frame header carrying the dimensions, EOI -- the real marker
    structure a codec would emit."""
    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # SOF0: len(8+3*ncomp=17 for 3 components), precision, height, width, ncomp
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return soi + app0 + sof0 + b"\xff\xd9"


# SOF markers carry frame dimensions: C0-CF except DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF_MARKERS = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def jpeg_dimensions(content: bytes) -> tuple[int, int]:
    """Scan JPEG marker segments for the SOF frame header and return
    (width, height). Pure byte-walk, no image library: each marker is
    0xFF <code> <u16 length incl. itself>; SOFn payload is
    precision(1) height(2) width(2). Raises ValueError on truncated or
    SOF-less streams."""
    i = 2  # past SOI
    n = len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {i}")
        marker = content[i + 1]
        if marker == 0xD9:  # EOI before any SOF
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone RST/TEM
            i += 2
            continue
        seglen = struct.unpack(">H", content[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF_MARKERS:
            if i + 9 > n:
                raise ValueError("truncated SOF segment")
            height, width = struct.unpack(">HH", content[i + 5 : i + 9])
            return (width, height)
        i += 2 + seglen
    raise ValueError("no SOF marker found")


def decode_image_meta(content: bytes) -> tuple[str, int, int]:
    """Parse (format, width, height) from the payload bytes.

    PNG (IHDR) and JPEG (SOF marker walk, jpeg_dimensions) are parsed for
    real -- no image library needed for dimensions; formats needing a codec
    report 'unknown'."""
    if content is None or len(content) < 8:
        return ("unknown", -1, -1)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", content[16:24])
        return ("png", w, h)
    if content[:3] == b"\xff\xd8\xff":
        try:
            w, h = jpeg_dimensions(content)
            return ("jpeg", w, h)
        except ValueError:
            return ("jpeg", -1, -1)
    return ("unknown", -1, -1)


def extract_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas pass filling the meta_* columns from the payload.

    One Arrow batch at a time; output schema is fixed so downstream plans
    (partition pruning on kind, filters on dimensions) stay columnar."""
    out_schema = StructType(
        [f for f in df.schema.fields if not f.name.startswith("meta_")]
        + [
            StructField("meta_format", StringType(), True),
            StructField("meta_width", IntegerType(), True),
            StructField("meta_height", IntegerType(), True),
            StructField("meta_bytes", LongType(), True),
        ]
    )
    keep_cols = [f.name for f in df.schema.fields if not f.name.startswith("meta_")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, sizes = [], [], [], []
            for content in pdf[content_col]:
                fmt, w, h = decode_image_meta(bytes(content) if content is not None else None)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                sizes.append(len(content) if content is not None else 0)
            out = pdf[keep_cols].copy()
            out["meta_format"] = fmts
            out["meta_width"] = pd.array(ws, dtype="int32")
            out["meta_height"] = pd.array(hs, dtype="int32")
            out["meta_bytes"] = pd.array(sizes, dtype="int64")
            yield out

    return df.mapInPandas(run, out_schema)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: recomputes metadata, keeps bytes opaque.

    A real implementation swaps the identity transform for a codec call
    inside the same mapInPandas body; the plan shape (no shuffle, columnar
    in/out) is already the production one."""
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["meta_width"] = pd.array([target_w] * len(pdf), dtype="int32")
            out["meta_height"] = pd.array([target_h] * len(pdf), dtype="int32")
            yield out

    return df.mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    Frame decode is stubbed (no video lib); the explode + per-frame row
    layout is the real production shape (frames become independent rows for
    downstream parallel feature extraction)."""
    n_frames = (F.coalesce(F.col("meta_bytes"), F.lit(0)) / 1000).cast("int") + 1  # stub: 1 frame per KB
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))))
        .select("media_id", "frame_idx", F.lit(None).cast("binary").alias("frame_content"))
    )
