"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns beside typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms, so each executor processes whole record
batches without JVM↔Python per-row overhead.

Codec status (r8): BMP (24-bpp BI_RGB) and PNG (8-bit gray/RGB/RGBA,
non-interlaced, all five scanline filters) DECODE REAL BYTES with
stdlib-only parsing (``struct`` + ``zlib`` — no image libraries in
this container), producing true dimensions and pixel-derived
features. JPEG / audio / video remain STUBBED behind the
deterministic ``_fake_decode`` (clearly marked below); a real
deployment swaps that one function for PIL/libav while everything
around it — Arrow batching, schemas, partitioning, UDF signatures —
is already the production plumbing.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB — deterministic stand-in for a real image/audio decode.

    A real deployment swaps this one function for PIL/libav decode;
    everything around it (Arrow batching, schema, partitioning) is the
    production plumbing. Raises nothing: any bytes 'decode'.
    """
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, feature


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_bmp(p: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Stdlib BMP decode — 24-bpp uncompressed BI_RGB with a
    BITMAPINFOHEADER, the format every screenshot tool and the
    reference's own .bmp artifacts use. Returns (width, height,
    row-major top-down RGB pixels). Raises ValueError on anything
    else (caller falls back to the stub)."""
    if len(p) < 54 or p[:2] != b"BM":
        raise ValueError("not BMP")
    data_off = struct.unpack_from("<I", p, 10)[0]
    if struct.unpack_from("<I", p, 14)[0] != 40:
        raise ValueError("only BITMAPINFOHEADER")
    w = struct.unpack_from("<i", p, 18)[0]
    h = struct.unpack_from("<i", p, 22)[0]
    planes = struct.unpack_from("<H", p, 26)[0]
    bpp = struct.unpack_from("<H", p, 28)[0]
    comp = struct.unpack_from("<I", p, 30)[0]
    if planes != 1 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError("only 24-bpp BI_RGB")
    flip = h > 0  # positive height = bottom-up row order
    ah = abs(h)
    row_sz = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if data_off + row_sz * ah > len(p):
        raise ValueError("truncated pixel data")
    pix: list[tuple[int, int, int]] = []
    for r in range(ah):
        src = data_off + row_sz * ((ah - 1 - r) if flip else r)
        for c in range(w):
            b, g, rr = p[src + 3 * c], p[src + 3 * c + 1], p[src + 3 * c + 2]
            pix.append((rr, g, b))
    return w, ah, pix


def _decode_png(p: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Stdlib PNG decode — 8-bit grayscale/RGB/RGBA, non-interlaced:
    chunk walk, zlib-inflate the IDAT stream (``zlib`` IS the PNG
    compression), undo the five scanline filters (None/Sub/Up/
    Average/Paeth, RFC 2083 §6). Alpha is dropped; gray expands to
    RGB. Returns (width, height, row-major RGB pixels); raises
    ValueError on unsupported shapes (16-bit, palette, interlaced)."""
    if not p.startswith(_PNG_MAGIC):
        raise ValueError("not PNG")
    off = 8
    idat = b""
    w = h = ch = None
    while off + 8 <= len(p):
        ln, typ = struct.unpack_from(">I4s", p, off)
        data = p[off + 8 : off + 8 + ln]
        if typ == b"IHDR":
            w, h, bd, ct, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if bd != 8 or ct not in (0, 2, 6) or comp or filt or inter:
                raise ValueError("only 8-bit gray/RGB/RGBA non-interlaced")
            ch = {0: 1, 2: 3, 6: 4}[ct]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        off += 12 + ln
    if not (w and h and ch and idat):
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) < (stride + 1) * h:
        raise ValueError("truncated scanlines")
    prev = bytearray(stride)
    pix: list[tuple[int, int, int]] = []
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter byte {ft}")
        prev = line
        for c in range(w):
            if ch == 1:
                v = line[c]
                pix.append((v, v, v))
            elif ch == 3:
                pix.append((line[3 * c], line[3 * c + 1], line[3 * c + 2]))
            else:
                pix.append((line[4 * c], line[4 * c + 1], line[4 * c + 2]))
    return w, h, pix


def _pixel_feature(pix: list[tuple[int, int, int]]) -> list[float]:
    """8-float feature from REAL pixels, all in [0, 1]: per-channel
    means, gray mean/min/max, bright-pixel fraction, gray stddev —
    the classic cheap image-quality/dedup signature (same width as the
    stub's sha256 feature, so the DECODED_SCHEMA is format-agnostic)."""
    n = len(pix)
    mr = sum(q[0] for q in pix) / (255.0 * n)
    mg = sum(q[1] for q in pix) / (255.0 * n)
    mb = sum(q[2] for q in pix) / (255.0 * n)
    gray = [(q[0] + q[1] + q[2]) / 3.0 for q in pix]
    mgray = sum(gray) / (255.0 * n)
    gmin = min(gray) / 255.0
    gmax = max(gray) / 255.0
    bright = sum(1 for g in gray if g >= 128.0) / n
    var = sum((g / 255.0 - mgray) ** 2 for g in gray) / n
    return [mr, mg, mb, mgray, gmin, gmax, bright, math.sqrt(var)]


def _decode_payload(p: bytes) -> tuple[int, int, list[float]]:
    """Format-sniffing decode: REAL stdlib decode for BMP/PNG magic
    bytes (a UTF-8 text payload can never false-positive — both
    parsers require NUL-bearing headers), deterministic stub for
    everything else (JPEG/audio/video — honestly labeled) and for
    corrupt image bytes (production would route those to quarantine;
    here they keep the ingest total-function contract)."""
    try:
        if p[:2] == b"BM":
            w, h, pix = _decode_bmp(p)
            return w, h, _pixel_feature(pix)
        if p.startswith(_PNG_MAGIC):
            w, h, pix = _decode_png(p)
            return w, h, _pixel_feature(pix)
    except (ValueError, zlib.error, struct.error, IndexError):
        # Corrupt bytes surface differently per layer: truncated IHDR
        # → struct.error, bad IDAT stream → zlib.error, semantic
        # violations → ValueError, short filtered scanlines →
        # IndexError.  All must fall through to the stub so one bad
        # file can't fail a corpus-scale ingest task.
        pass
    return _fake_decode(p)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from any source column — the ingest shape
    a binary-bearing parquet would give (payload + typed metadata)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )


def decode_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    Keeps media_id/media_type/byte_len typed columns; adds width,
    height and a fixed-width float feature vector. Partitioning is
    preserved — no shuffle; each task maps its batches independently,
    which is exactly the 100 TB behavior you want for codec work."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(_map, schema=DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """'Resize': scale the fake dimensions to fit max_side, preserving
    aspect ratio — pure column arithmetic; a real resize would be a
    second mapInPandas over payloads."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    # Atomic withColumns: chained withColumn calls would rebind the
    # `scale` expression's width reference to the already-resized width
    # when computing height (found by the DuckDB oracle).
    return decoded.withColumns(
        {
            "width": F.ceil(F.col("width") * scale).cast("int"),
            "height": F.ceil(F.col("height") * scale).cast("int"),
        }
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling': one row per sampled offset per payload —
    the explode shape a video frame sampler produces (frame index +
    frame payload slice), with deterministic fake frames."""
    n_frames = F.least(
        F.greatest((F.col("byte_len") / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(1), n_frames)).alias("frame_idx", "_f"),
        F.substring(F.col("payload"), F.col("_f") * every_n_bytes, every_n_bytes).alias("frame_payload"),
    ).select("media_id", "frame_idx", F.col("frame_payload"))
