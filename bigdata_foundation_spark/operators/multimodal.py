"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns beside typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms, so each executor processes whole record
batches without JVM↔Python per-row overhead.

Codec status (r11): BMP (uncompressed 24/32-bpp BI_RGB and 8-bpp
palette); PNG (gray 1/2/4/8/16-bit,
RGB 8/16, palette 1/2/4/8, RGBA 8/16 — non-interlaced AND Adam7,
all five scanline filters; 16-bit narrows to the high byte); JPEG —
BASELINE (ITU T.81 SOF0 sequential DCT) AND PROGRESSIVE (SOF2, full
spectral selection + successive approximation) — 8-bit gray/YCbCr,
any sampling factors, restart markers, fill bytes; GIF (87a/89a,
real LZW, global/local color tables, interlacing, transparency,
region-frame compositing, animation frame sampling); WAV (RIFF,
8/16/24-bit integer PCM, 32-bit IEEE-float PCM, and IMA ADPCM —
format 17, a real compressed-audio codec — any channel count); and
uncompressed AVI (RIFF 'AVI ', 24-bpp DIB frames) all
DECODE REAL BYTES with stdlib+numpy-only parsing (``struct`` +
``zlib`` + the vectorized IDCT below — no image/audio/video
libraries in this container), producing true dimensions / frame
counts and pixel/sample-derived features. r11: the pixel/sample hot
paths (frame decode, JPEG render, feature reductions, sub-byte
unpack, palette lookup) are numpy-vectorized — per-byte Python
loops remain only where the format is inherently sequential
(huffman entropy decode, PNG filters with intra-row dependencies).

PERMANENT STUB BOUNDARY (terminal under the stdlib+numpy-only
constraint, mirroring COVERAGE.md's "permanently rows-only" sketch
precedent): arithmetic-coded (SOF9-SOFB), hierarchical (SOF5-7,
SOFD-F) and 12-bit JPEG; perceptual/entropy-coded audio (MP3/AAC —
IMA ADPCM, a plain differential quantizer over public tables, is
IMPLEMENTED, r11); H.264/VP9 and every other compressed video
codec. These
require entire published coding systems (MDCT psychoacoustics,
CABAC, motion compensation) or patent-encumbered arithmetic coders
— not a struct-parse away. They route to the deterministic
``_fake_decode`` (clearly marked below); a real deployment swaps
that ONE function for PIL/libav while everything around it — Arrow
batching, schemas, partitioning, UDF signatures — is already the
production plumbing.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from collections.abc import Iterator

import numpy as np
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
    """STUB — deterministic stand-in for the decoders NOT implemented
    here (arithmetic/hierarchical JPEG, compressed audio, compressed
    video; corrupt bytes of any format also land here so ingest stays
    a total function).

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


def _decode_bmp(p: bytes) -> tuple[int, int, "np.ndarray"]:
    """Stdlib+numpy BMP decode — BITMAPINFOHEADER, uncompressed:
    24-bpp BI_RGB (the screenshot default and the reference's own
    .bmp artifacts), plus r11: 32-bpp BI_RGB (BGRX, alpha lane
    dropped) and 8-bpp palette (BGRX color-table lookup). Returns
    (width, height, row-major top-down RGB pixels as a uint8 (h·w, 3)
    array — one ``frombuffer``/reshape/stride-slice, no per-pixel
    Python). Raises ValueError on anything else (caller falls back to
    the stub)."""
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
    clr_used = struct.unpack_from("<I", p, 46)[0]
    if planes != 1 or bpp not in (8, 24, 32) or comp != 0 or w <= 0 or h == 0:
        raise ValueError("only uncompressed 8/24/32-bpp BI_RGB")
    flip = h > 0  # positive height = bottom-up row order
    ah = abs(h)
    bypp = bpp // 8
    row_sz = (w * bypp + 3) & ~3  # rows pad to 4 bytes
    if data_off + row_sz * ah > len(p):
        raise ValueError("truncated pixel data")
    rows = np.frombuffer(p, dtype=np.uint8, count=row_sz * ah, offset=data_off)
    rows = rows.reshape(ah, row_sz)
    if flip:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + 40  # color table follows the BITMAPINFOHEADER
        if pal_off + 4 * n_colors > data_off or pal_off + 4 * n_colors > len(p):
            raise ValueError("bmp: truncated color table")
        pal = np.frombuffer(p, dtype=np.uint8, count=4 * n_colors, offset=pal_off)
        pal = pal.reshape(-1, 4)[:, 2::-1]  # BGRX → RGB
        idx = rows[:, :w]
        if int(idx.max()) >= n_colors:
            raise ValueError("bmp: palette index out of range")
        pix = pal[idx]
    else:
        pix = rows[:, : w * bypp].reshape(ah, w, bypp)[:, :, 2::-1]  # BGR(X) → RGB
    return w, ah, np.ascontiguousarray(pix).reshape(-1, 3)


_ADAM7 = [  # (x0, y0, dx, dy) per pass — PNG spec §8.2
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _decode_png(p: bytes) -> tuple[int, int, "np.ndarray"]:
    """Stdlib+numpy PNG decode — r11 widens coverage to the full
    practical PNG matrix: grayscale (bit depths 1/2/4/8/16), RGB
    (8/16), palette (1/2/4/8, PLTE lookup), RGBA (8/16), BOTH
    non-interlaced and Adam7-interlaced. Chunk walk, zlib-inflate the
    IDAT stream (``zlib`` IS the PNG compression), undo the five
    scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) — per
    Adam7 pass when interlaced (each pass filters as an independent
    image; deinterlace is a numpy strided scatter). Alpha is dropped;
    gray expands to RGB scaled to full range (×255/(2^bd−1), exact in
    integers); 16-bit narrows to the high byte (the standard 8-bit
    display convention — documented lossy narrowing, like JFIF's
    full-range YCbCr). Filters Sub/Average/Paeth keep their scalar
    loop (each byte depends on the previous RECONSTRUCTED byte —
    inherent serial chain); None/Up, sub-byte unpack (unpackbits),
    palette lookup and assembly are numpy. Returns (width, height,
    row-major RGB uint8 (h·w, 3)); raises ValueError on malformed
    structure (caller falls back to the stub)."""
    if not p.startswith(_PNG_MAGIC):
        raise ValueError("not PNG")
    off = 8
    idat = b""
    plte = None
    w = h = None
    bd = ct = inter = 0
    while off + 8 <= len(p):
        ln, typ = struct.unpack_from(">I4s", p, off)
        data = p[off + 8 : off + 8 + ln]
        if typ == b"IHDR":
            w, h, bd, ct, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 6: (8, 16)}
            if ct not in legal or bd not in legal[ct] or comp or filt or inter > 1:
                raise ValueError("png: illegal IHDR combination")
        elif typ == b"PLTE":
            if ln % 3:
                raise ValueError("png: bad PLTE length")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        off += 12 + ln
    if not (w and h and idat):
        raise ValueError("missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}[ct]
    bpp_bits = bd * channels
    fbpp = max(1, bpp_bits // 8)  # filter byte offset (spec: floor, min 1)
    raw = zlib.decompress(idat)

    def unfilter(off: int, wpx: int, hpx: int) -> tuple["np.ndarray", int]:
        """Undo filters for one (sub-)image of wpx × hpx; returns the
        reconstructed byte matrix and the new offset into ``raw``."""
        stride = (wpx * bpp_bits + 7) // 8
        if len(raw) - off < (stride + 1) * hpx:
            raise ValueError("truncated scanlines")
        out = np.empty((hpx, stride), dtype=np.uint8)
        prev = bytearray(stride)
        pos = off
        for r in range(hpx):
            ft = raw[pos]
            pos += 1
            line = bytearray(raw[pos : pos + stride])
            pos += stride
            if ft == 1:  # Sub
                for i in range(fbpp, stride):
                    line[i] = (line[i] + line[i - fbpp]) & 0xFF
            elif ft == 2:  # Up — no intra-row dependency: vectorized
                np.add(
                    np.frombuffer(bytes(line), dtype=np.uint8),
                    out[r - 1] if r else np.zeros(stride, dtype=np.uint8),
                    out=out[r],
                )
                prev = bytearray(out[r].tobytes())
                continue
            elif ft == 3:  # Average
                for i in range(stride):
                    a = line[i - fbpp] if i >= fbpp else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(stride):
                    a = line[i - fbpp] if i >= fbpp else 0
                    b = prev[i]
                    c = prev[i - fbpp] if i >= fbpp else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (line[i] + pr) & 0xFF
            elif ft != 0:
                raise ValueError(f"bad filter byte {ft}")
            prev = line
            out[r] = np.frombuffer(bytes(line), dtype=np.uint8)
        return out, pos

    def samples(block: "np.ndarray", wpx: int, hpx: int) -> "np.ndarray":
        """Byte matrix → (hpx, wpx, channels) uint8 sample grid."""
        if bd == 8:
            return block[:, : wpx * channels].reshape(hpx, wpx, channels)
        if bd == 16:  # high-byte narrowing (documented)
            return block[:, : wpx * channels * 2].reshape(hpx, wpx, channels, 2)[
                :, :, :, 0
            ]
        bits = np.unpackbits(block, axis=1)[:, : wpx * bd].reshape(hpx, wpx, bd)
        weights = (1 << np.arange(bd - 1, -1, -1)).astype(np.uint8)
        return (bits * weights).sum(axis=2).astype(np.uint8)[:, :, None]

    if inter == 0:
        block, _pos = unfilter(0, w, h)
        img = samples(block, w, h)
    else:  # Adam7: seven independently-filtered passes, strided scatter
        img = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            block, pos = unfilter(pos, pw, ph)
            img[y0::dy, x0::dx] = samples(block, pw, ph)

    if ct == 3:
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        idx = img[:, :, 0]
        if int(idx.max()) >= plte.shape[0]:
            raise ValueError("png: palette index out of range")
        pix = plte[idx]
    elif ct == 0:
        v = img[:, :, 0]
        if bd < 8:  # scale to full range: 255/(2^bd - 1) is an exact int
            v = (v.astype(np.uint16) * (255 // ((1 << bd) - 1))).astype(np.uint8)
        pix = np.repeat(v[:, :, None], 3, axis=2)
    elif ct == 2:
        pix = img
    else:
        pix = img[:, :, :3]
    return w, h, np.ascontiguousarray(pix).reshape(-1, 3)


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_IDCT_BASIS: list[list[float]] | None = None


def _idct_basis() -> list[list[float]]:
    """8-point DCT-III basis matrix B[x][u] = c(u)/2 · cos((2x+1)uπ/16)
    — precomputed once; the 2-D IDCT is B·X·Bᵀ (ITU T.81 A.3.3)."""
    global _IDCT_BASIS
    if _IDCT_BASIS is None:
        _IDCT_BASIS = [
            [
                (math.sqrt(0.125) if u == 0 else 0.5)
                * math.cos((2 * x + 1) * u * math.pi / 16.0)
                for u in range(8)
            ]
            for x in range(8)
        ]
    return _IDCT_BASIS


class _JpegBits:
    """MSB-first bit reader over the entropy-coded segment with JPEG
    byte stuffing (0xFF 0x00 → literal 0xFF) and restart-marker
    awareness (T.81 §B.1.1.5)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d, p = self.d, self.pos
        if p >= len(d):
            raise ValueError("jpeg: truncated entropy data")
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                pass  # stuffed 0xFF — consume the 0x00 when advancing
            else:
                raise ValueError("jpeg: hit marker inside entropy data")
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if byte == 0xFF else 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 §E.2.4)."""
        self.bit = 0
        d = self.d
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("jpeg: missing restart marker")
        self.pos += 2


def _jpeg_huff_decode(bits: _JpegBits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: bad huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): map the t-bit magnitude to its signed
    coefficient value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg(p: bytes) -> tuple[int, int, "np.ndarray"]:
    """Stdlib JPEG decode (ITU T.81) — BASELINE (SOF0, sequential DCT)
    and PROGRESSIVE (SOF2, r10: full spectral selection AND successive
    approximation, interleaved DC / non-interleaved AC scans, EOB runs,
    restart markers, tables redefined between scans). 8-bit, 1 or 3
    components, any sampling factors.

    Architecture (r10 rework): every scan entropy-decodes into
    per-component COEFFICIENT planes (quantized-domain ints in zigzag
    order, the representation progressive scans refine across
    multiple passes); rendering — dequantize, 2-D float IDCT,
    nearest-neighbor chroma upsample, YCbCr→RGB (JFIF full-range) —
    happens once at EOI. For SOF0 this stages through the same planes
    the old inline decoder filled block-at-a-time; pixels are
    bit-identical (same arithmetic, same order per block). Returns
    (width, height, row-major top-down RGB uint8 (h·w, 3) array —
    r11: render is numpy einsum/index-array work, the per-pixel
    Python loop is gone). Raises ValueError on
    arithmetic coding / 12-bit / hierarchical / CMYK — the caller
    falls back to the labeled stub for those."""
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        raise ValueError("not JPEG")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, tq)
    restart = 0
    progressive = False
    coef: list[list[list[list[int]]]] = []  # [ci][by][bx][64] zigzag ints
    hmax = vmax = mcux = mcuy = 1
    eobrun = 0
    n_scans = 0

    def alloc_planes() -> None:
        nonlocal hmax, vmax, mcux, mcuy
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for _cid, hs, vs, _tq in comps:
            coef.append(
                [[[0] * 64 for _ in range(mcux * hs)] for _ in range(mcuy * vs)]
            )

    def decode_scan(scan, ss, se, ah, al, bits):
        """Entropy-decode ONE scan into the coefficient planes
        (``scan`` = [(ci, dc_table, ac_table)]). Covers all four
        progressive scan kinds (T.81 G.2): DC first / DC refine
        (interleaved or not), AC first / AC refine (single-component
        only), plus the sequential full-spectrum scan SOF0 uses."""
        nonlocal eobrun
        eobrun = 0
        interleaved = len(scan) > 1
        if interleaved:
            n_units = mcux * mcuy
            nx_used = mcux
        else:
            ci0 = scan[0][0]
            _cid, hs0, vs0, _tq = comps[ci0]
            cw = -(-(w * hs0) // hmax)
            ch = -(-(h * vs0) // vmax)
            nx_used, ny_used = -(-cw // 8), -(-ch // 8)
            n_units = nx_used * ny_used

        def block_seq(blk, dc_t, ac_t, pred):
            # sequential (baseline) block: DC diff + AC run/size to 63
            t = _jpeg_huff_decode(bits, huff[(0, dc_t)])
            pred += _jpeg_extend(bits.receive(t), t)
            blk[0] = pred
            k = 1
            while k < 64:
                rs = _jpeg_huff_decode(bits, huff[(1, ac_t)])
                r, sz = rs >> 4, rs & 0xF
                if sz == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("jpeg: AC index overflow")
                blk[k] = _jpeg_extend(bits.receive(sz), sz)
                k += 1
            return pred

        def block_dc_first(blk, dc_t, pred):
            t = _jpeg_huff_decode(bits, huff[(0, dc_t)])
            pred += _jpeg_extend(bits.receive(t), t)
            blk[0] = pred << al
            return pred

        def block_dc_refine(blk):
            if bits.read_bit():
                blk[0] |= 1 << al

        def block_ac_first(blk, ac_t):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = _jpeg_huff_decode(bits, huff[(1, ac_t)])
                r, sz = rs >> 4, rs & 0xF
                if sz == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("jpeg: AC index overflow")
                blk[k] = _jpeg_extend(bits.receive(sz), sz) << al
                k += 1

        def refine_nonzero(blk, k):
            # correction bit for a history-nonzero coefficient (G.1.2.3)
            if bits.read_bit():
                bit = 1 << al
                if blk[k] > 0 and not (blk[k] & bit):
                    blk[k] += bit
                elif blk[k] < 0 and not (-blk[k] & bit):
                    blk[k] -= bit

        def block_ac_refine(blk, ac_t):
            nonlocal eobrun
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _jpeg_huff_decode(bits, huff[(1, ac_t)])
                    r, sz = rs >> 4, rs & 0xF
                    newval = 0
                    if sz == 0:
                        if r != 15:
                            # EOB run INCLUDING this block — which still
                            # consumes its remaining correction bits in
                            # the eobrun tail below (then decrements),
                            # so unlike the AC-first path the count here
                            # is the full (1<<r)+extra
                            eobrun = 1 << r
                            if r:
                                eobrun += bits.receive(r)
                            break
                        # ZRL: pass over 16 zero-HISTORY coefficients
                    else:
                        if sz != 1:
                            raise ValueError("jpeg: bad AC refine size")
                        newval = (1 << al) if bits.read_bit() else -(1 << al)
                    # advance: correction bits on nonzero history, count
                    # zero-history positions down r
                    while k <= se:
                        if blk[k] != 0:
                            refine_nonzero(blk, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB run: correction bits for the remaining nonzero
                # history coefficients of this block
                while k <= se:
                    if blk[k] != 0:
                        refine_nonzero(blk, k)
                    k += 1
                eobrun -= 1

        def one_block(ci, dc_t, ac_t, blk, pred):
            if not progressive:
                return block_seq(blk, dc_t, ac_t, pred)
            if ss == 0:
                if ah == 0:
                    return block_dc_first(blk, dc_t, pred)
                block_dc_refine(blk)
                return pred
            if ah == 0:
                block_ac_first(blk, ac_t)
            else:
                block_ac_refine(blk, ac_t)
            return pred

        pred = [0] * len(comps)
        n_mcu = 0
        for unit in range(n_units):
            if restart and n_mcu and n_mcu % restart == 0:
                bits.align_restart()
                pred = [0] * len(comps)
                eobrun = 0
            n_mcu += 1
            if interleaved:
                my, mx = divmod(unit, mcux)
                for ci, dc_t, ac_t in scan:
                    _cid, hs, vs, _tq = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            blk = coef[ci][my * vs + by][mx * hs + bx]
                            pred[ci] = one_block(ci, dc_t, ac_t, blk, pred[ci])
            else:
                ci, dc_t, ac_t = scan[0]
                by, bx = divmod(unit, nx_used)
                blk = coef[ci][by][bx]
                pred[ci] = one_block(ci, dc_t, ac_t, blk, pred[ci])
        return bits

    pos = 2
    while pos + 2 <= len(p):
        if p[pos] != 0xFF:
            raise ValueError("jpeg: bad marker")
        marker = p[pos + 1]
        if marker == 0xFF:
            # repeated 0xFF is legal fill padding before any marker
            # (T.81 §B.1.1.2) — skip it byte-by-byte (r10 advisor
            # finding: treating the second 0xFF as a marker id
            # misparsed the following segment length)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only SOF0/SOF2 supported")
        if pos + 4 > len(p):
            break
        ln = struct.unpack_from(">H", p, pos + 2)[0]
        seg = p[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables")
                qt[tq] = list(seg[o + 1 : o + 65])
                o += 65
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8 or nc not in (1, 3):
                raise ValueError("jpeg: only 8-bit gray/YCbCr")
            comps = [
                (seg[6 + 3 * i], seg[7 + 3 * i] >> 4, seg[7 + 3 * i] & 0xF, seg[8 + 3 * i])
                for i in range(nc)
            ]
            if w == 0 or h == 0:
                raise ValueError("jpeg: zero-pixel frame")
            alloc_planes()
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                counts = list(seg[o + 1 : o + 17])
                syms = seg[o + 17 : o + 17 + sum(counts)]
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for bit_ln in range(1, 17):
                    for _ in range(counts[bit_ln - 1]):
                        table[(bit_ln, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                o += 17 + sum(counts)
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if w is None or not comps:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            cid_index = {c[0]: i for i, c in enumerate(comps)}
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cid_index[cid], tabs >> 4, tabs & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            aa = seg[3 + 2 * ns]
            ah, al = aa >> 4, aa & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            if ss > se or se > 63 or (progressive and ss == 0 and se != 0):
                raise ValueError("jpeg: bad spectral range")
            if progressive and ss > 0 and len(scan) != 1:
                raise ValueError("jpeg: interleaved AC scan")
            bits = _JpegBits(p, pos + 2 + ln)
            decode_scan(scan, ss, se, ah, al, bits)
            n_scans += 1
            # advance to the next marker after the entropy segment.
            # 0xFF 0xFF is legal fill padding before a marker (T.81
            # §B.1.1.2) — skip it rather than treating the second
            # 0xFF as a marker id (r10 advisor finding).
            q = bits.pos
            while q + 1 < len(p) and not (
                p[q] == 0xFF
                and p[q + 1] not in (0x00, 0xFF)
                and not (0xD0 <= p[q + 1] <= 0xD7)
            ):
                q += 1
            pos = q
            continue
        pos += 2 + ln
    if w is None or not comps or not coef or n_scans == 0:
        # n_scans guards the headers-only case (SOF parsed, planes
        # allocated, no SOS ever decoded): without it a truncated JPEG
        # would "decode" to a fabricated all-gray image instead of
        # falling back to the stub (r10 self-review finding).
        raise ValueError("jpeg: missing SOF/SOS")

    # ---- render (r11: vectorized): dequantize + IDCT every block in
    # one einsum per component, then index-array upsample + matrix
    # YCbCr→RGB. Rounding is the same half-up-then-clamp the scalar
    # renderer used: clip(floor(v + 0.5), 0, 255) ≡
    # "0 if v<0 else 255 if v>255 else int(v+0.5)" for every float v.
    basis = np.asarray(_idct_basis())  # (8, 8) B[x][u]
    zz = np.asarray(_ZIGZAG)
    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        q = np.asarray(qt[tq], dtype=np.float64)  # (64,)
        nby, nbx = mcuy * vs, mcux * hs
        deq = np.asarray(coef[ci], dtype=np.float64) * q  # (nby, nbx, 64)
        blocks = np.zeros((nby, nbx, 8, 8))
        blocks[:, :, zz >> 3, zz & 7] = deq  # zigzag scatter
        # 2-D IDCT: out[x, y] = Σ_u Σ_v B[x,u] · blk[u,v] · B[y,v]
        sp = np.einsum("xu,ijuv,yv->ijxy", basis, blocks, basis) + 128.0
        samp = np.clip(np.floor(sp + 0.5), 0.0, 255.0)
        planes.append(samp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))

    ys = np.arange(h)
    xs = np.arange(w)

    def up(ci: int) -> "np.ndarray":
        hs, vs = comps[ci][1], comps[ci][2]
        return planes[ci][(ys * vs) // vmax][:, (xs * hs) // hmax]  # (h, w)

    if len(comps) == 1:
        v = up(0).astype(np.uint8)
        return w, h, np.ascontiguousarray(np.repeat(v[:, :, None], 3, axis=2)).reshape(-1, 3)
    y = up(0)
    cb = up(1) - 128.0
    cr = up(2) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    pix = np.clip(np.floor(rgb + 0.5), 0.0, 255.0).astype(np.uint8)
    return w, h, np.ascontiguousarray(pix).reshape(-1, 3)

def _pixel_feature(pix) -> list[float]:
    """8-float feature from REAL pixels, all in [0, 1]: per-channel
    means, gray mean/min/max, bright-pixel fraction, gray stddev —
    the classic cheap image-quality/dedup signature (same width as the
    stub's sha256 feature, so the DECODED_SCHEMA is format-agnostic).

    ``pix`` is any (n, 3) array-like of 0–255 RGB values (the
    decoders hand in uint8 arrays; tests may pass tuple lists). r11:
    numpy reductions replace the per-pixel Python sums — the golden
    replay (tools/gen_pipeline_goldens.video_golden) mirrors these
    EXACT ops on the same-layout float64 array, so the pinned doubles
    are bit-identical."""
    a = np.ascontiguousarray(np.asarray(pix, dtype=np.float64))
    n = a.shape[0]
    r = a[:, 0].copy()
    g = a[:, 1].copy()
    b = a[:, 2].copy()
    gray = (r + g + b) / 3.0
    mgray = gray.mean() / 255.0
    dev = gray / 255.0 - mgray
    return [
        float(r.mean() / 255.0),
        float(g.mean() / 255.0),
        float(b.mean() / 255.0),
        float(mgray),
        float(gray.min() / 255.0),
        float(gray.max() / 255.0),
        float(np.count_nonzero(gray >= 128.0) / n),
        float(math.sqrt((dev * dev).mean())),
    ]


# IMA ADPCM (WAV format 17) — r11: a REAL compressed-audio codec
# inside the stdlib boundary (4-bit differential quantization over
# public step tables — no psychoacoustics, no entropy coding). The
# per-nibble recurrence is inherently sequential (each step's
# quantizer state depends on the last), the module-header exception;
# synth sizes keep the loop cheap and the fact-chunk frame count
# bounds the work.

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(n: int, predictor: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM reconstruction step: nibble + state -> (sample,
    next index). Integer-exact per the IMA spec's bit-shift ladder."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    if n & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    return predictor, max(0, min(88, index + _IMA_INDEX_TABLE[n & 7]))


def _decode_ima_adpcm(
    data: bytes, n_ch: int, block_align: int, n_frames: int
) -> "np.ndarray":
    """IMA-in-WAV block decode -> interleaved int samples (length
    n_frames*n_ch). Block layout: per-channel 4-byte header
    (predictor int16 LE = the block's first output sample, step index
    uint8, reserved), then alternating per-channel 4-byte nibble
    groups, 8 samples each, low nibble first."""
    if block_align <= 4 * n_ch or (block_align - 4 * n_ch) % (4 * n_ch):
        raise ValueError("adpcm: bad block align")
    groups = (block_align - 4 * n_ch) // (4 * n_ch)
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    off = 0
    while off + block_align <= len(data) and len(chans[0]) < n_frames:
        preds, idxs = [], []
        for c in range(n_ch):
            p, idx, _r = struct.unpack_from("<hBB", data, off)
            off += 4
            if idx > 88:
                raise ValueError("adpcm: bad step index")
            preds.append(p)
            idxs.append(idx)
            chans[c].append(p)
        for _g in range(groups):
            for c in range(n_ch):
                four = int.from_bytes(data[off : off + 4], "little")
                off += 4
                pr, ix = preds[c], idxs[c]
                ch = chans[c]
                for k in range(8):
                    pr, ix = _ima_step((four >> (4 * k)) & 0xF, pr, ix)
                    ch.append(pr)
                preds[c], idxs[c] = pr, ix
    if len(chans[0]) < n_frames:
        raise ValueError("adpcm: short data")
    out = np.empty(n_frames * n_ch, dtype=np.int64)
    for c in range(n_ch):
        out[c::n_ch] = chans[c][:n_frames]
    return out


def _encode_ima_adpcm(channels: list[list[int]], groups_per_block: int) -> bytes:
    """IMA ADPCM encoder — the synth/test twin of
    :func:`_decode_ima_adpcm` (the encoder runs the decoder's
    reconstruction for its predictor state, the standard design, so
    state never drifts; the independent golden replay implements BOTH
    sides again from the spec)."""
    n_ch = len(channels)
    n = len(channels[0])
    spb = 1 + groups_per_block * 8
    idxs = [0] * n_ch
    out = bytearray()
    for start in range(0, n, spb):
        preds = []
        for c in range(n_ch):
            p = channels[c][start]
            preds.append(p)
            out += struct.pack("<hBB", p, idxs[c], 0)
        for g in range(groups_per_block):
            for c in range(n_ch):
                four = 0
                pr, ix = preds[c], idxs[c]
                for k in range(8):
                    pos = start + 1 + g * 8 + k
                    s = channels[c][pos] if pos < n else 0
                    step = _IMA_STEP_TABLE[ix]
                    delta = s - pr
                    nib = 0
                    if delta < 0:
                        nib = 8
                        delta = -delta
                    if delta >= step:
                        nib |= 4
                        delta -= step
                    if delta >= step >> 1:
                        nib |= 2
                        delta -= step >> 1
                    if delta >= step >> 2:
                        nib |= 1
                    pr, ix = _ima_step(nib, pr, ix)
                    four |= nib << (4 * k)
                preds[c], idxs[c] = pr, ix
                out += four.to_bytes(4, "little")
    return bytes(out)


def _decode_wav(p: bytes) -> tuple[int, int, list[float]]:
    """Stdlib+numpy WAV/PCM decode (r10 — the audio analog of r8's
    BMP; r11 adds 24-bit integer and 32-bit IEEE-float PCM,
    vectorizes the sample path, and adds IMA ADPCM): RIFF chunk walk,
    ``fmt `` must be integer PCM (format code 1) at 8, 16 or 24 bits,
    IEEE-float PCM (format code 3) at 32 bits, or IMA ADPCM (format
    code 17) at 4 bits; ``data`` decodes to normalized samples in
    [-1, 1] (16-bit: signed LE / 32768; 24-bit: signed LE / 2^23 via
    top-lane int32 widening; 8-bit: (unsigned - 128) / 128 — the WAV
    spec's integer conventions; float: the stored value, clipped to
    the nominal [-1, 1] full-scale range; ADPCM: reconstructed int16
    / 32768, frame count bounded by the ``fact`` chunk). Returns
    (n_frames, n_channels, feature) through the format-agnostic
    DECODED_SCHEMA: width = frames per channel, height = channels.
    Raises ValueError on anything else (caller falls back to the
    stub — perceptual/entropy-coded audio like MP3/AAC is a PERMANENT
    stub, see the module header)."""
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not WAV")
    fmt = None
    data = None
    fact_frames = None
    for tag, body_off, ln in _riff_chunks(p, 12, len(p)):
        body = p[body_off : body_off + ln]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("wav: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"fact" and len(body) >= 4:
            # compressed formats record the true frame count here
            fact_frames = struct.unpack_from("<I", body, 0)[0]
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data")
    code, n_ch, rate, _byte_rate, block_align, bits = fmt
    if not (
        (code == 1 and bits in (8, 16, 24))
        or (code == 3 and bits == 32)
        or (code == 17 and bits == 4)
    ) or n_ch < 1 or rate < 1:
        raise ValueError(
            "wav: only 8/16/24-bit integer, 32-bit float, or IMA ADPCM PCM"
        )
    if code == 17:
        # r11: IMA ADPCM — the fact chunk bounds the decode (the last
        # block's tail nibbles are encoder padding, not samples)
        if block_align <= 4 * n_ch:
            raise ValueError("adpcm: bad block align")
        samples_per_block = 1 + (block_align - 4 * n_ch) * 2 // n_ch
        max_frames = (len(data) // block_align) * samples_per_block
        n_frames = fact_frames if fact_frames is not None else max_frames
        if n_frames == 0 or n_frames > max_frames:
            raise ValueError("adpcm: frame count out of range")
        ints = _decode_ima_adpcm(data, n_ch, block_align, n_frames)
        samples = ints.astype(np.float64) / 32768.0
        return n_frames, n_ch, _audio_feature(samples, rate)
    bytes_per = bits // 8
    if block_align != n_ch * bytes_per:
        raise ValueError("wav: bad block align")
    n_frames = len(data) // block_align
    if n_frames == 0:
        raise ValueError("wav: empty data")
    data = data[: n_frames * block_align]
    if code == 3:
        samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
        if not np.isfinite(samples).all():
            # NaN samples (real DAW exports can contain them) would
            # ride through np.clip and poison every feature reduction
            # with NaN, violating the [0, 1] feature contract — treat
            # the file as corrupt (r11 review finding)
            raise ValueError("wav: non-finite float samples")
        samples = np.clip(samples, -1.0, 1.0)
    elif bits == 24:
        # r11: 3-byte little-endian signed — widen to int32 by placing
        # the bytes in the top 3 lanes (sign-correct), then /2^31
        b3 = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        i32 = np.zeros((b3.shape[0], 4), dtype=np.uint8)
        i32[:, 1:] = b3
        samples = i32.view("<i4").reshape(-1).astype(np.float64) / 2147483648.0
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    return n_frames, n_ch, _audio_feature(samples, rate)


def _audio_feature(samples, rate: int) -> list[float]:
    """8-float feature from REAL PCM samples (interleaved, normalized
    to [-1, 1], any 1-D array-like), all outputs in [0, 1] — the
    audio analog of ``_pixel_feature``: mean/min/max amplitude
    (affinely mapped), RMS energy, mean |amplitude|, zero-crossing
    fraction, positive fraction, and the sample rate against a 96 kHz
    ceiling. r11: numpy reductions replace the sequential Python
    sums — the golden replay (tools/gen_pipeline_goldens.audio_golden)
    mirrors these EXACT ops on the same float64 array, so the pinned
    doubles are bit-identical."""
    s = np.ascontiguousarray(np.asarray(samples, dtype=np.float64))
    n = s.shape[0]
    neg = s < 0.0
    return [
        float((s.mean() + 1.0) / 2.0),
        float((s.min() + 1.0) / 2.0),
        float((s.max() + 1.0) / 2.0),
        float(math.sqrt((s * s).mean())),
        float(np.abs(s).mean()),
        float(np.count_nonzero(neg[1:] != neg[:-1]) / max(n - 1, 1)),
        float(np.count_nonzero(s > 0.0) / n),
        min(rate / 96000.0, 1.0),
    ]


def synth_wav_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM WAV payloads from an id column — the media
    table an audio-bearing parquet would give, used by the
    multimodal_audio_decode gate entry (and replayed independently by
    tools/gen_pipeline_goldens.audio_golden). Per id d:
    channels = 1 + d % 2; format = IMA ADPCM when d % 11 == 7 (r11 —
    the lossy format-17 path, encoder + decoder both replayed
    independently in the golden), else 32-bit IEEE-float PCM when
    d % 7 == 5 (r11 — exercises the format-3 decode path), else
    integer PCM at bits = 8 if d % 3 == 0 else 16;
    n_frames = 64 + d % 129, rate = 8000; interleaved sample value
    (frame i, channel c) is the integer hash
    ``(d*31 + i*17 + c*7) * 2654435761 mod 2^16`` mapped to the PCM
    range (16-bit: −32768 offset; 8-bit: top byte; float:
    (v − 32768)/32768 stored as float32 — exact, 16-bit values fit a
    float32 mantissa). Integer-exact arithmetic end to end, so engine
    and replay agree bit-for-bit. The id scan is ``spread`` to the
    session's parallelism first — per-file codec work must fan out
    across cores, not ride a one-split scan."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            ids = pdf[id_col].tolist()
            for d in ids:
                payloads.append(synth_wav_bytes(int(d)))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "media_type": ["audio/wav"] * len(ids),
                    "byte_len": [len(b) for b in payloads],
                }
            )

    from bigdata_foundation_spark.operators.dedup import spread

    return spread(df.select(id_col), id_col).mapInPandas(gen, MEDIA_SCHEMA)


def synth_wav_bytes(d: int) -> bytes:
    """The deterministic WAV payload for id ``d`` (see
    synth_wav_table). Module-level so tests can call it directly.
    r11: ids with d % 11 == 7 take the IMA ADPCM branch (format 17,
    2 nibble groups per block = 17 samples/block/channel, fact chunk
    carries the true frame count) — the LOSSY branch, so the golden
    replay re-implements encoder AND decoder from the spec."""
    n_ch = 1 + d % 2
    is_adpcm = d % 11 == 7
    is_float = not is_adpcm and d % 7 == 5
    bits = 4 if is_adpcm else (32 if is_float else (8 if d % 3 == 0 else 16))
    n_frames = 64 + d % 129
    rate = 8000
    i_ = np.arange(n_frames, dtype=np.int64)[:, None]
    c_ = np.arange(n_ch, dtype=np.int64)[None, :]
    vals_2d = ((d * 31 + i_ * 17 + c_ * 7) * 2654435761) % 65536
    vals = vals_2d.reshape(-1)
    if is_adpcm:
        groups = 2
        chans = [(vals_2d[:, c] - 32768).tolist() for c in range(n_ch)]
        data = _encode_ima_adpcm(chans, groups)
        block_align = 4 * n_ch + groups * 4 * n_ch
        fmt = struct.pack(
            "<HHIIHHHH",
            17, n_ch, rate,
            rate * block_align // (1 + groups * 8),  # nominal byte rate
            block_align, 4,
            2, 1 + groups * 8,  # cbSize, wSamplesPerBlock
        )
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"fact" + struct.pack("<II", 4, n_frames)[:8]
        body += b"data" + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body
    if is_float:
        code = 3
        data = ((vals - 32768) / 32768.0).astype("<f4").tobytes()
    elif bits == 16:
        code = 1
        data = (vals - 32768).astype("<i2").tobytes()
    else:
        code = 1
        data = (vals >> 8).astype(np.uint8).tobytes()
    block_align = n_ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", code, n_ch, rate, rate * block_align, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(p: bytes, off: int, end: int):
    """Yield (tag, body_start, body_len) over a RIFF chunk run —
    shared by the WAV and AVI walkers. Chunks pad to even length."""
    while off + 8 <= end:
        tag = p[off : off + 4]
        ln = struct.unpack_from("<I", p, off + 4)[0]
        yield tag, off + 8, ln
        off += 8 + ln + (ln & 1)


def _avi_frame_chunks(p: bytes) -> tuple[int, int, list[tuple[int, int]]]:
    """Parse an uncompressed AVI's structure WITHOUT decoding pixels:
    RIFF 'AVI ' walk → ``avih`` main header (dimensions) → ``strf``
    BITMAPINFOHEADER validated 24-bpp BI_RGB → the (offset, length) of
    every ``00db``/``00dc`` chunk under ``movi``. Returns
    (width, height, chunks). Raises ValueError for anything else
    (compressed video stays honestly stubbed). Consumers decode ONLY
    the frames they sample (r10 self-review: eager all-frame decode
    wasted the per-pixel Python loop on discarded frames)."""
    if len(p) < 24 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        raise ValueError("not AVI")
    w = h = None
    chunks: list[tuple[int, int]] = []
    strf_ok = False
    stream_type = b""  # fccType of the last-seen strh

    def walk(off: int, end: int) -> None:
        nonlocal w, h, strf_ok, stream_type
        for tag, body, ln in _riff_chunks(p, off, end):
            if tag == b"LIST":
                walk(body + 4, body + ln)  # skip the 4-byte list type
            elif tag == b"avih":
                if ln < 40:
                    raise ValueError("avi: short avih")
                w = struct.unpack_from("<I", p, body + 32)[0]
                h = struct.unpack_from("<I", p, body + 36)[0]
            elif tag == b"strh":
                stream_type = p[body : body + 4]
            elif tag == b"strf" and ln >= 40 and stream_type == b"vids":
                # r11 (advisor): only a 'vids' stream's strf is a
                # BITMAPINFOHEADER — an audio stream's 40-byte
                # WAVEFORMATEXTENSIBLE must not be misread as one
                # (and must never reject an otherwise decodable file)
                bi_size, bw, bh, planes, bpp, comp = struct.unpack_from(
                    "<IiiHHI", p, body
                )
                if bi_size >= 40 and bpp == 24 and comp == 0:
                    strf_ok = True
                elif bpp or comp:
                    raise ValueError("avi: only 24-bpp BI_RGB video")
            elif tag in (b"00db", b"00dc"):
                chunks.append((body, ln))

    walk(12, len(p))
    if w is None or h is None or not strf_ok:
        raise ValueError("avi: missing avih/strf")
    if w <= 0 or h <= 0:
        raise ValueError("avi: zero-pixel frames")
    if not chunks:
        raise ValueError("avi: no frames")
    row_sz = (w * 3 + 3) & ~3
    for body, ln in chunks:
        # r11 (advisor, medium): validate the BODY really is in the
        # buffer, not just the chunk-length FIELD — a payload cut
        # mid-movi with intact headers must raise here (ingest
        # contract: undecodable payloads emit NO rows), not
        # IndexError inside the Arrow task later
        if ln < row_sz * h or body + ln > len(p):
            raise ValueError("avi: truncated frame")
    return w, h, chunks


def _avi_decode_frame(p: bytes, body: int, w: int, h: int) -> "np.ndarray":
    """Decode ONE movi frame chunk exactly like a BMP pixel array
    (bottom-up BGR rows padded to 4 bytes) → row-major top-down RGB
    uint8 (h·w, 3). r11 (the r10 verdict's one `weak`): a single
    ``frombuffer``/reshape + stride slice + BGR→RGB flip — the
    per-pixel Python tuple loop is gone (~100× per-byte headroom at
    media-corpus scale)."""
    row_sz = (w * 3 + 3) & ~3
    rows = np.frombuffer(p, dtype=np.uint8, count=row_sz * h, offset=body)
    pix = rows.reshape(h, row_sz)[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return np.ascontiguousarray(pix).reshape(-1, 3)


def _decode_avi(p: bytes) -> tuple[int, int, list["np.ndarray"]]:
    """Full uncompressed-AVI decode: every frame's pixels (tests and
    small payloads); the sampler path decodes selectively via
    ``_avi_frame_chunks`` + ``_avi_decode_frame`` instead."""
    w, h, chunks = _avi_frame_chunks(p)
    return w, h, [_avi_decode_frame(p, body, w, h) for body, _ln in chunks]


def video_frame_table(
    media: DataFrame, every_n: int = 1, max_frames: int = 8
) -> DataFrame:
    """REAL video frame sampling (r10): decode each uncompressed-AVI
    payload, keep every ``every_n``-th frame up to ``max_frames``, and
    emit one row per sampled frame with true dimensions and the
    pixel-derived feature — the production shape of a video curation
    pass (decode → sample → per-frame features), as Arrow-batched
    mapInPandas with partitioning preserved. Payloads that are not
    decodable uncompressed AVIs emit NO rows (a production pipeline
    routes those to the generic byte sampler ``frame_sample`` or a
    libav-backed decoder; dropping keeps this operator's schema
    honest — every emitted row carries REAL pixels)."""
    import pandas as pd

    # id dtype follows the input column (any id type, not just the
    # synth tables' bigint — the r10 advisor lesson from the ANN
    # kernels applied here from day one)
    schema = T.StructType(
        [
            T.StructField("media_id", media.schema["media_id"].dataType),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, ws, hs, feats = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, chunks = _avi_frame_chunks(raw)
                except (ValueError, struct.error, IndexError):
                    continue
                for k, fi in enumerate(range(0, len(chunks), max(every_n, 1))):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    fnos.append(fi)
                    ws.append(w)
                    hs.append(h)
                    feats.append(_pixel_feature(_avi_decode_frame(raw, chunks[fi][0], w, h)))
            if ids:  # an all-undecodable batch must yield nothing, not
                # an empty frame whose default float64 columns break the
                # Arrow list<float> conversion
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "frame_no": fnos,
                        "width": ws,
                        "height": hs,
                        "feature": feats,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(gen, schema)


def synth_avi_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic uncompressed-AVI payloads from an id column (the
    video twin of synth_wav_table), replayed independently by
    tools/gen_pipeline_goldens.video_golden. Per id d:
    width = 8 + (d % 3)·4, height = 6 + (d % 2)·2,
    n_frames = 3 + d % 6; pixel (frame f, row y, col x) channel c is
    the integer hash ``(d·13 + f·7 + y·5 + x·3 + c) · 2654435761
    mod 256`` (c = 0/1/2 = R/G/B). Integer arithmetic end to end."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            payloads = [synth_avi_bytes(int(d)) for d in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "media_type": ["video/x-msvideo"] * len(ids),
                    "byte_len": [len(b) for b in payloads],
                }
            )

    from bigdata_foundation_spark.operators.dedup import spread

    return spread(df.select(id_col), id_col).mapInPandas(gen, MEDIA_SCHEMA)


def synth_avi_bytes(d: int) -> bytes:
    """The deterministic AVI payload for id ``d`` (see
    synth_avi_table). Module-level so tests can call it directly.
    Pixel generation is vectorized numpy INTEGER arithmetic (r10:
    the per-pixel Python loop, not the decoder, dominated the sf1
    sweep) — byte-exact vs the scalar formula by construction."""
    import numpy as np

    w = 8 + (d % 3) * 4
    h = 6 + (d % 2) * 2
    n_frames = 3 + d % 6

    row_sz = (w * 3 + 3) & ~3
    f_ = np.arange(n_frames, dtype=np.int64)[:, None, None, None]
    y_ = np.arange(h - 1, -1, -1, dtype=np.int64)[None, :, None, None]  # bottom-up
    x_ = np.arange(w, dtype=np.int64)[None, None, :, None]
    c_ = np.array([2, 1, 0], dtype=np.int64)[None, None, None, :]  # BGR order
    vals = ((d * 13 + f_ * 7 + y_ * 5 + x_ * 3 + c_) * 2654435761) % 256
    mat = vals.astype(np.uint8)  # (frames, h, w, 3) bottom-up BGR
    pad = row_sz - w * 3
    if pad:
        mat = np.concatenate(
            [mat.reshape(n_frames, h, w * 3), np.zeros((n_frames, h, pad), dtype=np.uint8)],
            axis=2,
        )
    else:
        mat = mat.reshape(n_frames, h, w * 3)
    frames = [fr.tobytes() for fr in mat]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I", 40_000, 0, 0, 0, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<I2H8I", 0, 0, 0, 0, 1, 25, 0, n_frames, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_sz * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fr) for fr in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ============================== GIF ==================================
# r11: GIF87a/89a decode — the one remaining stdlib-feasible image
# container (LZW is a dictionary coder, not an entropy-coding system;
# the Unisys patents expired in 2004). Covers: global/local color
# tables at every size, interlacing, transparency, region frames
# composited onto the logical-screen canvas, 87a and 89a, animation
# frame sampling. The LZW code loop is per-CODE Python (inherently
# sequential, like huffman entropy decode — the module-header
# exception); everything around it (palette lookup, deinterlace,
# compositing, features) is numpy.

GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code: int, npix: int) -> "np.ndarray":
    """GIF variable-width LSB-first LZW → uint8 index array of length
    ``npix``. Implements the spec's table-growth convention: code
    width bumps when the table reaches 2^width (cap 12); a clear code
    resets table and width. Raises ValueError on malformed streams
    (out-of-range code, reference to a reserved slot, exhaustion
    before npix indices)."""
    if not (2 <= min_code <= 8):
        raise ValueError("gif: bad LZW min code size")
    clear = 1 << min_code
    end = clear + 1
    # one big little-endian int = the whole bitstream; Python bigint
    # shifts beat a per-byte bit cursor and keep the loop per-CODE
    big = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    prev = None
    out = bytearray()
    while len(out) < npix:
        if pos + width > nbits:
            raise ValueError("gif: LZW stream exhausted")
        code = (big >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if not entry:
                raise ValueError("gif: reference to reserved code")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < npix:
        raise ValueError("gif: short pixel data")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _gif_lzw_encode(indices: "np.ndarray", min_code: int) -> bytes:
    """GIF LZW encoder — the synth/test twin of :func:`_gif_lzw_decode`
    (real dictionary compression, so synth payloads exercise the full
    decoder: table growth, width bumps, the 4096 clear-reset). Fuzzed
    against the decoder as an identity in tests."""
    clear = 1 << min_code
    end = clear + 1
    out_bits = bytearray()
    acc = 0
    accn = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accn
        acc |= code << accn
        accn += width
        while accn >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            accn -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    emit(clear, width)
    seq: tuple = ()
    for px in indices.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        seq = (px,)
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if accn:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


def _gif_deinterlace(idx: "np.ndarray", w: int, h: int) -> "np.ndarray":
    """Reorder GIF interlaced rows (four passes: 0::8, 4::8, 2::4,
    1::2) to natural order — one numpy scatter per pass."""
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in GIF_INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src : src + n]
        src += n
    return out.reshape(-1)


def _gif_frames(
    p: bytes, max_frames: int | None = None
) -> tuple[int, int, list["np.ndarray"]]:
    """Parse a GIF87a/89a payload → (width, height, frames), each
    frame a FULL-CANVAS (h, w, 3) uint8 RGB array: image blocks are
    composited onto the logical screen at their (left, top) region,
    transparent pixels (GCE flag) show the previous canvas through.
    Disposal is treated as leave-in-place (the dominant web-GIF
    convention; 'restore to background' animations composite
    progressively — documented deviation, pixel-identical for
    full-frame and accumulate-style GIFs). ``max_frames`` stops
    decoding early — compositing forces sequential decode up to the
    last SAMPLED frame, but never past it. Raises ValueError on
    malformed payloads (the stub-fallback contract upstream)."""
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not GIF")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", p, 6)
    if sw == 0 or sh == 0:
        raise ValueError("gif: zero logical screen")
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p[off : off + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("gif: short global color table")
        gct = gct.reshape(n, 3)
        off += 3 * n
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None:
        # the logical screen fills with the BACKGROUND index (r11
        # review finding — entry 0 is only correct when bg == 0);
        # an out-of-table index falls back to 0 per common practice
        canvas[:, :] = gct[bg if bg < len(gct) else 0]
    frames: list[np.ndarray] = []
    transparent = None
    while off < len(p):
        b = p[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + length-prefixed sub-blocks
            if off >= len(p):
                raise ValueError("gif: truncated extension")
            label = p[off]
            off += 1
            first_sub = off
            while True:
                if off >= len(p):
                    raise ValueError("gif: truncated sub-blocks")
                ln = p[off]
                off += 1
                if ln == 0:
                    break
                if label == 0xF9 and off == first_sub + 1 and ln == 4:
                    flags = p[off]
                    transparent = p[off + 3] if flags & 0x01 else None
                off += ln
            continue
        if b != 0x2C:
            raise ValueError("gif: unknown block 0x%02x" % b)
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", p, off)
        off += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("gif: image block out of bounds")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(p[off : off + 3 * n], dtype=np.uint8)
            if pal.size != 3 * n:
                raise ValueError("gif: short local color table")
            pal = pal.reshape(n, 3)
            off += 3 * n
        if pal is None:
            raise ValueError("gif: no color table")
        if off >= len(p):
            raise ValueError("gif: missing LZW min code size")
        min_code = p[off]
        off += 1
        parts = []
        while True:
            if off >= len(p):
                raise ValueError("gif: truncated image data")
            ln = p[off]
            off += 1
            if ln == 0:
                break
            parts.append(p[off : off + ln])
            if len(parts[-1]) != ln:
                raise ValueError("gif: truncated image data")
            off += ln
        idx = _gif_lzw_decode(b"".join(parts), min_code, w * h)
        if ipacked & 0x40:
            idx = _gif_deinterlace(idx, w, h)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("gif: palette index out of range")
        rgb = pal[idx].reshape(h, w, 3)
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            rgb = np.where((idx.reshape(h, w) == transparent)[:, :, None], region, rgb)
        canvas = canvas.copy()  # each emitted frame is an independent array
        canvas[top : top + h, left : left + w] = rgb
        frames.append(canvas)
        transparent = None  # a GCE governs exactly one following image
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("gif: no image blocks")
    return sw, sh, frames


def _decode_gif(p: bytes) -> tuple[int, int, "np.ndarray"]:
    """First-frame GIF decode for the thumbnail/feature path: logical
    screen dimensions + the first composited frame's (n, 3) pixels."""
    w, h, frames = _gif_frames(p, max_frames=1)
    return w, h, frames[0].reshape(-1, 3)


def gif_frame_table(
    media: DataFrame, every_n: int = 1, max_frames: int = 8
) -> DataFrame:
    """Animated-GIF frame sampling — the GIF twin of
    :func:`video_frame_table`: decode each payload's composited
    frames, keep every ``every_n``-th up to ``max_frames``, one row
    per sampled frame with true dimensions and the pixel feature.
    Compositing forces sequential decode UP TO the last sampled frame
    (unlike AVI's random-access chunks) — but never past it. Payloads
    that are not well-formed GIFs emit NO rows (the corpus-ingest
    contract video_frame_table documents)."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("media_id", media.schema["media_id"].dataType),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )
    step = max(every_n, 1)
    last_needed = (max_frames - 1) * step + 1 if max_frames > 0 else 0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, ws, hs, feats = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, frames = _gif_frames(raw, max_frames=last_needed)
                except (ValueError, struct.error, IndexError):
                    continue
                for k, fi in enumerate(range(0, len(frames), step)):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    fnos.append(fi)
                    ws.append(w)
                    hs.append(h)
                    feats.append(_pixel_feature(frames[fi].reshape(-1, 3)))
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "frame_no": fnos,
                        "width": ws,
                        "height": hs,
                        "feature": feats,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(gen, schema)


def synth_gif_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic GIF payloads from an id column (the image twin of
    synth_wav_table / synth_avi_table), replayed independently by
    tools/gen_pipeline_goldens._gif_replay_frames. Per id d:
    width = 10 + (d % 5)·3, height = 8 + (d % 4)·3,
    n_frames = 1 + d % 4 (ids with d % 4 ≥ 1 are ANIMATED);
    16-entry palette: color (j, channel c) =
    ``(d·29 + j·97 + c·53 + salt)·2654435761 mod 256`` with salt = 71
    on frame 1 of d % 3 == 0 ids (those carry a LOCAL color table);
    pixel index (frame f, y, x) = ``(d·13 + f·7 + y·5 + x·3)·
    2654435761 mod 16``. Frame 0 is INTERLACED when d % 2 == 1;
    frames ≥ 1 of d % 4 == 3 ids are REGION frames at (2, 1) sized
    (w−4, h−2); frames ≥ 1 of d % 5 == 2 ids carry a transparency GCE
    (index 3 shows the previous canvas through). Integer arithmetic
    end to end; payloads go through the REAL LZW encoder, so the
    decoder's dictionary growth is exercised on every id."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            payloads = [synth_gif_bytes(int(d)) for d in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "media_type": ["image/gif"] * len(ids),
                    "byte_len": [len(b) for b in payloads],
                }
            )

    from bigdata_foundation_spark.operators.dedup import spread

    return spread(df.select(id_col), id_col).mapInPandas(gen, MEDIA_SCHEMA)


def _synth_gif_palette(d: int, f: int) -> "np.ndarray":
    j = np.arange(16, dtype=np.int64)[:, None]
    c = np.arange(3, dtype=np.int64)[None, :]
    salt = 71 * f if (f == 1 and d % 3 == 0) else 0
    return (((d * 29 + j * 97 + c * 53 + salt) * 2654435761) % 256).astype(np.uint8)


def _synth_gif_indices(d: int, f: int, w: int, h: int) -> "np.ndarray":
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    return (((d * 13 + f * 7 + y * 5 + x * 3) * 2654435761) % 16).astype(np.uint8)


def synth_gif_bytes(d: int) -> bytes:
    """The deterministic GIF payload for id ``d`` (see
    synth_gif_table). Module-level so tests can call it directly."""
    w = 10 + (d % 5) * 3
    h = 8 + (d % 4) * 3
    n_frames = 1 + d % 4
    gct = _synth_gif_palette(d, 0)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x03, 0, 0)  # GCT, 16 entries
    out += gct.tobytes()
    for f in range(n_frames):
        region = f >= 1 and d % 4 == 3
        lf, tf = (2, 1) if region else (0, 0)
        wf, hf = (w - 4, h - 2) if region else (w, h)
        if f >= 1 and d % 5 == 2:  # transparency GCE, index 3
            out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, 3]) + b"\x00"
        local = f == 1 and d % 3 == 0
        interlace = f == 0 and d % 2 == 1
        ipacked = (0x80 | 0x03 if local else 0) | (0x40 if interlace else 0)
        out += b"\x2c" + struct.pack("<HHHHB", lf, tf, wf, hf, ipacked)
        if local:
            out += _synth_gif_palette(d, f).tobytes()
        idx = _synth_gif_indices(d, f, wf, hf)
        flat = idx.reshape(-1)
        if interlace:
            rows = idx.reshape(hf, wf)
            flat = np.concatenate(
                [rows[s::st].reshape(-1) for s, st in GIF_INTERLACE_PASSES]
            )
        data = _gif_lzw_encode(flat, 4)
        out += bytes([4])
        for i in range(0, len(data), 255):
            blk = data[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ===================== Image perceptual hashing ======================
# r11: dHash (difference hash, the standard cheap perceptual
# fingerprint — Krawetz 2013 "Kind of Like That") over REAL decoded
# pixels: sample a 9×8 grayscale grid (nearest-neighbor — integer
# arithmetic end to end, so the golden replay is bit-exact), emit 64
# bits of horizontal gradient sign. Near-duplicate IMAGES then reduce
# to the SimHash pigeonhole machinery on the 64-bit hash
# (dedup.hash64_neardup_pairs) — the image sibling of text SimHash.


def _dhash64(pix: "np.ndarray") -> int:
    """64-bit dHash of an (h, w, 3) uint8 RGB array, as a SIGNED
    int64 (Spark LongType two's-complement). Integer-exact: gray =
    (r+g+b)//3; grid row y samples source row y·h//8, columns x·w//9;
    bit (y·8+x) = grid[y][x+1] > grid[y][x]."""
    h, w = pix.shape[0], pix.shape[1]
    if h < 8 or w < 9:
        # below the 9x8 sample grid the hash degenerates (duplicate
        # sample columns force most gradient bits to 0) and UNRELATED
        # tiny images collide within the Hamming threshold — false
        # near-dup pairs are worse than dropping the file (r11 review)
        raise ValueError("dhash: image smaller than the 9x8 sample grid")
    gray = pix.astype(np.int64).sum(axis=2) // 3
    ys = (np.arange(8, dtype=np.int64) * h) // 8
    xs = (np.arange(9, dtype=np.int64) * w) // 9
    g = gray[np.ix_(ys, xs)]
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    val = 0
    for i in range(64):
        if bits[i]:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def _decode_pixels(p: bytes) -> "np.ndarray":
    """Format-sniffing decode to an (h, w, 3) uint8 RGB array — the
    pixel-level sibling of _decode_payload (which reduces to
    features). Raises on undecodable payloads; perceptual hashing has
    no meaningful stub (a hash of fake pixels would create FALSE
    near-dup pairs, which is worse than dropping the file)."""
    if p[:2] == b"BM":
        w, h, pix = _decode_bmp(p)
        return pix.reshape(h, w, 3)
    if p.startswith(_PNG_MAGIC):
        w, h, pix = _decode_png(p)
        return pix.reshape(h, w, 3)
    if p[:3] == b"\xff\xd8\xff":
        w, h, pix = _decode_jpeg(p)
        return pix.reshape(h, w, 3)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        w, h, frames = _gif_frames(p, max_frames=1)
        return frames[0]
    raise ValueError("no pixel decoder for payload")


def image_dhash_table(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, dhash) for every DECODABLE image payload — Arrow-batched
    mapInPandas, partitioning preserved, one row per decodable image
    (undecodable payloads emit NO rows; see _decode_pixels)."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    pix = _decode_pixels(raw)
                    hashes.append(_dhash64(pix))
                    ids.append(mid)
                except (
                    ValueError,
                    struct.error,
                    IndexError,
                    zlib.error,
                    KeyError,
                    ZeroDivisionError,  # zero JPEG sampling factors
                ):
                    continue
            if ids:
                yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return media.select(id_col, "payload").mapInPandas(gen, schema)


def _synth_image_pixels(d: int, n_base: int = 250) -> "np.ndarray":
    """Deterministic RGB pixels for the planted near-dup image corpus:
    ids d and d + n_base share base = d % n_base; the second copy
    perturbs a 3×3 block at a base-dependent position (+40 mod 256) —
    a small local edit, the classic near-duplicate image."""
    base = d % n_base
    rep = d // n_base
    w = 24 + (base % 5) * 4
    h = 16 + (base % 3) * 4
    y = np.arange(h, dtype=np.uint64)[:, None, None]
    x = np.arange(w, dtype=np.uint64)[None, :, None]
    c = np.arange(3, dtype=np.uint64)[None, None, :]
    # real 64-bit mix, HIGH bits taken: a linear rule mod 256 makes
    # distinct bases mere constant offsets of one another (the whole
    # corpus collapses to ~256·15 distinct images at scale and the
    # true pair count goes quadratic); the xorshift-multiply breaks
    # the linearity so every base is a genuinely distinct image
    t = np.uint64(base) * np.uint64(2654435761) + y * np.uint64(97) + x * np.uint64(89) + c * np.uint64(83)
    t = (t ^ (t >> np.uint64(13))) * np.uint64(1274126177)
    pix = ((t >> np.uint64(24)) % np.uint64(256)).astype(np.int64)
    if rep:
        by = (base * 7) % (h - 3)
        bx = (base * 11) % (w - 3)
        pix[by : by + 3, bx : bx + 3, :] = (pix[by : by + 3, bx : bx + 3, :] + 40) % 256
    return pix.astype(np.uint8)


def synth_bmp_bytes(pix: "np.ndarray") -> bytes:
    """24-bpp BI_RGB BMP encoder for an (h, w, 3) uint8 RGB array —
    the synth/test twin of _decode_bmp (bottom-up BGR rows, 4-byte
    padding)."""
    h, w = pix.shape[0], pix.shape[1]
    row_sz = (w * 3 + 3) & ~3
    rows = pix[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    if row_sz != w * 3:
        rows = np.concatenate(
            [rows, np.zeros((h, row_sz - w * 3), dtype=np.uint8)], axis=1
        )
    data = rows.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return hdr + info + data


def synth_image_pair_table(
    df: DataFrame, id_col: str = "doc_id", n_base: int = 250
) -> DataFrame:
    """Deterministic BMP payloads with PLANTED near-duplicate pairs
    (see _synth_image_pixels) — the image-dedup twin of the documents
    table's planted text near-dups. Replayed bytes-free by
    tools/gen_pipeline_goldens.image_phash_golden."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            payloads = [synth_bmp_bytes(_synth_image_pixels(int(d), n_base)) for d in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "media_type": ["image/bmp"] * len(ids),
                    "byte_len": [len(b) for b in payloads],
                }
            )

    from bigdata_foundation_spark.operators.dedup import spread

    return spread(df.select(id_col), id_col).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_payload(p: bytes) -> tuple[int, int, list[float]]:
    """Format-sniffing decode: REAL stdlib decode for BMP/PNG/GIF/
    baseline-and-progressive-JPEG/PCM-and-ADPCM-WAV/uncompressed-AVI
    magic bytes (a UTF-8 text payload
    can never false-positive — all parsers require NUL-bearing or
    marker-bearing headers), deterministic stub for everything else
    (arithmetic JPEG / compressed audio / compressed video — honestly
    labeled) and for corrupt bytes of any format (production would
    route those to quarantine; here they keep the ingest
    total-function contract). An AVI contributes its FIRST frame's
    pixel feature (the thumbnail convention); per-frame work goes
    through :func:`video_frame_table`."""
    try:
        if p[:6] in (b"GIF87a", b"GIF89a"):
            w, h, pix = _decode_gif(p)
            return w, h, _pixel_feature(pix)
        if p[:2] == b"BM":
            w, h, pix = _decode_bmp(p)
            return w, h, _pixel_feature(pix)
        if p.startswith(_PNG_MAGIC):
            w, h, pix = _decode_png(p)
            return w, h, _pixel_feature(pix)
        if p[:3] == b"\xff\xd8\xff":
            w, h, pix = _decode_jpeg(p)
            return w, h, _pixel_feature(pix)
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            return _decode_wav(p)
        if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            w, h, chunks = _avi_frame_chunks(p)
            return w, h, _pixel_feature(_avi_decode_frame(p, chunks[0][0], w, h))
    except (ValueError, zlib.error, struct.error, IndexError, KeyError, ZeroDivisionError):
        # Corrupt bytes surface differently per layer: truncated IHDR
        # → struct.error, bad IDAT stream → zlib.error, semantic
        # violations → ValueError, short filtered scanlines →
        # IndexError, a JPEG scan referencing an undefined quant/
        # huffman table or SOS component id → KeyError, and a
        # zero-pixel decode that slips past the dimension checks
        # surfaces as ValueError from the numpy reductions (r11 — the
        # scalar feature path raised ZeroDivisionError, kept in the
        # tuple for any remaining /n arithmetic). All must fall
        # through to the stub so one bad file can't fail a
        # corpus-scale ingest task.
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

    # id dtype follows the input column (r10 advisor contract — the
    # canonical DECODED_SCHEMA documents the bigint default)
    schema = T.StructType(
        [T.StructField("media_id", media.schema["media_id"].dataType, False)]
        + list(DECODED_SCHEMA.fields[1:])
    )
    return media.mapInPandas(_map, schema=schema)


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
