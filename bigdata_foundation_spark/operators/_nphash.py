"""numpy-vectorized ports of Spark's xxHash64 expression family.

Spark's ``xxhash64(...)`` expression (sql.catalyst.expressions.hash,
public source) is the published XXH64 spec (Yann Collet) with seed 42
and a multi-argument fold where each value's hash seeds the next.
These ports reproduce it BIT-EXACTLY over numpy uint64 arrays so the
dedup fingerprint kernels (MinHash shingle/signature, SimHash token
votes) can run as Arrow-batched numpy instead of per-shingle JVM
expression trees — the same arithmetic-tier migration r9 applied to
the ANN kernels (similarity.py), and the same discipline: the JVM
expression forms stay available as the pytest cross-oracle
(tests/test_operators.py::test_minhash_simhash_np_matches_jvm).

Everything here is integer arithmetic modulo 2^64 — unlike the float
ANN kernels there are NO near-ties: numpy and the JVM either agree on
every bit or the port is wrong, which is exactly what the cross-oracle
asserts.

Reference parity: independent pure-Python ports with the same
semantics live in tools/spark_hashes.py for golden generation; that
file is intentionally NOT imported here (the golden replay must stay
independent of engine code).
"""

from __future__ import annotations

import functools
import re

import numpy as np


def _mod64(fn):
    """All arithmetic here is intentionally modulo 2^64 — silence
    numpy's scalar-overflow RuntimeWarnings inside hash functions."""

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with np.errstate(over="ignore"):
            return fn(*a, **kw)

    return wrapped

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)  # Spark's default seed


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


@_mod64
def xxh64_long(values: np.ndarray, seed) -> np.ndarray:
    """XXH64 of 64-bit integers (Spark's hashLong). ``values`` uint64
    array; ``seed`` scalar or same-shape uint64 array. Returns uint64."""
    values = values.astype(np.uint64, copy=False)
    h = np.uint64(seed) + _P5 + np.uint64(8) if np.isscalar(seed) else seed + _P5 + np.uint64(8)
    h = h ^ (_rotl(values * _P2, 31) * _P1)
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


@_mod64
def xxh64_int(value: int, seeds: np.ndarray) -> np.ndarray:
    """XXH64 of ONE 32-bit integer under a VECTOR of seeds (Spark's
    hashInt as used by the per-seed MinHash family, where the seed is
    the previous fold value)."""
    h = seeds + _P5 + np.uint64(4)
    h = h ^ (np.uint64(value & 0xFFFFFFFF) * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


@_mod64
def xxh64_bytes_fixed(mat: np.ndarray, seed=_SEED) -> np.ndarray:
    """XXH64 of n same-length byte strings: ``mat`` is (n, L) uint8.
    Vectorized across rows; the chunk walk over L is statically
    unrolled (L is constant per call). Handles any L including the
    >= 32 stripe loop. Returns uint64 (n,)."""
    n, L = mat.shape
    seed = np.uint64(seed)
    pos = 0
    if L >= 32:
        v1 = np.full(n, seed + _P1 + _P2, dtype=np.uint64)
        v2 = np.full(n, seed + _P2, dtype=np.uint64)
        v3 = np.full(n, seed, dtype=np.uint64)
        v4 = np.full(n, seed - _P1, dtype=np.uint64)
        while pos + 32 <= L:
            w = mat[:, pos : pos + 32].copy().view("<u8")
            v1 = _rotl(v1 + w[:, 0] * _P2, 31) * _P1
            v2 = _rotl(v2 + w[:, 1] * _P2, 31) * _P1
            v3 = _rotl(v3 + w[:, 2] * _P2, 31) * _P1
            v4 = _rotl(v4 + w[:, 3] * _P2, 31) * _P1
            pos += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = h ^ (_rotl(v * _P2, 31) * _P1)
            h = h * _P1 + _P4
    else:
        h = np.full(n, seed + _P5, dtype=np.uint64)
    h = h + np.uint64(L)
    while pos + 8 <= L:
        w = mat[:, pos : pos + 8].copy().view("<u8")[:, 0]
        h = h ^ (_rotl(w * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        pos += 8
    if pos + 4 <= L:
        w = mat[:, pos : pos + 4].copy().view("<u4")[:, 0].astype(np.uint64)
        h = h ^ (w * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        pos += 4
    while pos < L:
        h = h ^ (mat[:, pos].astype(np.uint64) * _P5)
        h = _rotl(h, 11) * _P1
        pos += 1
    return _fmix(h)


@_mod64
def xxh64_chain_longs(cols: list[np.ndarray], seed=_SEED) -> np.ndarray:
    """Spark's multi-argument xxhash64 over long columns: fold left,
    each value's hash seeding the next — the band-key fold."""
    h = np.uint64(seed)
    for c in cols:
        h = xxh64_long(c.astype(np.uint64, copy=False), h)
    return h


def hash_byte_strings(items: list[bytes], seed=_SEED) -> np.ndarray:
    """XXH64 of variable-length byte strings, vectorized by grouping
    equal lengths into (m, L) matrices (natural-language tokens and
    shingles occupy a handful of length classes). Order-preserving:
    out[i] = xxh64(items[i]). Returns uint64 (n,)."""
    n = len(items)
    out = np.empty(n, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    for L in np.unique(lens):
        idx = np.nonzero(lens == L)[0]
        if L == 0:
            out[idx] = xxh64_bytes_fixed(np.empty((len(idx), 0), dtype=np.uint8), seed)
            continue
        buf = b"".join(items[i] for i in idx)
        mat = np.frombuffer(buf, dtype=np.uint8).reshape(len(idx), L)
        out[idx] = xxh64_bytes_fixed(mat, seed)
    return out


# ---------------------------------------------------------------------------
# Document-level fingerprint kernels (the per-batch numpy bodies the
# Arrow mapInPandas transforms in dedup.py call)
# ---------------------------------------------------------------------------

# Java regex \s (ASCII-only: [ \t\n\x0B\f\r]) — Python's \s without
# re.ASCII also matches Unicode whitespace, which the JVM form does not.
_WS = re.compile(r"\s+", flags=re.ASCII)


def normalize_py(s: str) -> str:
    """Python mirror of dedup.normalize_text (lower + collapse ASCII
    whitespace runs to one space)."""
    return _WS.sub(" ", s.lower())


def doc_shingle_hashes(texts: list, k: int = 5):
    """Per-document distinct character-k-shingle hashes.

    Mirrors ``shingle_hash_table``'s explode semantics exactly:
    normalized text, shingles = substr(i, k) for i in 1..max(L-k+1, 1)
    (all full-k except the single whole-text shingle when L < k), each
    hashed with xxhash64(seed 42); a None text yields NO shingles (the
    explode-of-null contract).

    Returns (keep, h_flat, offsets):
      keep    — indices of non-None texts (rows that produce output),
      h_flat  — uint64 shingle hashes, doc-major (NOT deduplicated —
                per-seed minima are multiset-invariant),
      offsets — int64 start offset of each kept doc in h_flat.
    ASCII texts take the strided-window bulk path; non-ASCII fall back
    to per-shingle byte strings (grouped-by-length hashing)."""
    keep: list[int] = []
    mats: list[np.ndarray] = []  # per-doc (m, k) uint8 ASCII windows
    counts: list[int] = []
    slow: list[tuple[int, list[bytes]]] = []  # (position in keep, shingles)
    for i, t in enumerate(texts):
        if t is None:
            continue
        s = normalize_py(t)
        pos = len(keep)
        keep.append(i)
        if s.isascii():
            b = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
            if len(b) >= k:
                mats.append(np.lib.stride_tricks.sliding_window_view(b, k))
                counts.append(len(b) - k + 1)
            else:
                # single whole-text shingle, length < k
                slow.append((pos, [s.encode("ascii")]))
                mats.append(None)
                counts.append(1)
        else:
            n = max(len(s) - (k - 1), 1)
            sh = [s[j : j + k].encode("utf-8") for j in range(n)]
            slow.append((pos, sh))
            mats.append(None)
            counts.append(len(sh))
    counts_arr = np.asarray(counts, dtype=np.int64)
    offsets = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts_arr[:-1], out=offsets[1:])
    total = int(counts_arr.sum()) if len(counts) else 0
    h_flat = np.empty(total, dtype=np.uint64)
    fast = [m for m in mats if m is not None]
    if fast:
        big = np.vstack(fast)
        hs = xxh64_bytes_fixed(big)
        # scatter back into doc-major order
        fi = 0
        for pos, m in enumerate(mats):
            if m is None:
                continue
            c = counts[pos]
            h_flat[offsets[pos] : offsets[pos] + c] = hs[fi : fi + c]
            fi += c
    for pos, sh in slow:
        h_flat[offsets[pos] : offsets[pos] + len(sh)] = hash_byte_strings(sh)
    return keep, h_flat, offsets


def minhash_from_shingles(
    h_flat: np.ndarray, offsets: np.ndarray, num_hashes: int = 64
) -> np.ndarray:
    """(n_docs, num_hashes) int64 signature matrix: per seed i, min
    over the doc's shingles of xxhash64(h, i) — computed as Spark's
    fold xxh64_int(i, xxh64_long(h, 42)), signed-min per doc segment."""
    base = xxh64_long(h_flat, _SEED)
    n = len(offsets)
    sig = np.empty((n, num_hashes), dtype=np.int64)
    if len(h_flat) == 0:
        return sig
    for i in range(num_hashes):
        fi = xxh64_int(i, base).view(np.int64)
        sig[:, i] = np.minimum.reduceat(fi, offsets)
    return sig


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 bucket keys: per band, the multi-arg
    xxhash64 fold over the band's signature slice (bit-identical to
    dedup._banded_keys)."""
    n, num_hashes = sig.shape
    rpb = num_hashes // bands
    out = np.empty((n, bands), dtype=np.int64)
    for b in range(bands):
        cols = [sig[:, j].view(np.uint64) for j in range(b * rpb, (b + 1) * rpb)]
        out[:, b] = xxh64_chain_longs(cols).view(np.int64)
    return out


def doc_token_hashes(texts: list):
    """Per-document token hashes in token order, for SimHash votes.

    Mirrors ``simhash_table``'s explode: normalized text split on
    single spaces, empty tokens dropped, xxhash64(token) per token.
    Docs with ZERO tokens (None / empty / whitespace-only) are
    excluded — the explode assigns them no fingerprint.

    Returns (keep, h_flat, offsets, counts) like doc_shingle_hashes
    plus the per-doc token counts (the vote denominators)."""
    keep: list[int] = []
    toks_all: list[bytes] = []
    counts: list[int] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = [w for w in normalize_py(t).split(" ") if w != ""]
        if not toks:
            continue
        keep.append(i)
        toks_all.extend(w.encode("utf-8") for w in toks)
        counts.append(len(toks))
    counts_arr = np.asarray(counts, dtype=np.int64)
    offsets = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts_arr[:-1], out=offsets[1:])
    h_flat = hash_byte_strings(toks_all)
    return keep, h_flat, offsets, counts_arr


def simhash_from_tokens(
    h_flat: np.ndarray, offsets: np.ndarray, counts: np.ndarray, bits: int = 60
) -> np.ndarray:
    """(n_docs,) int64 packed SimHash: bit i set iff the doc's tokens
    have more ones than zeros at bit i (2·ones > n, the strict-majority
    vote simhash_table packs)."""
    n = len(offsets)
    packed = np.zeros(n, dtype=np.uint64)
    if len(h_flat) == 0:
        return packed.view(np.int64)
    for i in range(bits):
        ones = np.add.reduceat((h_flat >> np.uint64(i)) & np.uint64(1), offsets)
        packed |= np.where(2 * ones > counts.astype(np.uint64), np.uint64(1) << np.uint64(i), np.uint64(0))
    return packed.view(np.int64)
