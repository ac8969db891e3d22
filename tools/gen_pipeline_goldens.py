"""Generate pinned-golden DuckDB oracles for the queries whose
semantics DuckDB cannot re-derive directly (xxhash64 signatures /
Spark-hash partitioning / seeded constructions / iterative fixpoints):

    dedup_minhash_lsh, dedup_minhash_blocked, dedup_simhash,
    ann_ivf_topk, ann_lsh_topk, ann_lsh_multiprobe,
    dedup_embedding_lsh, pack_sequences_summary,
    winnow_fingerprint_stats, winnow_overlap_pairs,
    streaming_corpus_dedup, graph_pagerank

Same pattern as tools/gen_graph_goldens.py: an INDEPENDENT pure-Python
re-implementation of each algorithm's published contract (Broder 1997
MinHash + banding; Charikar 2002 SimHash + pigeonhole; FAISS-style IVF
probe; first-fit bin packing) computes the expected rows from the raw
parquet, and we pin them as VALUES tables. No engine code is imported —
only tools/spark_hashes.py's spec-ported hash functions (themselves
pinned against live-Spark vectors).

The goldens replay the algorithms at sf0.01 on the driver's fixed
corpus — the scale the correctness gate runs at. Output:
``bigdata_foundation_spark/pipeline_goldens.py``.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

import pyarrow.parquet as pq

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
from spark_hashes import murmur3_long, pmod, spark_xxhash64, xxh64_int, xxh64_long  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def r6(x: float) -> float:
    """Spark-compatible round-half-up to 6 dp of a double."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


NOTE = (
    "-- pinned golden computed by tools/gen_pipeline_goldens.py's\n"
    "    -- INDEPENDENT pure-Python implementation at sf0.01 (xxhash64\n"
    "    -- signatures are not reproducible inside DuckDB)\n    "
)


def values_sql(cols: list[tuple[str, str]], rows: list[tuple]) -> str:
    if not rows:
        # empty result with the right column names/types
        sel = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return f"{NOTE}SELECT {sel} WHERE FALSE"
    body = ",\n      ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    names = ", ".join(n for n, _t in cols)
    return f"{NOTE}SELECT {sel} FROM (VALUES\n      {body}\n    ) AS t({names})"


# --- corpus ----------------------------------------------------------------

def load_documents() -> list[tuple[int, str]]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def load_doc_langs() -> dict[int, str]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist()))


def load_doc_sources() -> dict[int, str]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist()))


def load_embeddings() -> list[tuple[int, list[float]]]:
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    return list(zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()))


def normalize_text(s: str) -> str:
    """engine normalize_text: lower + collapse ASCII whitespace runs
    to one space (Java regex \\s is ASCII-only)."""
    return re.sub(r"\s+", " ", s.lower(), flags=re.ASCII)


# --- dedup_minhash_lsh -----------------------------------------------------

def char_shingles(t: str, k: int = 5) -> list[str]:
    n = max(len(t) - (k - 1), 1)
    seen, out = set(), []
    for i in range(n):
        s = t[i : i + k]
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def minhash_golden(
    docs, num_hashes=64, bands=16, shingle_k=5, threshold=0.5, max_bucket=1000,
    blocks=None,
):
    """``blocks`` (doc_id → block value) replays the engine's
    ``block_cols`` equality blocking: bucket keys gain the block value,
    so candidates never cross blocks."""
    rows_per_band = num_hashes // bands
    fam_cache: dict[int, list[int]] = {}

    def family(h: int) -> list[int]:
        got = fam_cache.get(h)
        if got is None:
            base = xxh64_long(h, 42)
            got = fam_cache[h] = [xxh64_int(i, base) for i in range(num_hashes)]
        return got

    shingle_hashes: dict[int, set[int]] = {}
    sigs: dict[int, list[int]] = {}
    for doc_id, text in docs:
        hs = {spark_xxhash64(s) for s in char_shingles(normalize_text(text), shingle_k)}
        shingle_hashes[doc_id] = hs
        sig = [min(family(h)[i] for h in hs) for i in range(num_hashes)]
        sigs[doc_id] = sig

    buckets: dict[tuple, list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = spark_xxhash64(*sig[b * rows_per_band : (b + 1) * rows_per_band])
            bk = (b, key) if blocks is None else (b, key, blocks[doc_id])
            buckets.setdefault(bk, []).append(doc_id)

    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        if len(ids) > max_bucket:
            continue
        for a, b in combinations(sorted(ids), 2):
            cand.add((a, b))

    est_floor = max(threshold - 0.15, 0.0)
    out = []
    for a, b in sorted(cand):
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        if agree / float(num_hashes) < est_floor:
            continue
        sa, sb = shingle_hashes[a], shingle_hashes[b]
        j = r6(len(sa & sb) / max(len(sa | sb), 1))
        if j >= threshold:
            out.append((a, b, j))
    return values_sql(
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("jaccard", "DOUBLE")], out
    )


# --- multimodal_audio_decode -------------------------------------------------

# --- IMA ADPCM scalar replay (independent of engine code) -------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_IDX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_reconstruct(nib, pred, idx):
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    return pred, max(0, min(88, idx + _IMA_IDX[nib & 7]))


def _ima_replay_decoded(chans, groups_per_block):
    """Spec replay of the synth ADPCM path: quantize each channel with
    the standard IMA encoder (block headers carry the first sample and
    the running step index), reconstruct decoder-side, return the
    per-channel DECODED int16 sample lists. Independent scalar code —
    the engine's encoder/decoder pair must land on exactly these
    values for the golden to match."""
    n = len(chans[0])
    spb = 1 + groups_per_block * 8
    out = []
    for ch in chans:
        idx = 0
        dec = []
        for start in range(0, n, spb):
            pred = ch[start]
            dec.append(pred)
            for g in range(groups_per_block):
                for k in range(8):
                    pos = start + 1 + g * 8 + k
                    s = ch[pos] if pos < n else 0
                    step = _IMA_STEPS[idx]
                    delta = s - pred
                    nib = 8 if delta < 0 else 0
                    if delta < 0:
                        delta = -delta
                    if delta >= step:
                        nib |= 4
                        delta -= step
                    if delta >= step >> 1:
                        nib |= 2
                        delta -= step >> 1
                    if delta >= step >> 2:
                        nib |= 1
                    pred, idx = _ima_reconstruct(nib, pred, idx)
                    dec.append(pred)
        out.append(dec[:n])
    return out


def audio_golden(docs):
    """Replays the synth-WAV contract (the integer-hash PCM samples
    documented at multimodal.synth_wav_table — r11 adds the
    d % 7 == 5 float32-PCM branch and the d % 11 == 7 IMA ADPCM
    branch, replayed with an independent scalar encoder+decoder) plus the WAV decode normalization
    and the audio feature formulas, independently of engine code:
    build the integer samples per doc_id, normalize exactly as the
    PCM spec (16-bit signed/32768, 8-bit (unsigned-128)/128, float32
    value clipped to [-1, 1]), compute RMS and zero-crossing fraction
    with the SAME numpy reductions on the SAME-layout float64 array
    as the engine's vectorized _audio_feature (r11 — pairwise
    summation must match bit-for-bit), narrow to float32 (the engine
    feature column is array<float>), 6-dp round."""
    import struct as st

    import numpy as np

    def f32(x: float) -> float:
        return st.unpack("<f", st.pack("<f", x))[0]

    out = []
    for doc_id, _text in docs:
        d = doc_id
        n_ch = 1 + d % 2
        is_adpcm = d % 11 == 7
        is_float = not is_adpcm and d % 7 == 5
        bits = 4 if is_adpcm else (32 if is_float else (8 if d % 3 == 0 else 16))
        n_frames = 64 + d % 129
        i_ = np.arange(n_frames, dtype=np.int64)[:, None]
        c_ = np.arange(n_ch, dtype=np.int64)[None, :]
        vals2 = ((d * 31 + i_ * 17 + c_ * 7) * 2654435761) % 65536
        vals = vals2.reshape(-1)
        if is_adpcm:
            chans = [(vals2[:, c] - 32768).tolist() for c in range(n_ch)]
            dec = _ima_replay_decoded(chans, 2)
            inter = np.empty(n_frames * n_ch, dtype=np.int64)
            for c in range(n_ch):
                inter[c::n_ch] = dec[c]
            samples = inter.astype(np.float64) / 32768.0
        elif is_float:
            samples = np.clip(
                ((vals - 32768) / 32768.0).astype("<f4").astype(np.float64),
                -1.0,
                1.0,
            )
        elif bits == 16:
            samples = (vals - 32768).astype("<i2").astype(np.float64) / 32768.0
        else:
            samples = (
                (vals >> 8).astype(np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        s = np.ascontiguousarray(samples)
        n = s.shape[0]
        rms = math.sqrt((s * s).mean())
        neg = s < 0.0
        zc = float(np.count_nonzero(neg[1:] != neg[:-1]) / max(n - 1, 1))
        out.append((d, n_frames, n_ch, r6(f32(rms)), r6(f32(zc))))
    return values_sql(
        [
            ("media_id", "BIGINT"),
            ("n_frames", "INTEGER"),
            ("n_channels", "INTEGER"),
            ("rms", "DOUBLE"),
            ("zcr", "DOUBLE"),
        ],
        out,
    )


# --- multimodal_video_frames -------------------------------------------------

def video_golden(docs, every_n=2, max_frames=4):
    """Replays the synth-AVI contract (the integer-hash pixels
    documented at multimodal.synth_avi_table) plus the frame sampler
    and the pixel feature, independently of engine code: rebuild each
    sampled frame's RGB pixels from the hash, compute the gray
    mean/stddev with the SAME numpy reductions on the SAME-layout
    float64 (n, 3) array as the engine's vectorized _pixel_feature
    (r11 — pairwise summation must match bit-for-bit), narrow to
    float32 (the feature column is array<float>), 6-dp round."""
    import struct as st

    import numpy as np

    def f32(x: float) -> float:
        return st.unpack("<f", st.pack("<f", x))[0]

    out = []
    for doc_id, _text in docs:
        d = doc_id
        w = 8 + (d % 3) * 4
        h = 6 + (d % 2) * 2
        n_frames = 3 + d % 6
        y_ = np.arange(h, dtype=np.int64)[:, None, None]
        x_ = np.arange(w, dtype=np.int64)[None, :, None]
        c_ = np.arange(3, dtype=np.int64)[None, None, :]
        for k, fi in enumerate(range(0, n_frames, every_n)):
            if k >= max_frames:
                break
            pixv = ((d * 13 + fi * 7 + y_ * 5 + x_ * 3 + c_) * 2654435761) % 256
            a = pixv.reshape(-1, 3).astype(np.uint8).astype(np.float64)
            a = np.ascontiguousarray(a)
            n = a.shape[0]
            r = a[:, 0].copy()
            g = a[:, 1].copy()
            b = a[:, 2].copy()
            gray = (r + g + b) / 3.0
            mgray = gray.mean() / 255.0
            dev = gray / 255.0 - mgray
            gray_std = math.sqrt((dev * dev).mean())
            out.append((d, fi, w, h, r6(f32(mgray)), r6(f32(gray_std))))
    return values_sql(
        [
            ("media_id", "BIGINT"),
            ("frame_no", "INTEGER"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
            ("gray_mean", "DOUBLE"),
            ("gray_std", "DOUBLE"),
        ],
        out,
    )


# --- multimodal_gif_decode / multimodal_gif_frames --------------------------

def _gif_replay_frames(d: int):
    """Bytes-free replay of the synth-GIF contract (the deterministic
    rule documented at multimodal.synth_gif_table): palette lookups,
    region placement, transparency compositing — WITHOUT the GIF
    encoder/decoder pair, so any LZW/interlace/palette codec bug
    breaks the golden equality. Returns (w, h, [full-canvas RGB
    uint8 arrays])."""
    import numpy as np

    w = 10 + (d % 5) * 3
    h = 8 + (d % 4) * 3
    n_frames = 1 + d % 4

    def palette(f: int):
        j = np.arange(16, dtype=np.int64)[:, None]
        c = np.arange(3, dtype=np.int64)[None, :]
        salt = 71 * f if (f == 1 and d % 3 == 0) else 0
        return (((d * 29 + j * 97 + c * 53 + salt) * 2654435761) % 256).astype(
            np.uint8
        )

    gct = palette(0)
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    canvas[:, :] = gct[0]
    frames = []
    for f in range(n_frames):
        region = f >= 1 and d % 4 == 3
        lf, tf = (2, 1) if region else (0, 0)
        wf, hf = (w - 4, h - 2) if region else (w, h)
        pal = palette(f) if (f == 1 and d % 3 == 0) else gct
        y = np.arange(hf, dtype=np.int64)[:, None]
        x = np.arange(wf, dtype=np.int64)[None, :]
        idx = (((d * 13 + f * 7 + y * 5 + x * 3) * 2654435761) % 16).astype(np.uint8)
        rgb = pal[idx.reshape(-1)].reshape(hf, wf, 3)
        if f >= 1 and d % 5 == 2:
            prev = canvas[tf : tf + hf, lf : lf + wf]
            rgb = np.where((idx == 3)[:, :, None], prev, rgb)
        canvas = canvas.copy()
        canvas[tf : tf + hf, lf : lf + wf] = rgb
        frames.append(canvas)
    return w, h, frames


def _gif_feature_pair(frame):
    """gray mean/std with the engine's _pixel_feature numpy ops on the
    same-layout float64 (n, 3) array (the r11 bit-for-bit mirror
    discipline), float32-narrowed, 6-dp rounded."""
    import struct as st

    import numpy as np

    def f32(x: float) -> float:
        return st.unpack("<f", st.pack("<f", x))[0]

    a = np.ascontiguousarray(frame.reshape(-1, 3).astype(np.float64))
    r = a[:, 0].copy()
    g = a[:, 1].copy()
    b = a[:, 2].copy()
    gray = (r + g + b) / 3.0
    mgray = gray.mean() / 255.0
    dev = gray / 255.0 - mgray
    gray_std = math.sqrt((dev * dev).mean())
    return r6(f32(mgray)), r6(f32(gray_std))


def gif_decode_golden(docs):
    """Replays synth-GIF FIRST-frame decode + pixel feature."""
    out = []
    for doc_id, _text in docs:
        w, h, frames = _gif_replay_frames(doc_id)
        gm, gs = _gif_feature_pair(frames[0])
        out.append((doc_id, w, h, gm, gs))
    return values_sql(
        [
            ("media_id", "BIGINT"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
            ("gray_mean", "DOUBLE"),
            ("gray_std", "DOUBLE"),
        ],
        out,
    )


def gif_frames_golden(docs, every_n=2, max_frames=4):
    """Replays synth-GIF animation frame sampling (composited
    full-canvas frames) + pixel features."""
    out = []
    for doc_id, _text in docs:
        w, h, frames = _gif_replay_frames(doc_id)
        for k, fi in enumerate(range(0, len(frames), every_n)):
            if k >= max_frames:
                break
            gm, gs = _gif_feature_pair(frames[fi])
            out.append((doc_id, fi, w, h, gm, gs))
    return values_sql(
        [
            ("media_id", "BIGINT"),
            ("frame_no", "INTEGER"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
            ("gray_mean", "DOUBLE"),
            ("gray_std", "DOUBLE"),
        ],
        out,
    )


# --- dedup_image_phash -------------------------------------------------------

def image_phash_golden(docs, n_base=250, max_hamming=3):
    """Replays the planted near-dup image corpus (the deterministic
    pixel rule documented at multimodal.synth_image_pair_table) +
    dHash + the Hamming pair sweep, bytes-free and with an
    independent SCALAR dHash implementation — the engine's
    BMP encode -> decode -> numpy dHash path must land on exactly
    these pairs."""
    import numpy as np

    def pixels(d):
        base = d % n_base
        rep = d // n_base
        w = 24 + (base % 5) * 4
        h = 16 + (base % 3) * 4
        M64 = (1 << 64) - 1

        def px(y, x, c):
            t = (base * 2654435761 + y * 97 + x * 89 + c * 83) & M64
            t = ((t ^ (t >> 13)) * 1274126177) & M64
            return (t >> 24) % 256

        pix = [[[px(y, x, c) for c in range(3)] for x in range(w)] for y in range(h)]
        if rep:
            by = (base * 7) % (h - 3)
            bx = (base * 11) % (w - 3)
            for y in range(by, by + 3):
                for x in range(bx, bx + 3):
                    for c in range(3):
                        pix[y][x][c] = (pix[y][x][c] + 40) % 256
        return pix, w, h

    def dhash(pix, w, h):
        gray = [[sum(pix[y][x]) // 3 for x in range(w)] for y in range(h)]
        val = 0
        for gy in range(8):
            sy = (gy * h) // 8
            for gx in range(8):
                a = gray[sy][(gx * w) // 9]
                b = gray[sy][((gx + 1) * w) // 9]
                if b > a:
                    val |= 1 << (gy * 8 + gx)
        if val >= 1 << 63:
            val -= 1 << 64
        return val

    hashes = {}
    for doc_id, _text in docs:
        pix, w, h = pixels(doc_id)
        hashes[doc_id] = dhash(pix, w, h)
    ids = sorted(hashes)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            hd = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if hd <= max_hamming:
                out.append((a, b, hd))
    return values_sql(
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")],
        out,
    )


# --- streaming_corpus_dedup ------------------------------------------------

def corpus_stream_golden(
    docs,
    threshold=0.5,
    num_hashes=64,
    bands=16,
    shingle_k=5,
    max_bucket=1000,
    n_batches=2,
):
    """Replay of streaming.corpus.process_corpus_batch's greedy loop
    over ``n_batches`` batches split by doc_id % n_batches: per batch,
    exact dedup (lowest id per normalized text) → within-batch banding
    + est-prune + exact-Jaccard pairs → min-label clusters (keep the
    min id) → cross-batch probe of the accumulated index postings with
    the UNION-size bucket cap (stored + query counts per (band, key))
    → survivors join the index. Greedy first-seen-wins: a doc whose
    only near-dup was itself rejected earlier is accepted."""
    rows_per_band = num_hashes // bands
    fam_cache: dict[int, list[int]] = {}

    def family(h: int) -> list[int]:
        got = fam_cache.get(h)
        if got is None:
            base = xxh64_long(h, 42)
            got = fam_cache[h] = [xxh64_int(i, base) for i in range(num_hashes)]
        return got

    norm: dict[int, str] = {}
    shingle_hashes: dict[int, set[int]] = {}
    sigs: dict[int, list[int]] = {}
    bkeys: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        t = normalize_text(text)
        norm[doc_id] = t
        hs = {spark_xxhash64(s) for s in char_shingles(t, shingle_k)}
        shingle_hashes[doc_id] = hs
        sig = [min(family(h)[i] for h in hs) for i in range(num_hashes)]
        sigs[doc_id] = sig
        bkeys[doc_id] = [
            (b, spark_xxhash64(*sig[b * rows_per_band : (b + 1) * rows_per_band]))
            for b in range(bands)
        ]

    est_floor = max(threshold - 0.15, 0.0)

    def est_ok(a: int, b: int) -> bool:
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        return agree / float(num_hashes) >= est_floor

    def jac(a: int, b: int) -> float:
        sa, sb = shingle_hashes[a], shingle_hashes[b]
        return r6(len(sa & sb) / max(len(sa | sb), 1))

    idx_postings: dict[tuple[int, int], list[int]] = {}
    idx_sizes: dict[tuple[int, int], int] = {}
    accepted_all: list[int] = []
    for bi in range(n_batches):
        batch_ids = sorted(d for d, _t2 in docs if d % n_batches == bi)
        # exact dedup: lowest id per normalized text
        by_norm: dict[str, int] = {}
        for did in batch_ids:
            by_norm.setdefault(norm[did], did)
        survivors0 = sorted(by_norm.values())
        # within-batch near-dup pairs (batch-only buckets)
        buckets: dict[tuple[int, int], list[int]] = {}
        for did in survivors0:
            for k_ in bkeys[did]:
                buckets.setdefault(k_, []).append(did)
        cand: set[tuple[int, int]] = set()
        for ids in buckets.values():
            if len(ids) > max_bucket:
                continue
            for a, b in combinations(sorted(ids), 2):
                cand.add((a, b))
        pairs = [
            (a, b)
            for a, b in sorted(cand)
            if est_ok(a, b) and jac(a, b) >= threshold
        ]
        # min-label connected components; keep the min id per cluster
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        losers = {d for d in survivors0 if find(d) != d}
        survivors = [d for d in survivors0 if d not in losers]
        # cross-batch probe with the union-size cap
        if idx_sizes:
            qsizes: dict[tuple[int, int], int] = {}
            for did in survivors:
                for k_ in bkeys[did]:
                    qsizes[k_] = qsizes.get(k_, 0) + 1
            dropped: set[int] = set()
            for did in survivors:
                hit = False
                for k_ in bkeys[did]:
                    if idx_sizes.get(k_, 0) + qsizes.get(k_, 0) > max_bucket:
                        continue
                    for iid in idx_postings.get(k_, ()):
                        if est_ok(did, iid) and jac(did, iid) >= threshold:
                            hit = True
                            break
                    if hit:
                        break
                if hit:
                    dropped.add(did)
            survivors = [d for d in survivors if d not in dropped]
        for did in survivors:
            for k_ in bkeys[did]:
                idx_postings.setdefault(k_, []).append(did)
                idx_sizes[k_] = idx_sizes.get(k_, 0) + 1
        accepted_all.extend(survivors)
    return values_sql([("doc_id", "BIGINT")], [(d,) for d in sorted(accepted_all)])


# --- winnowing fingerprints ------------------------------------------------

def winnow(text: str, k: int = 7, w: int = 4) -> list[int]:
    """Schleimer/Wilkerson/Aiken winnowing, mirroring the engine
    contract: hash every char k-gram of the normalized text in
    position order (short tail slices hash as-is, matching Spark
    substring), min per w-window, ordered-distinct minima."""
    t = normalize_text(text)
    nh = max(len(t) - (k - 1), 1)
    hs = [spark_xxhash64(t[i : i + k]) for i in range(nh)]
    nw = max(nh - (w - 1), 1)
    mins = [min(hs[j : j + w]) for j in range(nw)]
    return list(dict.fromkeys(mins))


def winnow_stats_golden(docs, k=7, w=4):
    rows = []
    for doc_id, text in docs:
        fps = winnow(text, k, w)
        rows.append((doc_id, len(fps), min(fps), max(fps)))
    return values_sql(
        [
            ("doc_id", "BIGINT"),
            ("n_fp", "INTEGER"),
            ("fp_min", "BIGINT"),
            ("fp_max", "BIGINT"),
        ],
        rows,
    )


def winnow_pairs_golden(docs, k=7, w=4, min_shared=5, max_doc_freq=100):
    fps = {doc_id: winnow(text, k, w) for doc_id, text in docs}
    df_count: dict[int, int] = {}
    for fp_list in fps.values():
        for fp in fp_list:
            df_count[fp] = df_count.get(fp, 0) + 1
    postings: dict[int, list[int]] = {}
    for doc_id, fp_list in fps.items():
        for fp in fp_list:
            if df_count[fp] <= max_doc_freq:
                postings.setdefault(fp, []).append(doc_id)
    shared: dict[tuple[int, int], int] = {}
    for ids in postings.values():
        for a, b in combinations(sorted(ids), 2):
            shared[(a, b)] = shared.get((a, b), 0) + 1
    rows = [
        (a, b, c) for (a, b), c in sorted(shared.items()) if c >= min_shared
    ]
    return values_sql(
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("shared", "BIGINT")], rows
    )


# --- dedup_simhash ---------------------------------------------------------

def simhash_golden(docs, bits=60, chunks=4, max_hamming=3, max_bucket=1000):
    tok_cache: dict[str, int] = {}
    fingerprints: dict[int, int] = {}
    for doc_id, text in docs:
        toks = [t for t in normalize_text(text).split(" ") if t != ""]
        if not toks:
            # engine parity: a zero-token doc has no rows after the
            # token explode, so simhash_table assigns it NO fingerprint
            continue
        votes = [0] * bits
        for t in toks:
            h = tok_cache.get(t)
            if h is None:
                h = tok_cache[t] = spark_xxhash64(t)
            for i in range(bits):
                votes[i] += 1 if (h >> i) & 1 else -1
        packed = 0
        for i in range(bits):
            if votes[i] > 0:
                packed |= 1 << i
        fingerprints[doc_id] = packed

    width = bits // chunks
    mask = (1 << width) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, fp in fingerprints.items():
        for c in range(chunks):
            buckets.setdefault((c, (fp >> (c * width)) & mask), []).append(doc_id)

    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        if len(ids) > max_bucket:
            continue
        for a, b in combinations(sorted(ids), 2):
            cand.add((a, b))

    out = []
    for a, b in sorted(cand):
        ham = bin(fingerprints[a] ^ fingerprints[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return values_sql(
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")], out
    )


# --- ann_ivf_topk ----------------------------------------------------------

def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _norm(a):
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def _cos(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


# --- numpy ANN arithmetic (r9) ---------------------------------------------
# The engine's scan-side ANN kernels (cell assignment, PQ encode, ADC
# tables) are Arrow-vectorized numpy since r9; these helpers replay
# that arithmetic with the SAME row-local reductions ((V*C[i]).sum(
# axis=1), ((X-B[c])**2).sum(axis=1)) so results are bit-identical
# regardless of how rows are batched. Training (Lloyd, codebooks)
# remains the driver-side fold arithmetic replayed elsewhere in this
# file — only scan-side quantities moved to numpy.
# Tie/degenerate contracts mirrored: assignment = max sim, ties →
# HIGHEST cid, zero-norm products → -inf; probe order = sim desc,
# ties → cid desc; PQ codes = argmin squared-L2, ties → LOWEST code.


def _npm(rows):
    import numpy as np

    return np.asarray([np.asarray(v, dtype=np.float64) for v in rows], dtype=np.float64)


def _np_sims(V, C):
    import numpy as np

    vn = np.sqrt((V * V).sum(axis=1))
    cn = np.sqrt((C * C).sum(axis=1))
    sims = np.empty((V.shape[0], C.shape[0]), dtype=np.float64)
    for i in range(C.shape[0]):
        sims[:, i] = (V * C[i]).sum(axis=1)
    denom = vn[:, None] * cn[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0.0, sims / denom, -np.inf)


def _np_cells(V, C):
    sims = _np_sims(V, C)
    return [int(c) for c in sims.shape[1] - 1 - sims[:, ::-1].argmax(axis=1)]


def _np_probe_ids(V, C, n_probe):
    import numpy as np

    sims = _np_sims(V, C)
    k = sims.shape[1]
    order = np.argsort(-sims[:, ::-1], axis=1, kind="stable")
    return [[int(c) for c in row[: min(n_probe, k)]] for row in (k - 1 - order)]


def _np_sqdists(X, B):
    import numpy as np

    out = np.empty((X.shape[0], B.shape[0]), dtype=np.float64)
    for c in range(B.shape[0]):
        diff = X - B[c]
        out[:, c] = (diff * diff).sum(axis=1)
    return out


def _np_codes(R, books):
    d = books[0].shape[1]
    return [
        [int(_np_sqdists(R[i : i + 1, j * d : (j + 1) * d], B).argmin()) for j, B in enumerate(books)]
        for i in range(R.shape[0])
    ]


def _np_tables_row(r, books):
    d = books[0].shape[1]
    R = r.reshape(1, -1)
    return [
        [float(x) for x in _np_sqdists(R[:, j * d : (j + 1) * d], B)[0]]
        for j, B in enumerate(books)
    ]


def ivf_golden(vecs, k=5, n_cells=16, n_probe=4, max_query_id=8, lloyd_iters=2):
    """Replay of similarity.ivf_topk: hash-spread centroid seeds (the
    n_cells ids with smallest (xxhash64(id), id) — same selection the
    Spark operator computes via orderBy(xxhash64(id)).limit, cell ids
    assigned in ascending seed-id order) followed by ``lloyd_iters``
    spherical-k-means steps. Each step assigns every vector to its
    max-(cosine, cid) centroid and replaces each centroid with its
    cell's per-dimension mean ROUNDED TO 6 DP — the rounding is the
    engine's determinism contract (float summation order differs
    between Spark's partial aggregation and this list-order replay by
    ~1e-13, far below the 1e-6 quantum). Empty cells keep their
    previous centroid."""
    byid = dict(vecs)
    chosen = sorted(byid, key=lambda vid: (spark_xxhash64(vid), vid))[:n_cells]
    centroids = [(cid, byid[vid]) for cid, vid in enumerate(sorted(chosen))]

    def cell_scores(v):
        return [(_cos(v, cvec), cid) for cid, cvec in centroids]

    dim = len(vecs[0][1]) if vecs else 0
    for _ in range(lloyd_iters):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for _vid, v in vecs:
            cell = max(cell_scores(v))[1]
            acc = sums.setdefault(cell, [0.0] * dim)
            for i, x in enumerate(v):
                acc[i] = acc[i] + x
            counts[cell] = counts.get(cell, 0) + 1
        centroids = [
            (
                cid,
                [round(sums[cid][i] / counts[cid], 6) for i in range(dim)]
                if cid in counts
                else cvec,
            )
            for cid, cvec in centroids
        ]

    _C = _npm([cvec for _cid, cvec in centroids])
    _ids = [vid for vid, _v in vecs]
    corpus_cell = dict(zip(_ids, _np_cells(_npm([v for _vid, v in vecs]), _C)))
    cells: dict[int, list[int]] = {}
    for vid, cell in corpus_cell.items():
        cells.setdefault(cell, []).append(vid)

    out = []
    for qid in sorted(vid for vid in byid if vid < max_query_id):
        qv = byid[qid]
        probed = _np_probe_ids(_npm([qv]), _C, n_probe)[0]
        cand = {nid for cid in probed for nid in cells.get(cid, ()) if nid != qid}
        scored = sorted(
            ((r6(_cos(qv, byid[nid])), nid) for nid in cand),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, nid) in enumerate(scored[:k], start=1):
            out.append((qid, nid, cos, rank))
    return values_sql(
        [
            ("query_id", "BIGINT"),
            ("neighbor_id", "BIGINT"),
            ("cosine", "DOUBLE"),
            ("rank", "BIGINT"),
        ],
        out,
    )


# --- ann_lsh_topk ----------------------------------------------------------

def lsh_golden(vecs, k=5, n_planes=16, bands=4, dim=64, seed=42, max_query_id=8, multi_probe=0):
    """Replay of similarity.lsh_topk: random-hyperplane signatures from
    the same seeded construction (stdlib Random(seed).gauss — a public,
    reproducible sequence), banded prefixes, candidate = shares any
    band, exact cosine re-rank. ``multi_probe=1`` adds, per band, the
    query keys with each of the ``width`` bits flipped (Lv 2007)."""
    import random

    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    width = n_planes // bands
    mask = (1 << width) - 1

    def sig(v):
        s = 0
        for i, p in enumerate(planes):
            if _dot(v, p) >= 0:
                s |= 1 << i
        return s

    byid = dict(vecs)
    bands_of = {
        vid: [(b, (sig(v) >> (b * width)) & mask) for b in range(bands)]
        for vid, v in vecs
    }
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, bl in bands_of.items():
        for key in bl:
            buckets.setdefault(key, []).append(vid)

    out = []
    for qid in sorted(vid for vid in byid if vid < max_query_id):
        probe_keys = [
            (b, key ^ flip)
            for b, key in bands_of[qid]
            for flip in ([0] + [1 << j for j in range(width)] if multi_probe else [0])
        ]
        cand = {
            nid
            for key in probe_keys
            for nid in buckets.get(key, ())
            if nid != qid
        }
        scored = sorted(
            ((r6(_cos(byid[qid], byid[nid])), nid) for nid in cand),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, nid) in enumerate(scored[:k], start=1):
            out.append((qid, nid, cos, rank))
    return values_sql(
        [
            ("query_id", "BIGINT"),
            ("neighbor_id", "BIGINT"),
            ("cosine", "DOUBLE"),
            ("rank", "BIGINT"),
        ],
        out,
    )


# --- dedup_embedding_lsh (threshold low enough for real pairs) -------------

def auto_lsh_params(threshold, bands=8, target_recall=0.9):
    """Independent replay of similarity.auto_lsh_params (same math,
    no package import — the replay must not share code with the
    engine)."""
    p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    if p <= 0.0 or p >= 1.0:
        return bands, bands
    need = 1.0 - (1.0 - target_recall) ** (1.0 / bands)
    r = int(math.floor(math.log(need) / math.log(p)))
    r = max(1, min(r, 30))
    return r * bands, bands


def neardup_lsh_golden(
    vecs, threshold=0.4, n_planes=None, bands=None, dim=64, seed=42, max_bucket=100_000
):
    """Replay of similarity.embedding_neardup_pairs(method='lsh'): the
    banded-candidate path itself is the contract under test, so the
    golden replays banding + exact verify (not all-pairs) — at this
    threshold real pairs exist AND banding recall is part of the
    pinned answer. Band keys: bit j of band i = sign bit of plane
    i*width+j — identical to the engine's band_key_structs packing."""
    import random

    if n_planes is None and bands is None:
        n_planes, bands = auto_lsh_params(threshold)
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    width = n_planes // bands
    mask = (1 << width) - 1

    def sig(v):
        s = 0
        for i, p in enumerate(planes):
            if _dot(v, p) >= 0:
                s |= 1 << i
        return s

    buckets: dict[tuple[int, int], list[int]] = {}
    byid = dict(vecs)
    for vid, v in vecs:
        s = sig(v)
        for b in range(bands):
            buckets.setdefault((b, (s >> (b * width)) & mask), []).append(vid)

    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        if len(ids) > max_bucket:
            continue
        for a, b in combinations(sorted(ids), 2):
            cand.add((a, b))

    out = []
    for a, b in sorted(cand):
        cos = r6(_cos(byid[a], byid[b]))
        if cos >= threshold:
            out.append((a, b, cos))
    return values_sql(
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("cosine", "DOUBLE")], out
    )


# --- pack_sequences_summary ------------------------------------------------

def pack_golden(docs, budget=512, num_shards=32):
    def n_tokens(text: str) -> int:
        return len([t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t != ""])

    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        shards.setdefault(pmod(murmur3_long(doc_id), num_shards), []).append(
            (doc_id, n_tokens(text))
        )

    pack_tokens: list[int] = []
    n_docs = 0
    for pid in shards:
        bins: list[int] = []  # remaining capacity
        toks: list[int] = []  # filled tokens per bin
        for doc_id, n in sorted(shards[pid]):
            n_docs += 1
            placed = None
            for i, cap in enumerate(bins):
                if n <= cap:
                    bins[i] = cap - n
                    toks[i] += n
                    placed = i
                    break
            if placed is None:
                # oversize docs open a CLOSED bin (capacity -1, nothing
                # joins — not even zero-token docs), mirroring
                # packing.pack_sequences
                bins.append(budget - n if n <= budget else -1)
                toks.append(n)
        pack_tokens.extend(toks)

    n_packs = len(pack_tokens)
    avg_fill = r6(sum(t / float(budget) for t in pack_tokens) / n_packs)
    pct_90 = r6(sum(1.0 for t in pack_tokens if t >= 0.9 * budget) / n_packs)
    return values_sql(
        [
            ("n_packs", "BIGINT"),
            ("n_docs", "BIGINT"),
            ("avg_fill", "DOUBLE"),
            ("pct_90_full", "DOUBLE"),
        ],
        [(n_packs, n_docs, avg_fill, pct_90)],
    )


def main() -> None:
    docs = load_documents()
    vecs = load_embeddings()
    assert len(docs) == 500 and len(vecs) == 500, (len(docs), len(vecs))

    oracles = {
        "dedup_minhash_lsh": minhash_golden(docs),
        "dedup_minhash_blocked": minhash_golden(docs, blocks=load_doc_langs()),
        "dedup_simhash": simhash_golden(docs),
        "ann_ivf_topk": ivf_golden(vecs),
        "ann_lsh_topk": lsh_golden(vecs),
        "ann_lsh_multiprobe": lsh_golden(vecs, multi_probe=1),
        "dedup_embedding_lsh": neardup_lsh_golden(vecs),
        "pack_sequences_summary": pack_golden(docs),
        "winnow_fingerprint_stats": winnow_stats_golden(docs, k=20, w=8),
        "winnow_overlap_pairs": winnow_pairs_golden(
            docs, k=20, w=8, min_shared=2, max_doc_freq=50
        ),
        "streaming_corpus_dedup": corpus_stream_golden(docs),
        "graph_pagerank": pagerank_golden(),
        "graph_ppr": ppr_golden(),
        "graph_eccentricity": eccentricity_golden(),
        "graph_eigenvector": eigenvector_golden(),
        "graph_random_walks": walks_golden(),
        "graph_harmonic": harmonic_golden(),
        "graph_closeness": closeness_golden(),
        "graph_bridges": bridges_golden(),
        "graph_articulation": articulation_golden(),
        "graph_label_propagation": lpa_golden(),
        "graph_betweenness": betweenness_golden(),
        "graph_scc": scc_golden(),
        "graph_kcore": kcore_golden(),
        "ann_pq_topk": pq_golden(vecs),
        "ann_ivf_pq_topk": ivf_pq_golden(vecs),
        "ann_ivf_pq_refine": ivf_pq_golden(vecs, refine_k=5, shortlist=20),
        "semantic_dedup": semdedup_golden(vecs),
        "graph_msf": msf_golden(),
        "graph_louvain": louvain_golden(),
        "graph_modularity": modularity_golden(),
        "embedding_kmeans": kmeans_golden(vecs),
        "bpe_tokenize": bpe_golden(docs),
        "bpe_fertility": bpe_golden(docs, fertility_groups=load_doc_sources()),
        "quality_classifier": classifier_golden(docs, load_doc_langs()),
        "embedding_pca": pca_golden(vecs),
        "graph_hyperball": hyperball_golden(),
        "graph_ktruss": ktruss_golden(),
        "graph_hits": hits_golden(),
        "bloom_dedup_probe": bloom_golden(docs),
        "cms_heavy_hitters": cms_golden(docs),
        "multimodal_audio_decode": audio_golden(docs),
        "multimodal_video_frames": video_golden(docs),
        "multimodal_gif_decode": gif_decode_golden(docs),
        "multimodal_gif_frames": gif_frames_golden(docs),
        "dedup_image_phash": image_phash_golden(docs),
    }

    out = "/root/repo/bigdata_foundation_spark/pipeline_goldens.py"
    with open(out, "w") as f:
        f.write(
            '"""Pinned-golden DuckDB oracles for the hash-signature pipeline\n'
            "queries at sf0.01 (the correctness gate's scale).\n\n"
            "GENERATED by tools/gen_pipeline_goldens.py from an independent\n"
            "pure-Python replay of each algorithm's published contract over\n"
            "the raw parquet — NOT by the engine. Do not edit by hand;\n"
            'regenerate instead."""\n\n'
            "PIPELINE_GOLDEN_SQL: dict[str, str] = {\n"
        )
        for k, v in oracles.items():
            f.write(f"    {k!r}: r'''{v}''',\n")
        f.write("}\n")
    print(f"wrote {out} with {len(oracles)} oracles")
    for k, v in oracles.items():
        print(f"  {k}: {len(v)} chars")





# --- graph_pagerank --------------------------------------------------------

def load_csv1_edges() -> list[tuple[str, str]]:
    """CSV1 (src, dst) multigraph rows replicating the ETL contract:
    blank START_NODE rows dropped, nodes = distinct START_NODE,
    dangling-END drop, quadruple dedup (parallel edges with distinct
    EDGE/LENGTH survive and each carries PageRank mass)."""
    import csv

    with open("/root/reference/Shenzhen_Edgelist_1.csv", newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("START_NODE")]
    nodes = {r["START_NODE"] for r in rows}
    quads = list(
        dict.fromkeys(
            (r["START_NODE"], r["END_NODE"], r["EDGE"], r["LENGTH"])
            for r in rows
            if r["END_NODE"] in nodes
        )
    )
    return [(s, d) for s, d, _e, _l in quads]


def pagerank_golden(damping=0.85, iters=20, topk=100):
    """Replay of graph.etl.pagerank: multigraph mass, uniform dangling
    redistribution, fixed iterations, 6-dp final rounding (the
    determinism contract — float-order wobble ~1e-13 sits far below
    the quantum). Pins the top-``topk`` rows by (rank DESC, NodeId)."""
    edges = load_csv1_edges()
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg: dict[str, int] = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rv for v, rv in r.items() if v not in outdeg)
        base = (1.0 - damping) / n + damping * dangling / n
        contrib: dict[str, float] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0.0) + r[s] / outdeg[s]
        r = {v: base + damping * contrib.get(v, 0.0) for v in nodes}
    ranked = sorted(((r6(rv), v) for v, rv in r.items()), key=lambda t: (-t[0], t[1]))
    rows = [(v, rv) for rv, v in ranked[:topk]]
    return values_sql([("NodeId", "VARCHAR"), ("rank", "DOUBLE")], rows)




# --- graph_ppr -------------------------------------------------------------

def ppr_golden(damping=0.85, iters=20, n_sources=4, topk=100):
    """Replay of graph.etl.personalized_pagerank: pagerank_golden's
    loop with the teleport vector restricted to the hash-spread
    ``n_sources`` seed set (smallest (spark_xxhash64(id), id) — the
    harmonic/closeness selection); restart AND dangling mass return
    to the seeds uniformly. Pins the top-``topk`` rows by
    (rank DESC, NodeId), 6-dp rounding."""
    edges = load_csv1_edges()
    nodes = sorted({x for e in edges for x in e})
    seeds = sorted(nodes, key=lambda v: (spark_xxhash64(v), v))[:n_sources]
    k = len(seeds)
    outdeg: dict[str, int] = {}
    for s_, _d in edges:
        outdeg[s_] = outdeg.get(s_, 0) + 1
    restart = {v: (1.0 / k if v in set(seeds) else 0.0) for v in nodes}
    r = dict(restart)
    for _ in range(iters):
        dangling = sum(rv for v, rv in r.items() if v not in outdeg)
        contrib: dict[str, float] = {}
        for s_, d in edges:
            contrib[d] = contrib.get(d, 0.0) + r[s_] / outdeg[s_]
        tp = 1.0 - damping + damping * dangling
        r = {v: tp * restart[v] + damping * contrib.get(v, 0.0) for v in nodes}
    ranked = sorted(((r6(rv), v) for v, rv in r.items()), key=lambda t: (-t[0], t[1]))
    rows = [(v, rv) for rv, v in ranked[:topk]]
    return values_sql([("NodeId", "VARCHAR"), ("rank", "DOUBLE")], rows)



# --- graph_eccentricity / graph_eigenvector --------------------------------

def eccentricity_golden(n_sources=16):
    """Replay of paths.eccentricity: same hash-spread sample and heap
    Dijkstra as closeness_golden; ecc(s) = max distance over reachable
    targets (0.0 when nothing is reachable; reachability = every
    settled node except the source itself, so zero-cost edges count —
    r7 contract), 6-dp rounded (the max of exactly-replayed distances
    — rounding is convention, not need)."""
    import heapq

    edges = load_csv1_weighted_edges()
    nodes = sorted({x for s, d, _c in edges for x in (s, d)})
    adj: dict[str, list[tuple[str, float]]] = {}
    for s, d, c in edges:
        adj.setdefault(s, []).append((d, c))
    srcs = sorted(nodes, key=lambda v: (spark_xxhash64(v), v))[:n_sources]
    rows = []
    for s in sorted(srcs):
        dist: dict[str, float] = {s: 0.0}
        pq = [(0.0, s)]
        done = set()
        while pq:
            du, u = heapq.heappop(pq)
            if u in done:
                continue
            done.add(u)
            for v, w in adj.get(u, ()):
                nd = du + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        pos = [d for node, d in dist.items() if node != s]
        rows.append((s, r6(max(pos, default=0.0)), len(pos)))
    return values_sql(
        [("NodeId", "VARCHAR"), ("eccentricity", "DOUBLE"), ("n_reachable", "BIGINT")],
        rows,
    )


def eigenvector_golden(iters=20, topk=100):
    """Replay of graph.etl.eigenvector_centrality: power iteration
    x <- normalize2(A^T x) from a uniform start, multigraph mass,
    fixed iterations, 6-dp rounding; zero vector if the in-mass dies.
    Pins the top-``topk`` rows by (rank DESC, NodeId)."""
    import math

    edges = load_csv1_edges()
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    x = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib: dict[str, float] = {}
        for s_, d in edges:
            contrib[d] = contrib.get(d, 0.0) + x[s_]
        norm = math.sqrt(sum(c * c for c in contrib.values()))
        if norm == 0.0:
            x = {v: 0.0 for v in nodes}
            break
        x = {v: contrib.get(v, 0.0) / norm for v in nodes}
    ranked = sorted(((r6(rv), v) for v, rv in x.items()), key=lambda t: (-t[0], t[1]))
    rows = [(v, rv) for rv, v in ranked[:topk]]
    return values_sql([("NodeId", "VARCHAR"), ("rank", "DOUBLE")], rows)



def hits_golden(iters=20, topk=100):
    """Replay of graph.etl.hits (Kleinberg 1999): a <- normalize2(A^T h),
    h <- normalize2(A a) from the all-ones start, multigraph mass,
    fixed full update pairs, 6-dp rounding; a side whose mass dies
    goes to zeros. Pins the top-``topk`` rows by (authority DESC,
    NodeId)."""
    import math

    edges = load_csv1_edges()
    nodes = sorted({x for e in edges for x in e})
    a = {v: 1.0 for v in nodes}
    h = {v: 1.0 for v in nodes}
    for _ in range(iters):
        an: dict[str, float] = {}
        for s_, d in edges:
            an[d] = an.get(d, 0.0) + h[s_]
        na = math.sqrt(sum(c * c for c in an.values()))
        a = (
            {v: an.get(v, 0.0) / na for v in nodes}
            if na > 0.0
            else {v: 0.0 for v in nodes}
        )
        hn: dict[str, float] = {}
        for s_, d in edges:
            hn[s_] = hn.get(s_, 0.0) + a[d]
        nh = math.sqrt(sum(c * c for c in hn.values()))
        h = (
            {v: hn.get(v, 0.0) / nh for v in nodes}
            if nh > 0.0
            else {v: 0.0 for v in nodes}
        )
    ranked = sorted(
        ((r6(a[v]), r6(h[v]), v) for v in nodes), key=lambda t: (-t[0], t[2])
    )
    rows = [(v, av, hv) for av, hv, v in ranked[:topk]]
    return values_sql(
        [("NodeId", "VARCHAR"), ("authority", "DOUBLE"), ("hub", "DOUBLE")], rows
    )


# --- graph_random_walks ----------------------------------------------------

def walks_golden(walk_length=8, walks_per_node=2, n_seeds=8):
    """Replay of graph.etl.random_walks: simple directed graph
    (distinct src->dst, self-loops dropped), out-neighbors sorted by
    id, step t of walk w from seed s at node u picks neighbor
    spark_xxhash64('s|w|t|u') mod outdeg(u) — all-integer, so the
    replay is bit-exact with zero rounding contract. Seeds are the
    hash-spread ``n_seeds`` smallest (spark_xxhash64(id), id)."""
    edges = load_csv1_edges()
    adj: dict[str, set] = {}
    for s_, d in edges:
        if s_ != d:
            adj.setdefault(s_, set()).add(d)
    adj_sorted = {k: sorted(v) for k, v in adj.items()}
    nodes = sorted({x for e in edges for x in e})
    seeds = sorted(nodes, key=lambda v: (spark_xxhash64(v), v))[:n_seeds]
    rows = []
    for s_ in seeds:
        for wlk in range(walks_per_node):
            cur = s_
            path = [s_]
            for t in range(1, walk_length + 1):
                nbrs = adj_sorted.get(cur)
                if not nbrs:
                    break
                pick = spark_xxhash64(f"{s_}|{wlk}|{t}|{cur}") % len(nbrs)
                cur = nbrs[pick]
                path.append(cur)
            rows += [(s_, wlk, i, n) for i, n in enumerate(path)]
    return values_sql(
        [("seed", "VARCHAR"), ("walk_id", "BIGINT"), ("step", "BIGINT"), ("NodeId", "VARCHAR")],
        sorted(rows),
    )



# --- graph_harmonic --------------------------------------------------------

def load_csv1_weighted_edges() -> list[tuple[str, str, float]]:
    """CSV1 (src, dst, cost) multigraph rows with ETL semantics (same
    contract as load_csv1_edges, keeping LENGTH as the float cost)."""
    import csv

    with open("/root/reference/Shenzhen_Edgelist_1.csv", newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("START_NODE")]
    nodes = {r["START_NODE"] for r in rows}
    quads = list(
        dict.fromkeys(
            (r["START_NODE"], r["END_NODE"], r["EDGE"], r["LENGTH"])
            for r in rows
            if r["END_NODE"] in nodes
        )
    )
    return [(s, d, float(l)) for s, d, _e, l in quads]


def harmonic_golden(n_sources=16):
    """Replay of paths.harmonic_centrality: hash-spread source sample
    (smallest (xxhash64(id), id) — node ids are STRINGS, hashed as
    such), exact heap Dijkstra per source, H(s) = sum of 1/d over
    reachable targets, rounded to 6 dp (the float-sum-order
    determinism contract)."""
    import heapq

    edges = load_csv1_weighted_edges()
    nodes = sorted({x for s, d, _c in edges for x in (s, d)})
    adj: dict[str, list[tuple[str, float]]] = {}
    for s, d, c in edges:
        adj.setdefault(s, []).append((d, c))
    srcs = sorted(nodes, key=lambda v: (spark_xxhash64(v), v))[:n_sources]

    rows = []
    for s in sorted(srcs):
        dist: dict[str, float] = {s: 0.0}
        pq = [(0.0, s)]
        done = set()
        while pq:
            du, u = heapq.heappop(pq)
            if u in done:
                continue
            done.add(u)
            for v, w in adj.get(u, ()):
                nd = du + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        h = sum(1.0 / d for d in dist.values() if d > 0.0)
        n = sum(1 for d in dist.values() if d > 0.0)
        rows.append((s, r6(h), n))
    return values_sql(
        [("NodeId", "VARCHAR"), ("harmonic", "DOUBLE"), ("n_reachable", "BIGINT")],
        rows,
    )




# --- graph_closeness -------------------------------------------------------

def closeness_golden(n_sources=16):
    """Replay of paths.closeness_centrality (wf_correction=False):
    same hash-spread source sample and exact heap Dijkstra as
    harmonic_golden; C(s) = n_reachable / sum of distances (0.0 when
    nothing is reachable), rounded to 6 dp (same float-sum-order
    determinism contract as harmonic)."""
    import heapq

    edges = load_csv1_weighted_edges()
    nodes = sorted({x for s, d, _c in edges for x in (s, d)})
    adj: dict[str, list[tuple[str, float]]] = {}
    for s, d, c in edges:
        adj.setdefault(s, []).append((d, c))
    srcs = sorted(nodes, key=lambda v: (spark_xxhash64(v), v))[:n_sources]

    rows = []
    for s in sorted(srcs):
        dist: dict[str, float] = {s: 0.0}
        pq = [(0.0, s)]
        done = set()
        while pq:
            du, u = heapq.heappop(pq)
            if u in done:
                continue
            done.add(u)
            for v, w in adj.get(u, ()):
                nd = du + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        tot = sum(d for d in dist.values() if d > 0.0)
        r = sum(1 for d in dist.values() if d > 0.0)
        c = (r / tot) if tot > 0.0 else 0.0
        rows.append((s, r6(c), r))
    return values_sql(
        [("NodeId", "VARCHAR"), ("closeness", "DOUBLE"), ("n_reachable", "BIGINT")],
        rows,
    )



# --- graph_bridges / graph_articulation ------------------------------------

def _csv1_undirected_simple():
    """Undirected simple graph from CSV1 with PHYSICAL edge
    multiplicity: (adj dict, set of pairs joined by >= 2 distinct EDGE
    ids). A two-way road (both directed rows share one EDGE id) is one
    physical edge."""
    import csv

    with open("/root/reference/Shenzhen_Edgelist_1.csv", newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("START_NODE")]
    nodes = {r["START_NODE"] for r in rows}
    quads = list(
        dict.fromkeys(
            (r["START_NODE"], r["END_NODE"], r["EDGE"], r["LENGTH"])
            for r in rows
            if r["END_NODE"] in nodes
        )
    )
    eids: dict[tuple[str, str], set] = {}
    for s_, d, e, _l in quads:
        if s_ == d:
            continue
        a, b = (s_, d) if s_ < d else (d, s_)
        eids.setdefault((a, b), set()).add(e)
    adj: dict[str, set] = {}
    for a, b in eids:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    parallel = {k for k, v in eids.items() if len(v) > 1}
    return adj, parallel


def _bfs_reaches(adj, start, goal, banned_edge=None, banned_node=None):
    from collections import deque

    seen = {start}
    dq = deque([start])
    while dq:
        x = dq.popleft()
        if x == goal:
            return True
        for y in adj.get(x, ()):
            if y in seen or y == banned_node:
                continue
            if banned_edge and {x, y} == banned_edge:
                continue
            seen.add(y)
            dq.append(y)
    return goal in seen


def bridges_golden():
    """BRUTE-FORCE bridge oracle — deliberately no low-link logic: an
    edge {u,v} with physical multiplicity 1 is a bridge iff deleting
    it leaves v unreachable from u."""
    adj, parallel = _csv1_undirected_simple()
    rows = []
    for a in sorted(adj):
        for b in sorted(adj[a]):
            if a >= b or (a, b) in parallel:
                continue
            if not _bfs_reaches(adj, a, b, banned_edge={a, b}):
                rows.append((a, b))
    return values_sql([("src", "VARCHAR"), ("dst", "VARCHAR")], sorted(rows))


def articulation_golden():
    """BRUTE-FORCE articulation oracle: node u is an articulation
    point iff deleting it leaves some neighbor unreachable from
    another neighbor."""
    adj, _parallel = _csv1_undirected_simple()
    rows = []
    for u in sorted(adj):
        nbrs = sorted(adj[u])
        if len(nbrs) < 2:
            continue
        first = nbrs[0]
        if any(
            not _bfs_reaches(adj, first, x, banned_node=u) for x in nbrs[1:]
        ):
            rows.append((u,))
    return values_sql([("NodeId", "VARCHAR")], rows)



# --- graph_label_propagation -----------------------------------------------

def lpa_golden(iters=10):
    """Replay of graph.etl.label_propagation: synchronous rounds,
    neighbor-label votes over the undirected multigraph (parallel
    edges each vote; both directions), most-frequent label wins with
    ties to the lexicographically smallest label; isolated semantics
    N/A (every node in the edge table has a neighbor). All integer —
    exact replay, no rounding contract needed. Pins the
    (community, n_nodes) histogram."""
    edges = load_csv1_edges()
    und: dict[str, list[str]] = {}
    for s, d in edges:
        und.setdefault(s, []).append(d)
        und.setdefault(d, []).append(s)
    labels = {v: v for v in und}
    for _ in range(iters):
        new = {}
        for v, nbrs in und.items():
            counts: dict[str, int] = {}
            for u in nbrs:
                lu = labels[u]
                counts[lu] = counts.get(lu, 0) + 1
            best = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[0][0]
            new[v] = best
        labels = new
    hist: dict[str, int] = {}
    for lab in labels.values():
        hist[lab] = hist.get(lab, 0) + 1
    rows = sorted(hist.items())
    return values_sql([("community", "VARCHAR"), ("n_nodes", "BIGINT")], rows)




# --- graph_betweenness -----------------------------------------------------

def betweenness_golden(n_sources=16, k=50):
    """Replay of paths.betweenness_centrality: same hash-spread source
    sample, Brandes dependency accumulation with the SAME explicit
    (-dist, NodeId) processing order (per-source deltas bit-identical
    to the kernel), cross-source sum rounded to 6 dp, top-k by
    (betweenness DESC, NodeId)."""
    import heapq

    edges = load_csv1_weighted_edges()
    nodes = sorted({x for s, d, _c in edges for x in (s, d)})
    adj: dict[str, list[tuple[str, float]]] = {}
    for s, d, c in edges:
        adj.setdefault(s, []).append((d, c))
    srcs = sorted(nodes, key=lambda v: (spark_xxhash64(v), v))[:n_sources]

    bc: dict[str, float] = {}
    for s in srcs:
        dist: dict[str, float] = {s: 0.0}
        sigma: dict[str, int] = {s: 1}
        preds: dict[str, list[str]] = {}
        done = set()
        pq = [(0.0, s)]
        while pq:
            du, u = heapq.heappop(pq)
            if u in done:
                continue
            done.add(u)
            for v, w in adj.get(u, ()):
                if v in done:
                    continue
                nd = dist[u] + w
                cur = dist.get(v)
                if cur is None or nd < cur:
                    dist[v] = nd
                    sigma[v] = sigma[u]
                    preds[v] = [u]
                    heapq.heappush(pq, (nd, v))
                elif nd == cur:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        order = sorted(
            (v for v in dist if v != s), key=lambda v: (-dist[v], v)
        )
        delta: dict[str, float] = {}
        for v in order:
            coef = (1.0 + delta.get(v, 0.0)) / sigma[v]
            for u in preds.get(v, ()):
                delta[u] = delta.get(u, 0.0) + sigma[u] * coef
        for v, dv in delta.items():
            if v != s and dv > 0.0:
                bc[v] = bc.get(v, 0.0) + dv
    ranked = sorted(((r6(x), v) for v, x in bc.items()), key=lambda t: (-t[0], t[1]))
    rows = [(v, x) for x, v in ranked[:k]]
    return values_sql([("NodeId", "VARCHAR"), ("betweenness", "DOUBLE")], rows)




# --- graph_scc --------------------------------------------------------------

def scc_golden():
    """Replay of etl.strongly_connected_components: KOSARAJU's
    two-pass algorithm (deliberately a different algorithm from the
    engine kernel's Tarjan) over the CSV1 directed multigraph, every
    node labelled with the min string id of its SCC."""
    from collections import defaultdict

    edges = [(s, d) for s, d, _c in load_csv1_weighted_edges()]
    nodes = sorted({x for e in edges for x in e})
    adj = defaultdict(list)
    radj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        radj[d].append(s)

    visited: set[str] = set()
    order: list[str] = []
    for v0 in nodes:
        if v0 in visited:
            continue
        visited.add(v0)
        stack = [(v0, iter(adj[v0]))]
        while stack:
            u, it = stack[-1]
            advanced = False
            for w in it:
                if w not in visited:
                    visited.add(w)
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(u)
                stack.pop()

    assigned: dict[str, str] = {}
    for v0 in reversed(order):
        if v0 in assigned:
            continue
        members = []
        stack2 = [v0]
        assigned[v0] = ""
        while stack2:
            u = stack2.pop()
            members.append(u)
            for w in radj[u]:
                if w not in assigned:
                    assigned[w] = ""
                    stack2.append(w)
        m = min(members)
        for u in members:
            assigned[u] = m
    rows = sorted(assigned.items())
    return values_sql([("NodeId", "VARCHAR"), ("scc_id", "VARCHAR")], rows)


# --- graph_kcore ------------------------------------------------------------

def kcore_golden():
    """Replay of etl.core_decomposition: iterative minimum-degree
    peeling with a work queue (deliberately different from the engine
    kernel's Batagelj–Zaveršnik bucket structure) on the undirected
    simple graph underlying CSV1 (direction/parallel collapsed,
    self-loops dropped)."""
    from collections import defaultdict

    und = {
        (min(s, d), max(s, d))
        for s, d, _c in load_csv1_weighted_edges()
        if s != d
    }
    nodes = sorted({x for s, d, _c in load_csv1_weighted_edges() for x in (s, d)})
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    left = set(nodes)
    deg = {v: len(adj[v]) for v in nodes}
    core: dict[str, int] = {}
    k = 0
    while left:
        k = max(k, min(deg[v] for v in left))
        queue = [v for v in left if deg[v] <= k]
        while queue:
            v = queue.pop()
            if v not in left:
                continue
            core[v] = k
            left.remove(v)
            for w in adj[v]:
                if w in left:
                    deg[w] -= 1
                    if deg[w] <= k:
                        queue.append(w)
    rows = sorted(core.items())
    return values_sql([("NodeId", "VARCHAR"), ("core", "BIGINT")], rows)



# --- ann_pq_topk ------------------------------------------------------------

def pq_golden(vecs, k=5, m=8, n_codes=16, sample_size=4096, train_iters=5, max_query_id=8):
    """Replay of similarity.pq_topk (Jégou et al. 2011 PQ-ADC):
    hash-spread training sample, per-subspace L2 k-means with the
    first-n_codes-by-(hash,id)-resorted-by-id seeds, argmin-L2
    assignment with ties to the lowest code id, mean updates rounded
    to 6 dp per iteration; corpus encoded to m codes; queries ranked
    by the summed table lookups (squared L2 ADC, 6-dp rounded,
    ascending, ties to lowest neighbor id, self excluded)."""
    byid = dict(vecs)
    hash_order = sorted(byid, key=lambda vid: (spark_xxhash64(vid), vid))[:sample_size]
    seed_ids = sorted(hash_order[:n_codes])
    sample_ids = sorted(hash_order)
    dim = len(vecs[0][1])
    assert dim % m == 0
    d = dim // m

    books = []
    for j in range(m):
        C = [list(byid[vid][j * d : (j + 1) * d]) for vid in seed_ids]
        Xj = [list(byid[vid][j * d : (j + 1) * d]) for vid in sample_ids]
        for _ in range(train_iters):
            sums = [[0.0] * d for _ in C]
            counts = [0] * len(C)
            for x in Xj:
                dists = [sum((xi - ci) ** 2 for xi, ci in zip(x, c)) for c in C]
                a = dists.index(min(dists))
                counts[a] += 1
                for i_, xi in enumerate(x):
                    sums[a][i_] += xi
            for ci in range(len(C)):
                if counts[ci]:
                    C[ci] = [round(sums[ci][i_] / counts[ci], 6) for i_ in range(d)]
        books.append(C)

    _B = [_npm(book) for book in books]
    corpus_codes = dict(
        zip([vid for vid, _v in vecs], _np_codes(_npm([v for _vid, v in vecs]), _B))
    )
    rows = []
    for qid in sorted(vid for vid in byid if vid < max_query_id):
        qv = byid[qid]
        tables = _np_tables_row(_npm([qv])[0], _B)
        scored = []
        for vid, codes in corpus_codes.items():
            if vid == qid:
                continue
            adc = 0.0
            for j in range(m):
                adc = adc + tables[j][codes[j]]
            scored.append((r6(adc), vid))
        scored.sort()
        for rank, (adc, vid) in enumerate(scored[:k], 1):
            rows.append((qid, vid, adc, rank))
    return values_sql(
        [("query_id", "BIGINT"), ("neighbor_id", "BIGINT"), ("adc", "DOUBLE"), ("rank", "BIGINT")],
        rows,
    )




# --- ann_ivf_pq_topk --------------------------------------------------------

def ivf_pq_golden(
    vecs,
    k=5,
    n_cells=16,
    n_probe=4,
    m=8,
    n_codes=16,
    sample_size=4096,
    train_iters=5,
    max_query_id=8,
    lloyd_iters=2,
    refine_k=None,
    shortlist=20,
):
    """Replay of similarity.ivf_pq_topk (FAISS IVFADC, Jégou et al.
    2011 §IV): IVF centroids under the ivf_golden contract
    (hash-spread seeds + 6-dp-rounded Lloyd), every vector assigned to
    its max-(cosine, cid) cell, PQ codebooks trained on CELL RESIDUALS
    (v − centroid[cell]) with the pq_golden contract (hash-spread
    sample, first-n_codes-by-hash-resorted-by-id seeds, argmin-L2 with
    ties to the lowest code, 6-dp-rounded means), corpus encoded from
    residuals, each query ADC-scanning only its n_probe top cells with
    PER-CELL tables built from the query's residual against that
    cell's centroid (ascending adc, 6-dp, ties to lowest neighbor id,
    self excluded)."""
    byid = dict(vecs)
    # --- IVF centroids: identical replay to ivf_golden -----------------
    chosen = sorted(byid, key=lambda vid: (spark_xxhash64(vid), vid))[:n_cells]
    centroids = [(cid, byid[vid]) for cid, vid in enumerate(sorted(chosen))]

    def cell_scores(v):
        return [(_cos(v, cvec), cid) for cid, cvec in centroids]

    dim = len(vecs[0][1]) if vecs else 0
    for _ in range(lloyd_iters):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for _vid, v in vecs:
            cell = max(cell_scores(v))[1]
            acc = sums.setdefault(cell, [0.0] * dim)
            for i, x in enumerate(v):
                acc[i] = acc[i] + x
            counts[cell] = counts.get(cell, 0) + 1
        centroids = [
            (
                cid,
                [round(sums[cid][i] / counts[cid], 6) for i in range(dim)]
                if cid in counts
                else cvec,
            )
            for cid, cvec in centroids
        ]
    cent = dict(centroids)

    def resid(v):
        cell = max(cell_scores(v))[1]
        cvec = cent[cell]
        return cell, [x - y for x, y in zip(v, cvec)]

    # --- PQ codebooks on residuals: identical replay to pq_golden ------
    hash_order = sorted(byid, key=lambda vid: (spark_xxhash64(vid), vid))[:sample_size]
    seed_ids = sorted(hash_order[:n_codes])
    sample_ids = sorted(hash_order)
    assert dim % m == 0
    d = dim // m
    # Codebook TRAINING residuals keep the driver-side fold
    # assignment (the engine trains from the collected sample with
    # _py_cos); SCAN-side cells/codes below use the numpy kernels.
    resid_of = {vid: resid(v)[1] for vid, v in vecs}
    _C = _npm([cvec for _cid, cvec in centroids])
    _ids = [vid for vid, _v in vecs]
    _V = _npm([v for _vid, v in vecs])
    cell_of = dict(zip(_ids, _np_cells(_V, _C)))
    books = []
    for j in range(m):
        C = [list(resid_of[vid][j * d : (j + 1) * d]) for vid in seed_ids]
        Xj = [list(resid_of[vid][j * d : (j + 1) * d]) for vid in sample_ids]
        for _ in range(train_iters):
            sums_ = [[0.0] * d for _ in C]
            counts_ = [0] * len(C)
            for x in Xj:
                dists = [sum((xi - ci) ** 2 for xi, ci in zip(x, c)) for c in C]
                a = dists.index(min(dists))
                counts_[a] += 1
                for i_, xi in enumerate(x):
                    sums_[a][i_] += xi
            for ci in range(len(C)):
                if counts_[ci]:
                    C[ci] = [round(sums_[ci][i_] / counts_[ci], 6) for i_ in range(d)]
        books.append(C)

    _B = [_npm(book) for book in books]
    # scan-side encode: residual against the NUMPY-assigned cell
    import numpy as _np_

    _cells_arr = _np_.asarray([cell_of[vid] for vid in _ids])
    corpus_codes = dict(zip(_ids, _np_codes(_V - _C[_cells_arr], _B)))
    cells: dict[int, list[int]] = {}
    for vid, cell in cell_of.items():
        cells.setdefault(cell, []).append(vid)

    rows = []
    for qid in sorted(vid for vid in byid if vid < max_query_id):
        qv = byid[qid]
        qvm = _npm([qv])
        probed = _np_probe_ids(qvm, _C, n_probe)[0]
        scored = []
        for cid in probed:
            tables = _np_tables_row((qvm - _C[cid : cid + 1])[0], _B)
            for nid in cells.get(cid, ()):
                if nid == qid:
                    continue
                codes = corpus_codes[nid]
                adc = 0.0
                for j in range(m):
                    adc = adc + tables[j][codes[j]]
                scored.append((r6(adc), nid))
        scored.sort()
        if refine_k is None:
            for rank, (adc, nid) in enumerate(scored[:k], 1):
                rows.append((qid, nid, adc, rank))
        else:
            # Refine tail (similarity.ivf_pq_refine_topk): exact
            # squared-L2 re-rank of the ADC shortlist, ties → lowest
            # neighbor id, 6-dp rounded on the ranked value.
            exact = sorted(
                (
                    r6(sum((a - b) ** 2 for a, b in zip(qv, byid[nid]))),
                    nid,
                )
                for _adc, nid in scored[:shortlist]
            )
            for rank, (dist, nid) in enumerate(exact[:refine_k], 1):
                rows.append((qid, nid, dist, rank))
    if refine_k is not None:
        return values_sql(
            [
                ("query_id", "BIGINT"),
                ("neighbor_id", "BIGINT"),
                ("dist", "DOUBLE"),
                ("rank", "BIGINT"),
            ],
            rows,
        )
    return values_sql(
        [("query_id", "BIGINT"), ("neighbor_id", "BIGINT"), ("adc", "DOUBLE"), ("rank", "BIGINT")],
        rows,
    )


# --- semantic_dedup ---------------------------------------------------------

def semdedup_golden(vecs, threshold=0.95, n_cells=16, lloyd_iters=2):
    """Replay of similarity.semantic_dedup (SemDeDup, Abbas et al.
    2023): the IVF centroid contract (hash-spread seeds + 6-dp-rounded
    Lloyd steps, exactly as in ivf_golden), max-(cosine, cid) cell
    assignment, within-cell exact-cosine pairs above ``threshold``,
    union-find transitive closure with min-id labels."""
    byid = dict(vecs)
    chosen = sorted(byid, key=lambda vid: (spark_xxhash64(vid), vid))[:n_cells]
    centroids = [(cid, byid[vid]) for cid, vid in enumerate(sorted(chosen))]

    def cell_scores(v):
        return [(_cos(v, cvec), cid) for cid, cvec in centroids]

    dim = len(vecs[0][1]) if vecs else 0
    for _ in range(lloyd_iters):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for _vid, v in vecs:
            cell = max(cell_scores(v))[1]
            acc = sums.setdefault(cell, [0.0] * dim)
            for i, x in enumerate(v):
                acc[i] = acc[i] + x
            counts[cell] = counts.get(cell, 0) + 1
        centroids = [
            (
                cid,
                [round(sums[cid][i] / counts[cid], 6) for i in range(dim)]
                if cid in counts
                else cvec,
            )
            for cid, cvec in centroids
        ]

    cell_of = dict(
        zip(
            [vid for vid, _v in vecs],
            _np_cells(_npm([v for _vid, v in vecs]), _npm([cv for _cid, cv in centroids])),
        )
    )
    cells: dict[int, list[int]] = {}
    for vid, cell in cell_of.items():
        cells.setdefault(cell, []).append(vid)

    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    # r9: numpy pair sweep mirroring the engine's per-cell
    # applyInPandas kernel — same row-local reductions, same -inf
    # zero-norm exclusion, same sorted-id upper triangle.
    import numpy as _np_

    for cell, members in cells.items():
        ms = sorted(members)
        if len(ms) < 2:
            continue
        Vc = _npm([byid[m] for m in ms])
        vn = _np_.sqrt((Vc * Vc).sum(axis=1))
        for i in range(len(ms) - 1):
            dots = (Vc[i + 1 :] * Vc[i]).sum(axis=1)
            denom = vn[i + 1 :] * vn[i]
            with _np_.errstate(divide="ignore", invalid="ignore"):
                sims = _np_.where(denom > 0.0, dots / denom, -_np_.inf)
            for off in _np_.nonzero(sims >= threshold)[0]:
                ra, rb = find(ms[i]), find(ms[i + 1 + int(off)])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    groups: dict[int, list[int]] = {}
    for vid in byid:
        groups.setdefault(find(vid), []).append(vid)
    rows = []
    for root, members in groups.items():
        label = min(members)
        for vid in members:
            rows.append((vid, cell_of[vid], label, vid == label))
    rows.sort()
    return values_sql(
        [("vec_id", "BIGINT"), ("cell", "INTEGER"), ("duplicate_of", "BIGINT"), ("is_kept", "BOOLEAN")],
        rows,
    )




# --- graph_msf (round 7) ----------------------------------------------------

def msf_golden():
    """Replay of etl.minimum_spanning_forest by KRUSKAL's algorithm —
    deliberately a different algorithm from the engine's Borůvka
    tiers. Parallel edges and direction collapse to one undirected
    pair with the MIN cost; edges sorted under the strict total order
    (cost, a, b); union-find acceptance. Distinct total-order keys
    make the forest unique, so Kruskal here and Borůvka there must
    agree edge-for-edge (the classic distinct-weights argument)."""
    best: dict[tuple[str, str], float] = {}
    for s, d, c in load_csv1_weighted_edges():
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        if (a, b) not in best or c < best[(a, b)]:
            best[(a, b)] = c
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    rows = []
    for c, a, b in sorted((c, a, b) for (a, b), c in best.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            rows.append((a, b, c))
    rows.sort()
    return values_sql(
        [("src", "VARCHAR"), ("dst", "VARCHAR"), ("cost", "DOUBLE")], rows
    )


# --- graph_louvain (round 7) ------------------------------------------------

def louvain_golden(max_sweeps=100, max_levels=32):
    """Replay of etl.louvain's pinned deterministic contract (Blondel
    et al. 2008 with the python-louvain conventions): unit-weight
    undirected simple graph, ascending-label sweep order, ΔQ =
    k_in/m − Σtot·k_v/(2m²) with ties to the smallest community
    label, coarsen with min-member relabelling, repeat until a level
    moves nothing. Independent bookkeeping (edge-list accumulators
    rather than the kernel's dict-of-dicts CSR walk)."""
    pairs = sorted(
        {
            (min(s, d), max(s, d))
            for s, d, _c in load_csv1_weighted_edges()
            if s != d
        }
    )
    # current-level graph: edge list with weights + per-node loops
    edges: dict[tuple[str, str], float] = {p: 1.0 for p in pairs}
    loops: dict[str, float] = {}
    nodes = sorted({x for p in pairs for x in p})
    membership = {v: v for v in nodes}

    for _level in range(max_levels):
        level_nodes = sorted(
            set(loops) | {x for p in edges for x in p}
        )
        m = sum(edges.values()) + sum(loops.values())
        if m == 0.0:
            break
        nbr: dict[str, list[tuple[str, float]]] = {v: [] for v in level_nodes}
        for (a, b), w in edges.items():
            nbr[a].append((b, w))
            nbr[b].append((a, w))
        k = {
            v: sum(w for _u, w in nbr[v]) + 2.0 * loops.get(v, 0.0)
            for v in level_nodes
        }
        comm = {v: v for v in level_nodes}
        tot = dict(k)
        moved_any = False
        for _sweep in range(max_sweeps):
            moved = False
            for v in level_nodes:
                cur = comm[v]
                w_to: dict[str, float] = {}
                for u, w in nbr[v]:
                    w_to[comm[u]] = w_to.get(comm[u], 0.0) + w
                tot[cur] -= k[v]
                best_c, best_g = cur, None
                for c in sorted(set(w_to) | {cur}):
                    g = w_to.get(c, 0.0) / m - tot.get(c, 0.0) * k[v] / (2.0 * m * m)
                    if best_g is None or g > best_g:
                        best_c, best_g = c, g
                tot[best_c] = tot.get(best_c, 0.0) + k[v]
                if best_c != cur:
                    comm[v] = best_c
                    moved = True
            if not moved:
                break
            moved_any = True
        else:
            raise RuntimeError("louvain_golden: local moving did not converge")
        if not moved_any:
            break
        members: dict[str, list[str]] = {}
        for v, c in comm.items():
            members.setdefault(c, []).append(v)
        relabel = {c: min(ms) for c, ms in members.items()}
        comm = {v: relabel[c] for v, c in comm.items()}
        membership = {orig: comm[cc] for orig, cc in membership.items()}
        nedges: dict[tuple[str, str], float] = {}
        nloops: dict[str, float] = {v: 0.0 for v in set(comm.values())}
        for v, lw in loops.items():
            nloops[comm[v]] += lw
        for (a, b), w in edges.items():
            ca, cb = comm[a], comm[b]
            if ca == cb:
                nloops[ca] += w
            else:
                key = (min(ca, cb), max(ca, cb))
                nedges[key] = nedges.get(key, 0.0) + w
        if len(nloops) == len(level_nodes):
            break
        edges, loops = nedges, nloops
    rows = sorted(membership.items())
    return values_sql([("NodeId", "VARCHAR"), ("community", "VARCHAR")], rows)


# --- graph_modularity (round 7) ---------------------------------------------

def modularity_golden(iters=10):
    """Replay of etl.modularity over etl.label_propagation's CSV1
    communities: LPA label replay (identical to lpa_golden's integer
    contract), then Q = Σ_c (m_c/m − (d_c/2m)²) on the undirected
    simple graph — one (n_communities, modularity) row."""
    edges = load_csv1_edges()
    und: dict[str, list[str]] = {}
    for s, d in edges:
        und.setdefault(s, []).append(d)
        und.setdefault(d, []).append(s)
    labels = {v: v for v in und}
    for _ in range(iters):
        new = {}
        for v, nbrs in und.items():
            counts: dict[str, int] = {}
            for u in nbrs:
                lu = labels[u]
                counts[lu] = counts.get(lu, 0) + 1
            new[v] = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[0][0]
        labels = new
    simple = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    m = len(simple)
    internal: dict[str, int] = {}
    degsum: dict[str, int] = {}
    # sorted(): set iteration is PYTHONHASHSEED-dependent, which made
    # the float summation order (and the last ~1e-16 of Q) wobble
    # between generator runs — harmless at the 6-dp compare, but it
    # polluted every regeneration diff.
    for a, b in sorted(simple):
        la, lb = labels[a], labels[b]
        degsum[la] = degsum.get(la, 0) + 1
        degsum[lb] = degsum.get(lb, 0) + 1
        if la == lb:
            internal[la] = internal.get(la, 0) + 1
    q = sum(
        internal.get(c, 0) / m - (dc / (2.0 * m)) ** 2 for c, dc in degsum.items()
    )
    rows = [(len(degsum), q)]
    return values_sql([("n_communities", "BIGINT"), ("modularity", "DOUBLE")], rows)


# --- embedding_kmeans (round 7) ---------------------------------------------

def kmeans_golden(vecs, k=16, lloyd_iters=4):
    """Replay of similarity.kmeans_cluster: the shared deterministic
    centroid contract (hash-spread seeds, 6-dp-rounded Lloyd means —
    exactly ivf_golden's replay), one final max-(cosine, cid)
    assignment, score = 6-dp cosine to the winning centroid."""
    byid = dict(vecs)
    chosen = sorted(byid, key=lambda vid: (spark_xxhash64(vid), vid))[:k]
    centroids = [(cid, byid[vid]) for cid, vid in enumerate(sorted(chosen))]
    dim = len(vecs[0][1]) if vecs else 0

    def cell_scores(v):
        return [(_cos(v, cvec), cid) for cid, cvec in centroids]

    for _ in range(lloyd_iters):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for _vid, v in vecs:
            cell = max(cell_scores(v))[1]
            acc = sums.setdefault(cell, [0.0] * dim)
            for i, x in enumerate(v):
                acc[i] = acc[i] + x
            counts[cell] = counts.get(cell, 0) + 1
        centroids = [
            (
                cid,
                [round(sums[cid][i] / counts[cid], 6) for i in range(dim)]
                if cid in counts
                else cvec,
            )
            for cid, cvec in centroids
        ]
    import numpy as _np_

    _C = _npm([cv for _cid, cv in centroids])
    rows = []
    for vid, v in sorted(vecs):
        sims = _np_sims(_npm([v]), _C)[0]
        cid = int(len(sims) - 1 - sims[::-1].argmax())
        s = sims[cid]
        rows.append((vid, cid, None if not _np_.isfinite(s) else round(float(s), 6)))
    return values_sql(
        [("id", "BIGINT"), ("cluster", "INTEGER"), ("score", "DOUBLE")], rows
    )




# --- bpe_tokenize (round 7) -------------------------------------------------

def bpe_golden(docs, num_merges=100, max_words=20000, sample_tokens=12, fertility_groups=None):
    """Replay of text.bpe_train + bpe_encode (Sennrich et al. 2016):
    whitespace split on the explicit ASCII class, top-max_words
    histogram by (count DESC, word), merge loop with ties to the
    lexicographically smallest pair (stop when the best pair count
    < 2), then GPT-2-style greedy lowest-rank encoding per word with
    the </w> marker. Independent bookkeeping (pair-count dict over a
    symbol-tuple histogram keyed by word)."""
    import re

    ws = re.compile(r"[ \t\r\n\f\x0b]+")
    hist: dict[str, int] = {}
    for _did, text in docs:
        for w in ws.split(text or ""):
            if w:
                hist[w] = hist.get(w, 0) + 1
    top = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    symtab: dict[tuple[str, ...], int] = {
        tuple(list(w) + ["</w>"]): n for w, n in top
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, n in symtab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + n
        if not pc:
            break
        bn = max(pc.values())
        if bn < 2:
            break
        bp = min(p for p, n in pc.items() if n == bn)
        nsym: dict[tuple[str, ...], int] = {}
        for syms, n in symtab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == bp:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nsym[tuple(out)] = nsym.get(tuple(out), 0) + n
        symtab = nsym
        merges.append(bp)
    ranks = {p: i for i, p in enumerate(merges)}

    def encode(word: str) -> list[str]:
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            br, bi = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (br is None or r < br):
                    br, bi = r, i
            if br is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        return syms

    memo: dict[str, list[str]] = {}
    rows = []
    perdoc = []
    for did, text in sorted(docs):
        n = 0
        nw = 0
        toks: list[str] = []
        for w in ws.split(text or ""):
            if not w:
                continue
            nw += 1
            enc = memo.get(w)
            if enc is None:
                enc = memo[w] = encode(w)
            n += len(enc)
            if len(toks) < sample_tokens:
                toks.extend(enc[: sample_tokens - len(toks)])
        rows.append((did, n, " ".join(toks)))
        perdoc.append((did, n, nw, len(text or "")))
    if fertility_groups is not None:
        agg: dict[str, list[int]] = {}
        for did, n, nw, nc in perdoc:
            a = agg.setdefault(fertility_groups[did], [0, 0, 0, 0])
            a[0] += 1
            a[1] += nw
            a[2] += n
            a[3] += nc
        grows = [
            (g, a[0], a[1], a[2], a[3], r6(a[2] / a[1]), r6(a[2] / a[3]))
            for g, a in sorted(agg.items())
        ]
        return values_sql(
            [
                ("source", "VARCHAR"),
                ("n_docs", "BIGINT"),
                ("n_words", "BIGINT"),
                ("n_bpe_tokens", "BIGINT"),
                ("n_chars", "BIGINT"),
                ("fertility", "DOUBLE"),
                ("tokens_per_char", "DOUBLE"),
            ],
            grows,
        )
    return values_sql(
        [("id", "BIGINT"), ("n_tokens", "BIGINT"), ("head", "VARCHAR")], rows
    )




# --- quality_classifier (round 7) -------------------------------------------

def classifier_golden(docs, langs, dim=256, iters=10, lr=0.5, train_sample=4096):
    """Replay of text.train_linear_classifier +
    linear_classifier_score (fastText-style hashed logistic
    regression, Joulin et al. 2016; label = lang == 'en'): L1-
    normalized hashed bag-of-words (idx = pmod(xxhash64(word), dim)),
    full-batch GD over the HASH-SPREAD TRAINING SAMPLE (r8: the
    train_sample ids with smallest (xxhash64(id), id) — sample ≡
    corpus at gate scale — iterated in ascending-id order) with every
    weight rounded to 6 dp per iteration (the determinism quantum),
    then the scan-side scoring fold over ALL docs in document word
    order (bit-identical summation), prob rounded 6 dp."""
    import math
    import re

    ws = re.compile(r"[ \t\r\n\f\x0b]+")
    feats = {}   # did -> {idx: val}
    order = {}   # did -> [idx per occurrence] (scoring order)
    for did, text in docs:
        toks = [w for w in ws.split(text or "") if w]
        idxs = [spark_xxhash64(w) % dim for w in toks]
        idxs = [i if i >= 0 else i + dim for i in idxs]
        order[did] = idxs
        f: dict[int, float] = {}
        for i in idxs:
            f[i] = f.get(i, 0.0) + 1.0
        n = len(idxs)
        feats[did] = {i: c / n for i, c in f.items()} if n else {}
    y = {did: 1.0 if langs[did] == "en" else 0.0 for did, _t in docs}
    train_ids = sorted(
        sorted((did for did, _t in docs), key=lambda d: (spark_xxhash64(d), d))[:train_sample]
    )
    n_docs = len(train_ids)
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        grad = [0.0] * dim
        bg = 0.0
        for did in train_ids:
            f = feats[did]
            m = sum(w[i] * v for i, v in f.items())
            p = 1.0 / (1.0 + math.exp(-(m + b)))
            e = p - y[did]
            for i, v in f.items():
                grad[i] += e * v
            bg += e
        w = [round(w[j] - lr * grad[j] / n_docs, 6) for j in range(dim)]
        b = round(b - lr * bg / n_docs, 6)
    rows = []
    for did, _t in sorted(docs):
        idxs = order[did]
        if idxs:
            acc = 0.0
            for i in idxs:
                acc = acc + w[i]
            m = acc / len(idxs)
        else:
            m = 0.0
        p = 1.0 / (1.0 + math.exp(-(m + b)))
        rows.append((did, round(p, 6), p >= 0.5))
    return values_sql(
        [("id", "BIGINT"), ("prob", "DOUBLE"), ("predicted", "BOOLEAN")], rows
    )




# --- embedding_pca (round 8) -------------------------------------------------

def pca_golden(vecs, n_components=4, train_sample=4096):
    """Replay of similarity.pca_train + pca_project: hash-spread
    sample (same (xxhash64(id), id) selection), mean/covariance
    accumulated with INDEPENDENT plain-Python loops (vs the engine's
    numpy matmul — the ~1e-13 accumulation-order wobble is absorbed by
    the 6-dp rounding of both matrices before eigendecomposition),
    numpy eigh on the rounded covariance (shared by necessity — LAPACK
    is not reimplementable here; determinism is eigh-on-identical-
    matrix), sign-fix + 6-dp loadings, then the scan-side projection
    fold replayed in array order with Spark HALF_UP rounding (r6)."""
    import numpy as np

    byid = dict(vecs)
    chosen = sorted(byid, key=lambda vid: (spark_xxhash64(vid), vid))[:train_sample]
    ids = sorted(chosen)
    dim = len(vecs[0][1])
    n = len(ids)
    sums = [0.0] * dim
    for vid in ids:
        for i, x in enumerate(byid[vid]):
            sums[i] += float(x)
    mu = np.round(np.array([s / n for s in sums]), 6)
    acc = [[0.0] * dim for _ in range(dim)]
    for vid in ids:
        d = [float(x) - mu[i] for i, x in enumerate(byid[vid])]
        for i in range(dim):
            di = d[i]
            row = acc[i]
            for j in range(dim):
                row[j] += di * d[j]
    C = np.round(np.array(acc) / (n - 1), 6)
    evals, evecs = np.linalg.eigh(C)
    comps = []
    for k in range(1, n_components + 1):
        w = evecs[:, -k]
        if w[int(np.argmax(np.abs(w)))] < 0:
            w = -w
        comps.append([round(float(x), 6) for x in w])
    mu_l = [float(x) for x in mu]
    rows = []
    for vid in sorted(byid):
        v = [float(x) for x in byid[vid]]
        pcs = []
        for w in comps:
            s = 0.0
            for x, m, c in zip(v, mu_l, w):
                s = s + (x - m) * c
            pcs.append(r6(s))
        rows.append((vid, *pcs))
    return values_sql(
        [("id", "BIGINT")] + [(f"pc{k}", "DOUBLE") for k in range(1, n_components + 1)],
        rows,
    )


# --- graph_hyperball (round 7) ----------------------------------------------

def hyperball_golden(t_max=8, m=64):
    """Replay of etl.hyperball's pinned HyperBall contract (Boldi &
    Vigna 2013) over CSV1: bucket = pmod(xxhash64(id), m), rank from
    xxhash64(id, INT 1) — Spark's lit(1) is an int32, hashed as such —
    negative → 1, zero → 65, else 65 − bit_length; t_max rounds of
    elementwise out-neighbor register max; per-node HLL estimate
    (alpha·m²/Σ2^(−M_j), linear counting below 2.5m) summed and
    rounded 6 dp per round. Independent bookkeeping: dict-of-lists
    registers, per-edge merge loop."""
    import math

    edges = [(s, d) for s, d, _c in load_csv1_weighted_edges()]
    nodes = sorted({x for e in edges for x in e})
    if m <= 16:
        alpha = 0.673
    elif m <= 32:
        alpha = 0.697
    elif m <= 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    regs: dict[str, list[int]] = {}
    for v in nodes:
        r = [0] * m
        bucket = spark_xxhash64(v) % m
        h2 = spark_xxhash64(v, ("int", 1))
        if h2 < 0:
            rho = 1
        elif h2 == 0:
            rho = 65
        else:
            rho = 65 - h2.bit_length()
        r[bucket] = min(rho, 255)
        regs[v] = r

    def nf() -> float:
        tot = 0.0
        for v in nodes:
            r = regs[v]
            s = sum(2.0 ** (-x) for x in r)
            raw = alpha * m * m / s
            z = sum(1 for x in r if x == 0)
            if raw <= 2.5 * m and z > 0:
                tot += m * math.log(m / z)
            else:
                tot += raw
        return round(tot, 6)

    simple = {(s, d) for s, d in edges if s != d}
    rows = [(0, nf())]
    for t in range(1, t_max + 1):
        new = {v: list(r) for v, r in regs.items()}
        for s, d in simple:
            nr = new[s]
            rr = regs[d]
            for j in range(m):
                if rr[j] > nr[j]:
                    nr[j] = rr[j]
        regs = new
        rows.append((t, nf()))
    return values_sql([("t", "INTEGER"), ("nf_est", "DOUBLE")], rows)




# --- graph_ktruss (round 7) -------------------------------------------------

def ktruss_golden():
    """Replay of etl.truss_decomposition by LEVEL-SYNCHRONOUS peeling
    (deliberately the superstep tier's formulation, not the kernel's
    incremental min-support heap): for ascending k, repeatedly drop
    every edge with in-subgraph support < k−2 until stable; dropped
    edges carry truss k−1. Peel order cannot affect the ladder, so
    all three agree."""
    und = {
        (min(s, d), max(s, d))
        for s, d, _c in load_csv1_weighted_edges()
        if s != d
    }
    alive = set(und)
    truss: dict[tuple[str, str], int] = {}
    k = 3
    while alive:
        while True:
            adj: dict[str, set[str]] = {}
            for a, b in alive:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = [
                (a, b) for a, b in alive if len(adj[a] & adj[b]) < k - 2
            ]
            if not drop:
                break
            for e in drop:
                truss[e] = k - 1
                alive.discard(e)
        k += 1
        if k > 1000:
            raise RuntimeError("ktruss_golden runaway")
    rows = sorted((a, b, t) for (a, b), t in truss.items())
    return values_sql(
        [("src", "VARCHAR"), ("dst", "VARCHAR"), ("truss", "INTEGER")], rows
    )




# --- bloom_dedup_probe ------------------------------------------------------

def bloom_golden(docs, seen_below=250, n_bits=1 << 14, n_hashes=5):
    """Replay of dedup.bloom_build + bloom_probe: positions are
    pmod(xxhash64(text, ('int', i)), n_bits) for i = 1..k via the
    ported hash — the bitmap (and therefore every false positive) is
    reproduced EXACTLY, so the probe booleans are deterministic
    engine-independent values. Seen set = doc_id < seen_below with
    non-null text; every doc probes (NULL text -> NULL)."""
    bits = set()
    for doc_id, text in docs:
        if doc_id < seen_below and text is not None:
            for i in range(1, n_hashes + 1):
                bits.add(pmod(spark_xxhash64(text, ("int", i)), n_bits))
    rows = []
    for doc_id, text in sorted(docs):
        if text is None:
            rows.append((doc_id, None))
            continue
        hit = all(
            pmod(spark_xxhash64(text, ("int", i)), n_bits) in bits
            for i in range(1, n_hashes + 1)
        )
        rows.append((doc_id, hit))
    return values_sql([("doc_id", "BIGINT"), ("maybe_seen", "BOOLEAN")], rows)




# --- cms_heavy_hitters ------------------------------------------------------

def cms_golden(docs, depth=4, width=1 << 12, topk=20):
    """Replay of text.count_min_cells + cms_estimate over the exact
    top-``topk`` tokens: ASCII whitespace tokenization (the family
    contract), cell (r, pmod(xxhash64(tok, ('int', r)), width))
    accumulation via the ported hash, estimate = min over depth rows.
    All-integer -> bit-exact, no rounding contract."""
    import re

    counts: dict = {}
    for _doc_id, text in docs:
        if text is None:
            continue
        for t in re.split(r"\s+", text.lower(), flags=re.ASCII):
            if t:
                counts[t] = counts.get(t, 0) + 1
    cells: dict = {}
    for t, c in counts.items():
        for r in range(1, depth + 1):
            key = (r, pmod(spark_xxhash64(t, ("int", r)), width))
            cells[key] = cells.get(key, 0) + c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    rows = [
        (
            t,
            c,
            min(
                cells[(r, pmod(spark_xxhash64(t, ("int", r)), width))]
                for r in range(1, depth + 1)
            ),
        )
        for t, c in top
    ]
    return values_sql(
        [("tok", "VARCHAR"), ("exact", "BIGINT"), ("est", "BIGINT")], rows
    )


if __name__ == "__main__":
    main()
