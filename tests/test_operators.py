"""Training-data pipeline operators: planted-duplicate oracles.

The driver's DuckDB gate covers the SQL-expressible operators; these
tests cover the rest with constructed inputs whose answers are known:
planted near-duplicates must be found, unrelated docs must not pair,
approximate search is measured against the exact baseline.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_foundation_spark.operators import dedup as D
from bigdata_foundation_spark.operators import multimodal as M
from bigdata_foundation_spark.operators import relational as R
from bigdata_foundation_spark.operators import similarity as S
from bigdata_foundation_spark.operators import text as TX

# 400 distinct words; the near-dup edit below changes exactly one, so
# SimHash vote margins move by ±2 on a std-20 distribution → expected
# Hamming ≈ 1–3 of 60 bits (the regime SimHash dedup is designed for).
BASE = " ".join(f"morning{j:03d}" if j == 123 else f"stone{j:03d}river" for j in range(400))


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # 40 docs with fully disjoint vocabularies (random hex words, so
    # even character shingles barely overlap)
    import hashlib

    def word(i, j):
        return hashlib.sha1(f"{i}/{j}".encode()).hexdigest()[:8]

    for i in range(40):
        rows.append((i, " ".join(word(i, j) for j in range(60)), "en", "src", 60))
    # planted near-dup cluster: 100/101 tiny edit; 102 exact copy of 100
    rows.append((100, BASE, "en", "src", len(BASE)))
    rows.append((101, BASE.replace("morning123", "evening123"), "en", "src", len(BASE)))
    rows.append((102, BASE, "en", "src", len(BASE)))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_exact_dedup_keeps_lowest_id(docs):
    kept = {r["doc_id"] for r in D.exact_dedup(docs).select("doc_id").collect()}
    assert 100 in kept and 102 not in kept  # 102 is an exact copy of 100
    assert 101 in kept  # near-dup but not exact
    assert len(kept) == 42


def test_minhash_lsh_finds_planted(docs):
    got = _pairs(D.minhash_lsh_pairs(docs, threshold=0.5))
    assert (100, 101) in got
    assert (100, 102) in got and (101, 102) in got
    # no false positives among the distinct docs
    assert all(a >= 100 for a, b in got)


def test_simhash_finds_planted(docs):
    got = _pairs(D.simhash_pairs(docs, max_hamming=5))
    assert (100, 102) in got  # identical text → distance 0
    assert (100, 101) in got  # one-word edit → few bit flips
    assert all(a >= 100 for a, b in got)


def test_ngram_jaccard_finds_planted(docs):
    got = _pairs(D.ngram_jaccard_pairs(docs, n=3, threshold=0.5, block_cols=["lang"]))
    assert (100, 102) in got and (100, 101) in got
    assert all(a >= 100 for a, b in got)


def test_simhash_table_deterministic(docs):
    a = {(r[0], r[1]) for r in D.simhash_table(docs).collect()}
    b = {(r[0], r[1]) for r in D.simhash_table(docs).collect()}
    assert a == b and len(a) == 43


def test_minhash_simhash_np_matches_jvm(spark):
    """r10 cross-oracle for the Arrow fingerprint kernels: the numpy
    ports of xxhash64 (``_nphash``) are INTEGER arithmetic, so unlike
    the float ANN kernels there are no near-ties — the fused
    mapInPandas MinHash/SimHash tables must agree with the retained
    JVM expression forms on EVERY bit, across the real corpus plus
    adversarial edge docs (empty / whitespace-only / shorter-than-k /
    unicode / null text)."""
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (9001, ""),
            (9002, "   \t \n "),
            (9003, "ab"),
            (9004, "HeLLo\tWORLD  mixed\ncase"),
            (9005, "café naïve 中文 test ωμέγα"),
            (9006, None),
            (9007, "a" * 300),
        ],
        "doc_id long, text string",
    )
    docs = real.unionByName(edge)

    # MinHash signatures: kernel vs expression form
    np_sig = {r[0]: tuple(r[1:]) for r in D.minhash_signature_table(docs).collect()}
    jvm_sig = {r[0]: tuple(r[1:]) for r in D._minhash_signature_table_jvm(docs).collect()}
    assert np_sig == jvm_sig
    assert 9006 not in np_sig and 9001 in np_sig  # null drops, empty stays

    # band keys: kernel _bands vs _banded_keys over the JVM signature
    tbl = D._minhash_doc_table(docs, "text", "doc_id", 64, 16, 5, with_shingles=True)
    np_bands = {
        (r["doc_id"], r["band"]): r["key"]
        for r in tbl.select(
            "doc_id", F.posexplode("_bands").alias("band", "key")
        ).collect()
    }
    jvm_sig_arr = D._minhash_signature_table_jvm(docs).select(
        "doc_id", F.array(*[f"_h{i}" for i in range(64)]).alias("_sig")
    )
    jvm_bands = {
        (r["doc_id"], r["band"]): r["key"]
        for r in D._banded_keys(jvm_sig_arr, "doc_id", 64, 16).collect()
    }
    assert np_bands == jvm_bands

    # shingle-hash sets: kernel _sh vs sorted collect_set over the explode
    np_sh = {r["doc_id"]: r["_sh"] for r in tbl.select("doc_id", "_sh").collect()}
    jvm_sh = {
        r["doc_id"]: r["_sh"]
        for r in D.shingle_hash_table(docs)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("_h")).alias("_sh"))
        .collect()
    }
    assert np_sh == jvm_sh

    # SimHash fingerprints: kernel vs expression form (incl zero-token drop)
    np_sim = {r[0]: r[1] for r in D.simhash_table(docs).collect()}
    jvm_sim = {r[0]: r[1] for r in D._simhash_table_jvm(docs).collect()}
    assert np_sim == jvm_sim
    assert 9001 not in np_sim and 9002 not in np_sim and 9004 in np_sim


@pytest.fixture(scope="module")
def vectors(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(120):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)], i % 5))
    # planted near-dup of vec 0: tiny perturbation
    base = rows[0][1]
    rows.append((500, [x + 0.01 * rng.gauss(0, 1) for x in base], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    return df.withColumn("embedding", F.transform("embedding", lambda x: x.cast("float")))


def test_brute_topk_exact(vectors):
    res = S.brute_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r["rank"] for r in res] == [1, 2, 3]
    assert res[0]["neighbor_id"] == 500  # the planted near-dup is rank 1
    assert res[0]["cosine"] > 0.99


def test_embedding_neardup(vectors):
    got = _pairs(S.embedding_neardup_pairs(vectors, threshold=0.95))
    assert got == {(0, 500)}


def test_embedding_neardup_lsh_subset_of_exact(vectors):
    """The banded default can only MISS pairs, never invent them: its
    output must be a subset of the exact all-pairs result, and the
    planted near-dup (cosine ≈ 0.9997) must survive banding."""
    exact = _pairs(S.embedding_neardup_pairs(vectors, threshold=0.9, method="exact"))
    lsh = _pairs(S.embedding_neardup_pairs(vectors, threshold=0.9, method="lsh"))
    assert lsh <= exact
    assert (0, 500) in lsh


def test_auto_lsh_params_and_drop_stats(vectors):
    """Band keys auto-size from the threshold: high thresholds earn
    wide keys (many buckets per band — the scale fix for the old fixed
    4-bit keys); recall stays >= the 0.9 target by construction. The
    drop-stats companion surfaces what the bucket cap removes."""
    import math

    for t, b in [(0.95, 8), (0.9, 8), (0.4, 8)]:
        n_planes, bands = S.auto_lsh_params(t, bands=b)
        r = n_planes // bands
        p = 1.0 - math.acos(t) / math.pi
        assert 1.0 - (1.0 - p**r) ** bands >= 0.9 - 1e-9  # recall target met
    assert S.auto_lsh_params(0.95)[0] // 8 >= 12  # wide keys at near-dup thresholds
    assert S.auto_lsh_params(0.4)[0] // 8 <= 4  # honest: low thresholds stay narrow

    # drop stats on the same (band, key) pieces the candidate pass uses
    planes = S.hyperplanes(64, 16, 42)
    pieces = vectors.select(
        F.col("vec_id").alias("_id"),
        F.explode(S.band_key_structs(S._as_double(F.col("embedding")), planes, 4)).alias("b"),
    ).select("_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    stats = D.bucket_drop_stats(pieces, ["band", "key"], max_bucket=10).first()
    assert stats["n_buckets"] > 0
    assert stats["n_dropped"] >= 1  # 121 vecs over 16 buckets/band must overflow cap 10
    assert stats["rows_dropped"] > 0
    none_dropped = D.bucket_drop_stats(pieces, ["band", "key"], max_bucket=10**6).first()
    assert none_dropped["n_dropped"] == 0 and none_dropped["rows_dropped"] == 0


def test_cluster_keep_best_left_join(spark):
    """Members missing from attrs survive with null score (ranked
    last); a fully-unscored cluster still gets a canonical row (min
    id)."""
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")], "node string, cluster_id string"
    )
    attrs = spark.createDataFrame([("a", 1.0), ("b", 5.0)], "doc_id string, score double")
    rows = {r["doc_id"]: r for r in D.cluster_keep_best(clusters, attrs).collect()}
    assert set(rows) == {"a", "b", "c", "d"}  # nothing dropped
    assert rows["b"]["is_canonical"] and not rows["a"]["is_canonical"]
    assert rows["c"]["score"] is None and rows["d"]["score"] is None
    assert rows["c"]["is_canonical"] and not rows["d"]["is_canonical"]  # min id wins


def test_lsh_recall_vs_brute(vectors):
    qs = vectors.filter(F.col("vec_id") < 10)
    brute = {(r["query_id"], r["neighbor_id"]) for r in S.brute_topk(vectors, qs, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in S.lsh_topk(vectors, qs, k=3).collect()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.3  # LSH with 16 planes/4 bands on random gaussians
    # the planted pair must survive any reasonable hashing
    assert (0, 500) in approx


def test_sketches_within_error_bounds(spark):
    """Approximate sketches must track exact answers: HLL within its
    rsd, quantile sketch within the accuracy the 10k buffer implies."""
    from bigdata_foundation_spark.queries import registry

    from bigdata_foundation_spark.queries import _t

    reg = registry()
    sf = "/root/testdata/sf0.01"
    ev = _t(spark, sf, "events")  # handles the nanos-timestamp parquet

    approx = {r["event_type"]: r["approx_users"] for r in reg["sketch_distinct_users"].fn(spark, sf).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05, (k, approx[k], exact[k])

    qa = {r["event_type"]: (r["p50_approx"], r["p95_approx"]) for r in reg["sketch_value_quantiles"].fn(spark, sf).collect()}
    qe = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for k in qe:
        assert abs(qa[k][0] - qe[k][0]) <= max(1.0, 0.02 * abs(qe[k][0]))
        assert abs(qa[k][1] - qe[k][1]) <= max(1.0, 0.02 * abs(qe[k][1]))


def test_ivf_recall_vs_brute(vectors):
    qs = vectors.filter(F.col("vec_id") < 10)
    brute = {(r["query_id"], r["neighbor_id"]) for r in S.brute_topk(vectors, qs, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in S.ivf_topk(vectors, qs, k=3, n_cells=8, n_probe=3).collect()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.3
    assert (0, 500) in approx  # planted near-dup shares vec 0's cell


def test_ivf_cell_balance(spark):
    """Hash-spread centroid seeds (round-3 verdict item 5): selection
    is a uniform pseudo-random corpus sample, so no cell hoards the
    corpus — bound the max/mean cell-size ratio and require every cell
    populated (first-n-by-id seeds can't guarantee either once ids
    correlate with content/ingest order). Also pins determinism: two
    selections from differently-partitioned views agree."""
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = S._centroids_from(e, 16, "vec_id", "embedding")
    assert len(cents) == 16
    # determinism under repartitioning — float summation order inside
    # the Lloyd mean differs across layouts; the 6-dp rounding contract
    # must absorb it
    cents2 = S._centroids_from(e.repartition(7), 16, "vec_id", "embedding")
    assert cents == cents2

    c = e.select(S._as_double(F.col("embedding")).alias("_cv")).withColumn(
        "cell", F.array_max(S._cell_scores(F.col("_cv"), cents))["cid"]
    )
    sizes = [r[1] for r in c.groupBy("cell").count().collect()]
    n_rows = e.count()
    assert len(sizes) == 16 and min(sizes) >= 1
    # seeds alone measured 1.44x at sf0.01; 2 Lloyd iterations tighten
    # to 1.31x (r5) — bound with headroom below the old 2.0x
    assert max(sizes) <= 1.6 * (n_rows / 16)


def test_ivf_lloyd_recall_clustered(spark):
    """On a genuinely CLUSTERED corpus (the regime hash-spread seeds
    alone can't debias — r4 verdict item 5), Lloyd-refined IVF keeps
    full top-k agreement with brute force at n_probe=4: centroids move
    onto the true cluster centers, so a query's probes cover the
    clusters its true neighbours live in."""
    import random

    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(8)]
    rows = [
        (i, [x + rng.gauss(0, 0.15) for x in centers[i % 8]], i % 8)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    qs = df.filter(F.col("vec_id") < 6)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_topk(df, qs, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(df, qs, k=5).collect()
    }
    assert len(brute) == 30
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.9, recall


def test_text_operators(spark):
    sentence = "The quick brown fox, and the lazy dog! They ran in the morning."
    df = spark.createDataFrame([(1, sentence)], "doc_id long, text string")
    res = TX.analyze(df).first()
    assert res["n_tokens_ws"] == 13
    # BPE-ish: 13 words + 3 punctuation marks
    assert res["n_tokens_bpe"] == 16
    assert res["punct_ratio"] == pytest.approx(3 / len(sentence), abs=1e-6)
    assert res["lang_pred"] == "en"
    assert 0.0 <= res["quality"] <= 1.0
    assert res["fingerprint"] is not None


def test_lang_id_multilingual(spark):
    # NB: the driver's synthetic documents.lang label is uncorrelated
    # with its (English word-salad) text, so lang-id is tested on real
    # sentences per language instead.
    samples = [
        ("en", "the cat is on the roof and the dog is in the garden for the day"),
        ("es", "el perro y el gato están en la casa que compramos por un buen precio"),
        ("fr", "le chien et le chat sont dans la maison des voisins et une grande cour"),
        ("de", "der Hund und die Katze sind in dem Haus mit den Kindern und ist ein Garten"),
        ("zh", "我是一个学生，我在学校有很多朋友，他们人都很好，就是不常见面了"),
    ]
    df = spark.createDataFrame(samples, "lang string, text string")
    got = {r["lang"]: r["pred"] for r in df.select("lang", TX.lang_id("text").alias("pred")).collect()}
    assert got == {lang: lang for lang, _ in samples}, got


def test_multimodal_pipeline(docs):
    media = M.attach_binary(docs)
    decoded = M.decode_features(media)
    rows = decoded.collect()
    assert len(rows) == 43
    assert all(len(r["feature"]) == 8 for r in rows)
    # determinism: same payload → same fake decode
    by_id = {r["media_id"]: (r["width"], r["height"]) for r in rows}
    assert by_id[100] == by_id[102]
    resized = M.resize_stub(decoded, max_side=64).collect()
    assert all(max(r["width"], r["height"]) <= 64 for r in resized)
    frames = M.frame_sample(media)
    fc = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in fc)


def _jpeg_bytes(width, height, rows_rgb, gray=False, subsample=False, dri=0, quant=None):
    """Hand-built BASELINE JPEG (SOF0) encoder — an INDEPENDENT
    forward implementation (FDCT + quantize + canonical huffman over
    exactly the used symbols) so the engine decoder's huffman walk,
    dequant, IDCT, restart handling and chroma upsample are genuinely
    exercised. Returns the JPEG bytes. ``subsample`` uses 4:2:0 luma
    2x2 (width/height must then be multiples of 16, else of 8)."""
    import math as _m
    import struct as _s

    q = quant if quant is not None else [1] * 64
    zigzag = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    basis = [
        [(_m.sqrt(0.125) if u == 0 else 0.5) * _m.cos((2 * x + 1) * u * _m.pi / 16.0) for u in range(8)]
        for x in range(8)
    ]

    def fdct_quant(block):  # block: 8x8 level-shifted floats -> zigzag ints
        # S[u][v] = sum_x sum_y basis[x][u] * s[x][y] * basis[y][v]
        tmp = [[sum(basis[x][u] * block[x][y] for x in range(8)) for y in range(8)] for u in range(8)]
        coef = [[sum(tmp[u][y] * basis[y][v] for y in range(8)) for v in range(8)] for u in range(8)]
        out = []
        for i in range(64):
            r, c = zigzag[i] >> 3, zigzag[i] & 7
            out.append(int(round(coef[r][c] / q[i])))
        return out

    # --- component planes ---
    if gray:
        planes = [[[float(rows_rgb[y][x]) - 128.0 for x in range(width)] for y in range(height)]]
        samp = [(1, 1)]
    else:
        ycc = [[None] * width for _ in range(height)]
        for y in range(height):
            for x in range(width):
                r, g, b = rows_rgb[y][x]
                yy = 0.299 * r + 0.587 * g + 0.114 * b
                cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
                ycc[y][x] = (yy, cb, cr)
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [
                [[ycc[y][x][0] - 128.0 for x in range(width)] for y in range(height)]
            ]
            for ci in (1, 2):
                planes.append(
                    [
                        [
                            sum(ycc[2 * y + dy][2 * x + dx][ci] for dy in (0, 1) for dx in (0, 1)) / 4.0 - 128.0
                            for x in range(width // 2)
                        ]
                        for y in range(height // 2)
                    ]
                )
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [
                [[ycc[y][x][ci] - 128.0 for x in range(width)] for y in range(height)]
                for ci in range(3)
            ]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # --- pass 1: MCU-ordered symbol stream ---
    sym_stream = []  # ("dc"/"ac", sym, extra_bits_value, extra_bits_len)
    used_dc, used_ac = set(), set()
    pred = [0] * len(planes)
    n_mcu = 0
    mcu_starts = []
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                mcu_starts.append(len(sym_stream))
                pred = [0] * len(planes)
            n_mcu += 1
            for ci, (hs, vs) in enumerate(samp):
                plane = planes[ci]
                ph, pw = len(plane), len(plane[0])
                for by in range(vs):
                    for bx in range(hs):
                        blk = [
                            [
                                plane[min((my * vs + by) * 8 + r, ph - 1)][min((mx * hs + bx) * 8 + c, pw - 1)]
                                for c in range(8)
                            ]
                            for r in range(8)
                        ]
                        zz = fdct_quant(blk)
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        t = max(diff, -diff).bit_length()
                        used_dc.add(t)
                        sym_stream.append(("dc", t, diff if diff >= 0 else diff + (1 << t) - 1, t))
                        run = 0
                        for k in range(1, 64):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                used_ac.add(0xF0)
                                sym_stream.append(("ac", 0xF0, 0, 0))
                                run -= 16
                            s_ = max(v, -v).bit_length()
                            sym = (run << 4) | s_
                            used_ac.add(sym)
                            sym_stream.append(("ac", sym, v if v >= 0 else v + (1 << s_) - 1, s_))
                            run = 0
                        if run:
                            used_ac.add(0x00)
                            sym_stream.append(("ac", 0x00, 0, 0))

    def canonical(used):
        """All used symbols at ONE length L with 2^L > n (the all-ones
        code stays unused, as T.81 requires)."""
        syms = sorted(used)
        L = max(1, len(syms).bit_length())
        if (1 << L) <= len(syms):
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        codes = {s: (L, i) for i, s in enumerate(syms)}
        return counts, syms, codes

    dc_counts, dc_syms, dc_codes = canonical(used_dc)
    ac_counts, ac_syms, ac_codes = canonical(used_ac or {0x00})

    # --- pass 2: bit stream with stuffing + restart markers ---
    out = bytearray()
    acc, nbits = 0, 0

    def put(v, n):
        nonlocal acc, nbits
        acc = (acc << n) | (v & ((1 << n) - 1))
        nbits += n
        while nbits >= 8:
            byte = (acc >> (nbits - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            nbits -= 8
            acc &= (1 << nbits) - 1

    def flush():
        nonlocal acc, nbits
        if nbits:
            byte = ((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            acc, nbits = 0, 0

    restarts = set(mcu_starts)
    rst = 0
    for i, (kind, sym, extra, elen) in enumerate(sym_stream):
        if i in restarts:
            flush()
            out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
        L, code = (dc_codes if kind == "dc" else ac_codes)[sym]
        put(code, L)
        if elen:
            put(extra, elen)
    flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + _s.pack(">H", len(body) + 2) + body

    head = b"\xff\xd8"
    head += seg(0xDB, bytes([0x00]) + bytes(q))
    ncomp = len(planes)
    sof = bytes([8]) + _s.pack(">HH", height, width) + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    head += seg(0xC0, sof)
    head += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    head += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    if dri:
        head += seg(0xDD, _s.pack(">H", dri))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    head += seg(0xDA, sos)
    return head + bytes(out) + b"\xff\xd9"


def _jpeg_progressive_bytes(
    width, height, rows_rgb, gray=False, subsample=False, quant=None, script=None,
    dri=0,
):
    """Hand-built PROGRESSIVE JPEG (SOF2) serializer: derives the SAME
    quantized coefficients as the baseline encoder (_jpeg_bytes —
    identical FDCT/quant arithmetic), then re-serializes them into a
    spectral-selection + successive-approximation scan script (T.81
    Annex G encoders: DC first/refine, AC first with EOB runs, AC
    refine with buffered correction bits; per-scan huffman tables, so
    the decoder's between-scan DHT evolution is exercised). Because
    the COEFFICIENTS are identical, the engine's progressive decode
    must reproduce the baseline decode's pixels EXACTLY."""
    import math as _m
    import struct as _s

    q = quant if quant is not None else [1] * 64
    zigzag = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    basis = [
        [(_m.sqrt(0.125) if u == 0 else 0.5) * _m.cos((2 * x + 1) * u * _m.pi / 16.0) for u in range(8)]
        for x in range(8)
    ]

    def fdct_quant(block):
        tmp = [[sum(basis[x][u] * block[x][y] for x in range(8)) for y in range(8)] for u in range(8)]
        coefm = [[sum(tmp[u][y] * basis[y][v] for y in range(8)) for v in range(8)] for u in range(8)]
        return [int(round(coefm[zigzag[i] >> 3][zigzag[i] & 7] / q[i])) for i in range(64)]

    if gray:
        planes = [[[float(rows_rgb[y][x]) - 128.0 for x in range(width)] for y in range(height)]]
        samp = [(1, 1)]
    else:
        ycc = [[None] * width for _ in range(height)]
        for y in range(height):
            for x in range(width):
                r, g, b = rows_rgb[y][x]
                yy = 0.299 * r + 0.587 * g + 0.114 * b
                cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
                ycc[y][x] = (yy, cb, cr)
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [[[ycc[y][x][0] - 128.0 for x in range(width)] for y in range(height)]]
            for ci in (1, 2):
                planes.append(
                    [
                        [
                            sum(ycc[2 * y + dy][2 * x + dx][ci] for dy in (0, 1) for dx in (0, 1)) / 4.0 - 128.0
                            for x in range(width // 2)
                        ]
                        for y in range(height // 2)
                    ]
                )
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [
                [[ycc[y][x][ci] - 128.0 for x in range(width)] for y in range(height)]
                for ci in range(3)
            ]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # quantized zigzag coefficients for the FULL allocated block grid
    blocks = []  # [ci][by][bx] -> zz[64]
    for ci, (hs, vs) in enumerate(samp):
        plane = planes[ci]
        ph, pw = len(plane), len(plane[0])
        grid = []
        for by in range(mcuy * vs):
            row = []
            for bx in range(mcux * hs):
                blk = [
                    [plane[min(by * 8 + r, ph - 1)][min(bx * 8 + c, pw - 1)] for c in range(8)]
                    for r in range(8)
                ]
                row.append(fdct_quant(blk))
            grid.append(row)
        blocks.append(grid)

    ncomp = len(planes)
    if script is None:
        if ncomp == 1:
            script = [
                ([0], 0, 0, 0, 1),      # DC first, Al=1
                ([0], 1, 5, 0, 2),      # AC low band first, Al=2
                ([0], 6, 63, 0, 2),     # AC high band first, Al=2
                ([0], 1, 63, 2, 1),     # AC refine 2 -> 1
                ([0], 1, 63, 1, 0),     # AC refine 1 -> 0
                ([0], 0, 0, 1, 0),      # DC refine
            ]
        else:
            script = [
                (list(range(ncomp)), 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([1], 1, 63, 0, 1),
                ([2], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([1], 1, 63, 1, 0),
                ([2], 1, 63, 1, 0),
                ([0], 1, 63, 1, 0),
                (list(range(ncomp)), 0, 0, 1, 0),
            ]

    def used_grid(ci):
        hs, vs = samp[ci]
        cw = -(-(width * hs) // hmax)
        ch = -(-(height * vs) // vmax)
        return -(-cw // 8), -(-ch // 8)

    def encode_scan(comp_ids, ss, se, ah, al):
        """Returns (stream, needs_dc_table, needs_ac_table): stream is
        a list of ("sym", s) / ("bits", value, nbits) items in exact
        emission order."""
        stream = []
        if ss == 0 and ah == 0:
            # DC first: interleaved MCU order over comp_ids; with dri,
            # a restart marker every dri MCUs (pred resets — exercises
            # the decoder's in-progressive-scan restart path)
            pred = {ci: 0 for ci in comp_ids}
            n_mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and n_mcu and n_mcu % dri == 0:
                        stream.append(("rst", None))
                        pred = {ci: 0 for ci in comp_ids}
                    n_mcu += 1
                    for ci in comp_ids:
                        hs, vs = samp[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                dc = blocks[ci][my * vs + by][mx * hs + bx][0] >> al
                                diff = dc - pred[ci]
                                pred[ci] = dc
                                t = max(diff, -diff).bit_length()
                                stream.append(("sym", t))
                                if t:
                                    stream.append(
                                        ("bits", diff if diff >= 0 else diff + (1 << t) - 1, t)
                                    )
            return stream, True, False
        if ss == 0:
            # DC refine: one raw bit per block, interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in comp_ids:
                        hs, vs = samp[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                bit = (blocks[ci][my * vs + by][mx * hs + bx][0] >> al) & 1
                                stream.append(("bits", bit, 1))
            return stream, False, False
        # AC scans: single component, used-grid row-major block order
        (ci,) = comp_ids
        nx_used, ny_used = used_grid(ci)
        eobrun = 0
        br = []  # correction bits buffered since the last symbol
        be = []  # correction bits belonging to the pending EOB run

        def flush_eob():
            # emits ONLY the pending EOB run + the bits that belong to
            # it (the decoder consumes those right after the EOB
            # symbol); the current segment's br bits flush after the
            # NEXT coefficient/ZRL symbol instead
            nonlocal eobrun
            if eobrun > 0:
                nb = eobrun.bit_length() - 1
                stream.append(("sym", nb << 4))
                if nb:
                    stream.append(("bits", eobrun - (1 << nb), nb))
                eobrun = 0
            for b in be:
                stream.append(("bits", b, 1))
            be.clear()

        for by in range(ny_used):
            for bx in range(nx_used):
                zz = blocks[ci][by][bx]
                if ah == 0:
                    # AC first (shifted magnitudes, EOB runs)
                    run = 0
                    emitted = False
                    for k in range(ss, se + 1):
                        v = zz[k]
                        t = (abs(v) >> al)
                        if t == 0:
                            run += 1
                            continue
                        if not emitted and eobrun:
                            flush_eob()
                        emitted = True
                        while run > 15:
                            stream.append(("sym", 0xF0))
                            run -= 16
                        s_ = t.bit_length()
                        stream.append(("sym", (run << 4) | s_))
                        mag = t if v > 0 else -t
                        stream.append(
                            ("bits", mag if mag >= 0 else mag + (1 << s_) - 1, s_)
                        )
                        run = 0
                    if not emitted:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                    elif run:
                        eobrun = 1  # trailing zeros -> start an EOB run
                        if eobrun == 0x7FFF:
                            flush_eob()
                else:
                    # AC refine (T.81 G.1.2.3 encoder): newly-nonzero
                    # coefficients emit (r<<4)|1 + sign + the br bits
                    # buffered since the last symbol; history-nonzero
                    # coefficients buffer correction bits; runs count
                    # ZERO-HISTORY positions only; bits buffered at end
                    # of block join the pending EOB run's buffer.
                    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
                    eob_idx = -1
                    for i, t in enumerate(absv):
                        if t == 1:
                            eob_idx = i
                    r = 0
                    for i, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and i <= eob_idx:
                            flush_eob()
                            stream.append(("sym", 0xF0))
                            r -= 16
                            for b in br:
                                stream.append(("bits", b, 1))
                            br.clear()
                        if t > 1:
                            br.append(t & 1)
                            continue
                        # t == 1: newly nonzero at this precision
                        flush_eob()
                        stream.append(("sym", (r << 4) | 1))
                        stream.append(("bits", 1 if zz[ss + i] > 0 else 0, 1))
                        r = 0
                        for b in br:
                            stream.append(("bits", b, 1))
                        br.clear()
                    if r > 0 or br:
                        eobrun += 1
                        be.extend(br)
                        br.clear()
                        if eobrun == 0x7FFF:
                            flush_eob()
        flush_eob()
        return stream, False, True

    def canonical(used):
        syms = sorted(used)
        L = max(1, len(syms).bit_length())
        if (1 << L) <= len(syms):
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        codes = {s: (L, i) for i, s in enumerate(syms)}
        return counts, syms, codes

    def seg(marker, body):
        return bytes([0xFF, marker]) + _s.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(q))
    sof = bytes([8]) + _s.pack(">HH", height, width) + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)  # SOF2: progressive

    dri_state = None
    for comp_ids, ss, se, ah, al in script:
        # restarts only in the interleaved DC-first scan; T.81 lets DRI
        # be redefined between scans, so turn it off for the rest —
        # this ALSO exercises the decoder's between-scan DRI handling
        want_dri = dri if (ss == 0 and ah == 0 and dri) else 0
        if want_dri != dri_state:
            out += seg(0xDD, _s.pack(">H", want_dri))
            dri_state = want_dri
        stream, is_dc, is_ac = encode_scan(comp_ids, ss, se, ah, al)
        used = {s for kind, *rest in stream if kind == "sym" for s in [rest[0]]}
        if used or is_dc or is_ac:
            counts, syms, codes = canonical(used or {0x00})
            if is_dc:
                out += seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(syms))
            if is_ac:
                out += seg(0xC4, bytes([0x10]) + bytes(counts) + bytes(syms))
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00 if is_dc or (ss == 0) else 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        # entropy bits
        buf = bytearray()
        acc, nbits = 0, 0
        rst_no = 0

        def put(v, n):
            nonlocal acc, nbits
            acc = (acc << n) | (v & ((1 << n) - 1))
            nbits += n
            while nbits >= 8:
                byte = (acc >> (nbits - 8)) & 0xFF
                buf.append(byte)
                if byte == 0xFF:
                    buf.append(0x00)
                nbits -= 8
                acc &= (1 << nbits) - 1

        def flush_byte():
            nonlocal acc, nbits
            if nbits:
                byte = ((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF
                buf.append(byte)
                if byte == 0xFF:
                    buf.append(0x00)
                acc, nbits = 0, 0

        for item in stream:
            if item[0] == "sym":
                L, code = codes[item[1]]
                put(code, L)
            elif item[0] == "rst":
                flush_byte()
                buf.extend(bytes([0xFF, 0xD0 + (rst_no % 8)]))
                rst_no += 1
            else:
                put(item[1], item[2])
        flush_byte()
        out += bytes(buf)
    return out + b"\xff\xd9"


def _bmp_bytes(width, rows_rgb):
    """Hand-built 24-bpp BI_RGB BMP (bottom-up rows, BGR, 4-byte pad)."""
    import struct as _s

    height = len(rows_rgb)
    row_sz = (width * 3 + 3) & ~3
    body = b""
    for row in reversed(rows_rgb):
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (row_sz - len(line))
    info = _s.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    head = b"BM" + _s.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return head + info + body


def _png_bytes(width, rows_rgb, filters, color_type=2):
    """Hand-built non-interlaced 8-bit PNG with per-row filter bytes —
    the test FORWARD-filters known pixels so the decoder's unfilter
    logic (Sub/Up/Average/Paeth) is genuinely exercised."""
    import struct as _s
    import zlib as _z

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    stride = width * ch
    raw = b""
    prev = bytes(stride)
    for row, ft in zip(rows_rgb, filters):
        if color_type == 0:
            line = bytes(px for px in row)
        elif color_type == 2:
            line = b"".join(bytes(px) for px in row)
        else:
            line = b"".join(bytes(px) for px in row)  # row already RGBA tuples
        enc = bytearray(stride)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d))

    ihdr = _s.pack(">IIBBBBB", width, len(rows_rgb), 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_bytes_ex(w, h, get_sample, bd, ct, interlace=0, palette=None, filt_cycle=(0, 1, 2, 3, 4)):
    """Hand-built PNG across the full decoder matrix (r11): any legal
    (bit-depth, color-type), optional Adam7 interlacing, optional
    PLTE — an INDEPENDENT test-side serializer: it forward-filters
    known samples (cycling through the five filters) and splits the
    Adam7 passes itself, so the decoder's unfilter/deinterlace/
    unpack logic is genuinely exercised. ``get_sample(x, y)`` returns
    the channel tuple (each value < 2^bd)."""
    import struct as _s
    import zlib as _z

    channels = {0: 1, 2: 3, 3: 1, 6: 4}[ct]
    fbpp = max(1, bd * channels // 8)

    def pack_line(coords):
        # pack one scanline's samples: sub-byte MSB-first, 16-bit MSB-first
        if bd == 16:
            return b"".join(
                _s.pack(">H", v) for (x, y) in coords for v in get_sample(x, y)
            )
        if bd == 8:
            return bytes(v for (x, y) in coords for v in get_sample(x, y))
        bits = "".join(
            format(v, f"0{bd}b") for (x, y) in coords for v in get_sample(x, y)
        )
        bits += "0" * (-len(bits) % 8)
        return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    def filt_img(rows):
        out = b""
        prev = bytes(len(rows[0])) if rows else b""
        for r, line in enumerate(rows):
            ft = filt_cycle[r % len(filt_cycle)]
            enc = bytearray(len(line))
            for i in range(len(line)):
                a = line[i - fbpp] if i >= fbpp else 0
                b = prev[i]
                c = prev[i - fbpp] if i >= fbpp else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
            out += bytes([ft]) + bytes(enc)
            prev = line
        return out

    raw = b""
    if interlace == 0:
        raw = filt_img([pack_line([(x, y) for x in range(w)]) for y in range(h)])
    else:
        adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        for x0, y0, dx, dy in adam7:
            xs = list(range(x0, w, dx))
            ys = list(range(y0, h, dy))
            if not xs or not ys:
                continue
            raw += filt_img([pack_line([(x, y) for x in xs]) for y in ys])

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d))

    ihdr = _s.pack(">IIBBBBB", w, h, bd, ct, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    return out + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b"")


def test_png_full_matrix_decode():
    """r11: the PNG decoder covers the practical format matrix —
    palette (8-bit and sub-byte), gray at every legal depth (1-bit
    scaling to full range, 16-bit narrowing to the high byte), RGB(A)
    16-bit, and Adam7 interlacing — each pinned against the
    independent serializer's known pixels; interlaced == straight."""
    rng_px = lambda x, y: ((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256, (x * 11 + y) % 256)

    # palette 8-bit, all five filters
    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 0), (255, 255, 255), (5, 250, 125)]
    idx = lambda x, y: ((x + 2 * y) % len(pal),)
    png = _png_bytes_ex(7, 6, idx, bd=8, ct=3, palette=pal)
    w, h, pix = M._decode_png(png)
    want = np.array([pal[idx(x, y)[0]] for y in range(6) for x in range(7)])
    assert (w, h) == (7, 6) and np.array_equal(pix, want)

    # palette 4-bit (sub-byte unpack, odd width -> padded bits)
    png = _png_bytes_ex(5, 4, idx, bd=4, ct=3, palette=pal, filt_cycle=(0, 2))
    w, h, pix = M._decode_png(png)
    want = np.array([pal[idx(x, y)[0]] for y in range(4) for x in range(5)])
    assert (w, h) == (5, 4) and np.array_equal(pix, want)

    # gray 1-bit: checkerboard scales 0/1 -> 0/255
    bit = lambda x, y: ((x + y) % 2,)
    png = _png_bytes_ex(10, 3, bit, bd=1, ct=0)
    w, h, pix = M._decode_png(png)
    want = np.array([[255 * ((x + y) % 2)] * 3 for y in range(3) for x in range(10)])
    assert (w, h) == (10, 3) and np.array_equal(pix, want)

    # gray 2-bit: values 0..3 scale by 85
    g2 = lambda x, y: ((x + y) % 4,)
    png = _png_bytes_ex(6, 5, g2, bd=2, ct=0, filt_cycle=(0,))
    w, h, pix = M._decode_png(png)
    want = np.array([[85 * ((x + y) % 4)] * 3 for y in range(5) for x in range(6)])
    assert np.array_equal(pix, want)

    # gray 16-bit: high-byte narrowing
    g16 = lambda x, y: ((x * 4096 + y * 257) % 65536,)
    png = _png_bytes_ex(5, 5, g16, bd=16, ct=0, filt_cycle=(0, 1, 2, 3, 4))
    w, h, pix = M._decode_png(png)
    want = np.array([[g16(x, y)[0] >> 8] * 3 for y in range(5) for x in range(5)])
    assert np.array_equal(pix, want)

    # RGBA 16-bit: alpha dropped, high bytes kept
    rgba16 = lambda x, y: tuple(v * 257 for v in rng_px(x, y)) + (65535,)
    png = _png_bytes_ex(4, 4, rgba16, bd=16, ct=6)
    w, h, pix = M._decode_png(png)
    want = np.array([rng_px(x, y) for y in range(4) for x in range(4)])
    assert np.array_equal(pix, want)

    # Adam7 RGB 8-bit == the same image non-interlaced (sizes that
    # exercise partial/empty passes: 9x7 and tiny 2x2 / 1x1)
    for (w0, h0) in ((9, 7), (2, 2), (1, 1), (8, 1), (1, 9)):
        straight = _png_bytes_ex(w0, h0, rng_px, bd=8, ct=2)
        inter = _png_bytes_ex(w0, h0, rng_px, bd=8, ct=2, interlace=1)
        ws, hs, ps = M._decode_png(straight)
        wi, hi, pi = M._decode_png(inter)
        assert (ws, hs) == (wi, hi) == (w0, h0)
        assert np.array_equal(ps, pi)
        want = np.array([rng_px(x, y) for y in range(h0) for x in range(w0)])
        assert np.array_equal(ps, want)

    # Adam7 palette sub-byte: interlace x bit-unpack composed
    png = _png_bytes_ex(9, 7, idx, bd=4, ct=3, palette=pal, interlace=1)
    w, h, pix = M._decode_png(png)
    want = np.array([pal[idx(x, y)[0]] for y in range(7) for x in range(9)])
    assert np.array_equal(pix, want)

    # malformed: palette image without PLTE / index past palette -> stub
    no_plte = _png_bytes_ex(3, 3, idx, bd=8, ct=3, palette=None)
    assert M._decode_payload(no_plte) == M._fake_decode(no_plte)
    short_pal = _png_bytes_ex(3, 3, lambda x, y: (4,), bd=8, ct=3, palette=pal[:2])
    assert M._decode_payload(short_pal) == M._fake_decode(short_pal)


def test_wav_float_nan_falls_back_to_stub():
    """r11 (review finding): a float-PCM WAV containing a NaN sample
    (real DAW exports can) must stub out, not emit NaN features that
    ride through np.clip and poison the [0, 1] feature contract."""
    import struct as st

    vals = st.pack("<3f", 0.25, float("nan"), -0.5)
    fmt = st.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(vals)) + vals
    wv = b"RIFF" + st.pack("<I", len(body)) + body
    assert M._decode_payload(wv) == M._fake_decode(wv)
    inf = st.pack("<3f", 0.25, float("inf"), -0.5)
    wv2 = wv.replace(vals, inf)
    assert M._decode_payload(wv2) == M._fake_decode(wv2)


def test_minhash_duplicate_id_no_self_pairs(spark):
    """r11 (review finding): _bucket_pairs_est's collect_list (vs the
    old collect_set) would pair a duplicate id with itself at full
    agreement — the scan-side id_a != id_b guard must keep the old
    set-semantics invariant even when the input carries duplicate
    ids."""
    rows = [(1, "the quick brown fox jumps over the lazy dog " * 5)] * 2 + [
        (2, "the quick brown fox jumps over the lazy dog " * 5),
        (3, "completely different text about something else entirely " * 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = D.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert all(r["id_a"] != r["id_b"] for r in got)
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


def test_bmp_32bpp_and_palette_decode():
    """r11: 32-bpp BGRX (alpha lane dropped) and 8-bpp palette BMPs
    decode against hand-built fixtures; truncated color tables and
    out-of-range palette indices fall back to the stub."""
    import struct as st

    def bmp(w, h, bpp, body, palette=b"", clr_used=0):
        hdr_sz = 14 + 40 + len(palette)
        info = st.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 0, 0, clr_used, 0)
        return (
            b"BM" + st.pack("<IHHI", hdr_sz + len(body), 0, 0, hdr_sz) + info + palette + body
        )

    # 32-bpp 2x2 bottom-up: BGRX quads, no row padding needed
    px = {(0, 0): (1, 2, 3), (1, 0): (4, 5, 6), (0, 1): (7, 8, 9), (1, 1): (10, 11, 12)}
    rows = []
    for y in (1, 0):  # bottom-up
        row = b""
        for x in (0, 1):
            r, g, b = px[(x, y)]
            row += bytes([b, g, r, 0xAA])
        rows.append(row)
    p32 = bmp(2, 2, 32, b"".join(rows))
    w, h, pix = M._decode_bmp(p32)
    want = np.array([px[(x, y)] for y in range(2) for x in range(2)])
    assert (w, h) == (2, 2) and np.array_equal(pix, want)

    # 8-bpp palette 3x2 bottom-up with row padding (3 -> 4 bytes)
    pal_rgb = [(250, 10, 20), (30, 40, 50), (60, 70, 80)]
    palette = b"".join(bytes([b, g, r, 0]) for r, g, b in pal_rgb)
    idx = [[0, 1, 2], [2, 1, 0]]  # top-down rows
    body = b"".join(bytes(idx[y]) + b"\x00" for y in (1, 0))  # bottom-up + pad
    p8 = bmp(3, 2, 8, body, palette, clr_used=3)
    w, h, pix = M._decode_bmp(p8)
    want = np.array([pal_rgb[i] for row in idx for i in row])
    assert (w, h) == (3, 2) and np.array_equal(pix, want)

    # palette index beyond the color table -> stub
    bad = bmp(3, 2, 8, b"".join(bytes([0, 1, 7]) + b"\x00" for _ in range(2)), palette, clr_used=3)
    assert M._decode_payload(bad) == M._fake_decode(bad)
    # declared 256 colors but table truncated (data_off too close) -> stub
    bad2 = bmp(3, 2, 8, body, palette, clr_used=0)
    assert M._decode_payload(bad2) == M._fake_decode(bad2)


def test_wav_24bit_pcm_decode():
    """r11: 24-bit integer PCM (the pro-audio default) decodes real
    values — hand-packed 3-byte LE samples incl. negative and
    full-scale, against hand-computed /2^23 normalization."""
    import struct as st

    vals = [0, 1, -1, 8388607, -8388608, 4242424]  # 24-bit signed range
    data = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    fmt = st.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(data)) + data
    wv = b"RIFF" + st.pack("<I", len(body)) + body
    nf, nc, feat = M._decode_wav(wv)
    assert (nf, nc) == (6, 1)
    want = M._audio_feature([v / 8388608.0 for v in vals], 48000)
    assert feat == pytest.approx(want, abs=0)


def test_multimodal_real_bmp_png_jpeg_decode(spark):
    """r8 (r7 verdict item 7) + r9 (r8 verdict task 5): BMP, PNG and
    baseline-JPEG payloads decode REAL bytes with stdlib-only codecs
    through the full Arrow mapInPandas path — true dimensions,
    pixel-exact decode where the format is lossless (BMP bottom-up BGR
    + padding; PNG zlib inflate + all five scanline filters; RGBA
    alpha drop; gray expansion) or exactly bounded where it is lossy
    (JPEG SOF0: exact for DC-only/solid blocks under unit quant,
    quantization-bounded otherwise; huffman + restart markers + 4:2:0
    exercised against an independent test-side encoder), plus honest
    stub fallback for corrupt/unknown/progressive formats."""
    bmp_px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(255, 255, 255), (0, 0, 0), (128, 128, 128)],
    ]
    bmp = _bmp_bytes(3, bmp_px)

    def same(got, w, h, px_rows):
        gw, gh, gp = got
        return (gw, gh) == (w, h) and np.array_equal(
            gp, np.asarray([p for row in px_rows for p in row])
        )

    assert same(M._decode_bmp(bmp), 3, 2, bmp_px)

    png_px = [
        [(10, 20, 30), (40, 50, 60), (200, 150, 100)],
        [(0, 0, 0), (255, 255, 255), (128, 0, 128)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
        [(250, 1, 128), (9, 200, 77), (33, 44, 55)],
        [(100, 100, 100), (101, 99, 98), (102, 103, 97)],
    ]
    png = _png_bytes(3, png_px, filters=[0, 1, 2, 3, 4])
    assert same(M._decode_png(png), 3, 5, png_px)

    gray = _png_bytes(2, [[7, 250], [128, 0]], filters=[0, 2], color_type=0)
    assert same(M._decode_png(gray), 2, 2, [[(7, 7, 7), (250, 250, 250)], [(128, 128, 128), (0, 0, 0)]])

    rgba = _png_bytes(
        2, [[(1, 2, 3, 255), (4, 5, 6, 0)], [(7, 8, 9, 10), (10, 11, 12, 200)]],
        filters=[0, 4], color_type=6,
    )
    assert same(M._decode_png(rgba), 2, 2, [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]])

    # full engine path: mapInPandas over a mixed-format media table
    corrupt = b"BM" + b"\x01" * 80  # bad header -> stub fallback
    media = spark.createDataFrame(
        [(1, bmp, "image/bmp", len(bmp)), (2, png, "image/png", len(png)),
         (3, corrupt, "application/octet-stream", len(corrupt))],
        M.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in M.decode_features(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (3, 2)
    assert (got[2]["width"], got[2]["height"]) == (3, 5)
    want_bmp_feat = M._pixel_feature([p for row in bmp_px for p in row])
    assert got[1]["feature"] == pytest.approx(want_bmp_feat, abs=1e-6)
    # bright-pixel fraction of the BMP: 2 of 6 pixels have gray >= 128
    assert abs(got[1]["feature"][6] - 2 / 6) < 1e-6
    fw, fh, ffeat = M._fake_decode(corrupt)
    assert (got[3]["width"], got[3]["height"]) == (fw, fh)

    # --- baseline JPEG (r9 — r8 verdict task 5) ---------------------
    # flat 8x8 gray: DC-only block, quant all-ones -> decode is EXACT
    flat = _jpeg_bytes(8, 8, [[77] * 8 for _ in range(8)], gray=True)
    assert same(M._decode_jpeg(flat), 8, 8, [[(77, 77, 77)] * 8] * 8)

    # solid color 16x16 with 4:2:0 subsampling + restart markers:
    # solid chroma averages to itself -> decode is EXACT (each channel
    # round-trips through YCbCr with the same 0.5-rounding)
    solid = [[(200, 40, 90)] * 16 for _ in range(16)]
    sj = _jpeg_bytes(16, 16, solid, subsample=True, dri=1)
    wj, hj, pj = M._decode_jpeg(sj)
    assert (wj, hj) == (16, 16)
    assert np.abs(pj.astype(int) - np.array([200, 40, 90])).max() <= 1

    # structured 16x8 gray gradient+checker: round-trip within the
    # all-ones-quant bound (DCT coefficient rounding only)
    grad = [[(x * 16 + (8 if (x + y) % 2 else 0)) % 256 for x in range(16)] for y in range(8)]
    gj = _jpeg_bytes(16, 8, grad, gray=True)
    wj, hj, pj = M._decode_jpeg(gj)
    assert (wj, hj) == (16, 8)
    worst = max(abs(int(pj[y * 16 + x][0]) - grad[y][x]) for y in range(8) for x in range(16))
    assert worst <= 2, worst

    # 4:4:4 color with a REAL quant table (coarse) still lands within
    # the quantization error bound sum(q)/2 spread over the block —
    # loose sanity bound, plus full mapInPandas path + format sniff
    q2 = [16] + [8] * 63
    cimg = [[(10 * x, 20 * y % 256, (x * y) % 256) for x in range(8)] for y in range(8)]
    cj = _jpeg_bytes(8, 8, cimg, quant=q2)
    wj, hj, pj = M._decode_jpeg(cj)
    assert (wj, hj) == (8, 8)
    worst = max(
        abs(int(pj[y * 8 + x][ci]) - cimg[y][x][ci]) for y in range(8) for x in range(8) for ci in range(3)
    )
    assert worst <= 40, worst  # coarse quant, bounded distortion
    got_j = {
        r["media_id"]: r
        for r in M.decode_features(
            spark.createDataFrame(
                [(11, sj, "image/jpeg", len(sj)), (12, flat, "image/jpeg", len(flat))],
                M.MEDIA_SCHEMA,
            )
        ).collect()
    }
    assert (got_j[11]["width"], got_j[11]["height"]) == (16, 16)
    assert got_j[12]["feature"] == pytest.approx(M._pixel_feature([(77, 77, 77)] * 64), abs=1e-6)

    # a MALFORMED SOF2 (baseline scan header behind a progressive
    # marker: full-spectrum interleaved scan, illegal in progressive)
    # falls back to the stub; real SOF2 decodes — see
    # test_progressive_jpeg_decode
    prog = flat.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert M._decode_payload(prog) == M._fake_decode(prog)

    # r9 (advisor, high): corrupt bytes past the magic sniff raise
    # zlib.error (garbage IDAT stream) or struct.error (IHDR shorter
    # than 13 bytes) rather than ValueError — both must still fall
    # back to the stub, or a single truncated PNG fails the whole
    # ingest mapInPandas task.
    import struct
    import zlib as _zl

    def chunk(tag, body):
        c = len(body).to_bytes(4, "big") + tag + body
        return c + _zl.crc32(tag + body).to_bytes(4, "big")

    bad_idat = (
        M._PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"\x00not-a-zlib-stream")
        + chunk(b"IEND", b"")
    )
    short_ihdr = M._PNG_MAGIC + chunk(b"IHDR", b"\x00\x01\x02")  # 3 < 13 bytes
    for broken in (bad_idat, short_ihdr):
        w, h, feat = M._decode_payload(broken)
        assert (w, h, feat) == M._fake_decode(broken)
    got2 = {
        r["media_id"]: r
        for r in M.decode_features(
            spark.createDataFrame(
                [(7, bad_idat, "image/png", len(bad_idat)),
                 (8, short_ihdr, "image/png", len(short_ihdr))],
                M.MEDIA_SCHEMA,
            )
        ).collect()
    }
    assert got2[7]["width"] == M._fake_decode(bad_idat)[0]
    assert got2[8]["width"] == M._fake_decode(short_ihdr)[0]


def test_progressive_jpeg_decode(spark):
    """r10: PROGRESSIVE JPEG (SOF2) decodes real bytes — the
    serializer (_jpeg_progressive_bytes) re-encodes the baseline
    encoder's EXACT quantized coefficients into spectral-selection +
    successive-approximation scans (DC first/refine, AC band firsts at
    Al=2, two AC refine passes, EOB runs, per-scan huffman tables), so
    the progressive decode must equal the baseline decode PIXEL FOR
    PIXEL. Covers gray, 4:4:4 color with a coarse quant table, and
    4:2:0 subsampling with padding blocks + non-interleaved used-grid
    AC scans; arithmetic JPEG still falls back to the stub."""
    def eq(a, b):
        return a[0] == b[0] and a[1] == b[1] and np.array_equal(a[2], b[2])

    # gray gradient+checker 16x8
    grad = [[(x * 16 + (8 if (x + y) % 2 else 0)) % 256 for x in range(16)] for y in range(8)]
    base = M._decode_jpeg(_jpeg_bytes(16, 8, grad, gray=True))
    prog = M._decode_jpeg(_jpeg_progressive_bytes(16, 8, grad, gray=True))
    assert eq(prog, base)

    # 4:4:4 color with a coarse quant table (nonzero AC spread)
    q2 = [16] + [8] * 63
    cimg = [[(10 * x, 20 * y % 256, (x * y) % 256) for x in range(8)] for y in range(8)]
    base = M._decode_jpeg(_jpeg_bytes(8, 8, cimg, quant=q2))
    prog = M._decode_jpeg(_jpeg_progressive_bytes(8, 8, cimg, quant=q2))
    assert eq(prog, base)

    # 4:2:0 with structure: 32x16 -> luma used-grid 4x2 blocks inside a
    # 4x2 MCU grid; chroma 2x1 blocks; multiple EOB runs
    big = [
        [((x * 7) % 256, (y * 11 + x) % 256, (x * x + y) % 256) for x in range(32)]
        for y in range(16)
    ]
    base = M._decode_jpeg(_jpeg_bytes(32, 16, big, subsample=True))
    prog = M._decode_jpeg(_jpeg_progressive_bytes(32, 16, big, subsample=True))
    assert eq(prog, base)

    # flat image: DC-only blocks, long EOB runs through every AC scan
    flat = [[(77, 77, 77)] * 16 for _ in range(16)]
    base = M._decode_jpeg(_jpeg_bytes(16, 16, flat))
    prog = M._decode_jpeg(_jpeg_progressive_bytes(16, 16, flat))
    assert eq(prog, base)

    # restart markers INSIDE a progressive scan (DRI on the interleaved
    # DC-first scan, redefined to 0 before the AC scans): pred resets
    # per interval, between-scan DRI handling exercised
    wide = [[(x * 16 + (8 if (x + y) % 2 else 0)) % 256 for x in range(32)] for y in range(16)]
    base = M._decode_jpeg(_jpeg_bytes(32, 16, wide, gray=True))
    prog = M._decode_jpeg(_jpeg_progressive_bytes(32, 16, wide, gray=True, dri=2))
    assert eq(prog, base)
    base = M._decode_jpeg(_jpeg_bytes(32, 16, big, subsample=True))
    prog = M._decode_jpeg(_jpeg_progressive_bytes(32, 16, big, subsample=True, dri=1))
    assert eq(prog, base)

    # through the sniffing decode + full engine path
    pj = _jpeg_progressive_bytes(16, 8, grad, gray=True)
    w, h, feat = M._decode_payload(pj)
    assert (w, h) == (16, 8)
    got = M.decode_features(
        spark.createDataFrame([(5, pj, "image/jpeg", len(pj))], M.MEDIA_SCHEMA)
    ).collect()[0]
    assert (got["width"], got["height"]) == (16, 8)

    # arithmetic coding (SOF9) stays stubbed
    arith = pj.replace(b"\xff\xc2", b"\xff\xc9", 1)
    assert M._decode_payload(arith) == M._fake_decode(arith)
    # truncated MID-ENTROPY -> stub (the bit reader runs dry); note a
    # progressive stream cut BETWEEN scans is a VALID partial render
    # (the format's defining property), so only mid-scan cuts fail
    sos = pj.find(b"\xff\xda")
    trunc = pj[: sos + 24]
    assert M._decode_payload(trunc) == M._fake_decode(trunc)


def test_corrupt_jpeg_falls_back_to_stub(spark):
    """r10 (advisor, medium): corrupt JPEGs that sniff as JPEG but
    reference an undefined quant/huffman table or an unknown SOS
    component id raise KeyError inside _decode_jpeg, and a zero-height
    SOF0 would produce a zero-pixel decode — all of these must fall
    back to the stub (total-function ingest contract), not escape the
    Arrow task."""
    flat = _jpeg_bytes(8, 8, [[77] * 8 for _ in range(8)], gray=True)
    assert M._decode_payload(flat)[:2] == (8, 8)  # sanity: valid decodes real

    sof = flat.find(b"\xff\xc0")
    sos = flat.find(b"\xff\xda")
    assert sof > 0 and sos > 0

    # SOS huffman-table spec -> undefined table ids (dc 7 / ac 7)
    bad_huff = flat[: sos + 6] + b"\x77" + flat[sos + 7 :]
    # SOS component id -> not declared in SOF0
    bad_cid = flat[: sos + 5] + b"\x63" + flat[sos + 6 :]
    # SOF0 component quant-table id -> undefined table 3
    bad_quant = flat[: sof + 12] + b"\x03" + flat[sof + 13 :]
    # SOF0 height -> 0 (DNL-deferred height): zero-pixel frame
    zero_h = flat[: sof + 5] + b"\x00\x00" + flat[sof + 7 :]

    broken = [bad_huff, bad_cid, bad_quant, zero_h]
    for b in broken:
        assert M._decode_payload(b) == M._fake_decode(b)

    # and through the full engine path: one bad file per row, task survives
    media = spark.createDataFrame(
        [(i, b, "image/jpeg", len(b)) for i, b in enumerate(broken)],
        M.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in M.decode_features(media).collect()}
    assert len(got) == len(broken)
    for i, b in enumerate(broken):
        assert got[i]["width"] == M._fake_decode(b)[0]


def test_wav_pcm_decode(spark):
    """r10 (r9 verdict task 6): WAV/PCM decodes REAL bytes stdlib-only
    — byte-exact fixtures: hand-built 16-bit stereo and 8-bit mono
    WAVs decode to known frame/channel counts and hand-computed
    features; corrupt/unsupported audio (16-bit float — an invalid
    format-3 width, truncated RIFF, zero data) falls back to the
    stub; r11: 32-bit IEEE-float PCM (format code 3) decodes REAL
    values incl. out-of-range clipping; the synth payload (incl. the
    d % 7 == 5 float branch) round-trips through the full Arrow
    engine path."""
    import struct as st

    def wav(n_ch, bits, rate, frames):  # frames = list of per-channel tuples
        vals = [v for fr in frames for v in fr]
        if bits == 16:
            data = st.pack("<%dh" % len(vals), *vals)
        else:
            data = bytes(vals)
        ba = n_ch * (bits // 8)
        fmt = st.pack("<HHIIHH", 1, n_ch, rate, rate * ba, ba, bits)
        body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
        body += b"data" + st.pack("<I", len(data)) + data
        return b"RIFF" + st.pack("<I", len(body)) + body

    # 16-bit stereo: 3 frames with known samples
    w16 = wav(2, 16, 16000, [(0, 16384), (-32768, 32767), (16384, -16384)])
    nf, nc, feat = M._decode_wav(w16)
    assert (nf, nc) == (3, 2)
    samples = [0.0, 0.5, -1.0, 32767 / 32768.0, 0.5, -0.5]
    assert feat == pytest.approx(M._audio_feature(samples, 16000), abs=0)
    assert feat[2] == pytest.approx((32767 / 32768.0 + 1) / 2)  # max
    assert feat[1] == 0.0  # min == -1 -> mapped 0
    assert feat[7] == pytest.approx(16000 / 96000.0)

    # 8-bit mono: unsigned with 128 offset; 4 samples
    w8 = wav(1, 8, 8000, [(128,), (255,), (0,), (192,)])
    nf, nc, feat8 = M._decode_wav(w8)
    assert (nf, nc) == (4, 1)
    assert feat8 == pytest.approx(
        M._audio_feature([0.0, 127 / 128.0, -1.0, 64 / 128.0], 8000), abs=0
    )

    # through the sniffing decode
    assert M._decode_payload(w16) == (3, 2, feat)

    # r11: 32-bit IEEE-float PCM (format 3) decodes real values; the
    # 1.5 sample exercises the nominal-full-scale clip to [-1, 1]
    fvals = [0.25, -0.5, 1.5, -1.0]
    fdata = st.pack("<4f", *fvals)
    ffmt = st.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    fbody = b"WAVE" + b"fmt " + st.pack("<I", len(ffmt)) + ffmt
    fbody += b"data" + st.pack("<I", len(fdata)) + fdata
    wf = b"RIFF" + st.pack("<I", len(fbody)) + fbody
    nf, nc, featf = M._decode_wav(wf)
    assert (nf, nc) == (4, 1)
    assert featf == pytest.approx(M._audio_feature([0.25, -0.5, 1.0, -1.0], 44100), abs=0)

    # corrupt / unsupported -> stub (format 3 is only valid at 32 bits)
    float16_pcm = w16.replace(st.pack("<HH", 1, 2), st.pack("<HH", 3, 2), 1)
    truncated = w16[:20]
    no_data = wav(1, 16, 8000, [(0,)])[: 12 + 8 + 16]  # fmt only, data chunk cut
    for bad in (float16_pcm, truncated, no_data):
        assert M._decode_payload(bad) == M._fake_decode(bad)

    # synth payloads: engine mapInPandas end to end, real decode
    # (d = 12 hits the d % 7 == 5 float32 branch)
    ids = spark.range(10, 16).withColumnRenamed("id", "doc_id")
    media = M.synth_wav_table(ids)
    got = {r["media_id"]: r for r in M.decode_features(media).collect()}
    for d in range(10, 16):
        want = M._decode_wav(M.synth_wav_bytes(d))
        assert (got[d]["width"], got[d]["height"]) == (want[0], want[1])
        assert got[d]["feature"] == pytest.approx(want[2], abs=1e-6)
        assert got[d]["width"] == 64 + d % 129 and got[d]["height"] == 1 + d % 2


def test_avi_video_decode_and_frame_sampling(spark):
    """r10: uncompressed-AVI decodes REAL bytes stdlib-only — synth
    payloads round-trip pixel-exact through _decode_avi; the real
    frame sampler emits every-nth sampled frame with true dimensions
    and pixel features; corrupt/compressed video falls back (sniffing
    decode → stub; frame table → no rows); plan stays Arrow-batched."""
    # pixel-exact round trip for a spread of ids
    for d in (0, 1, 5, 10, 41):
        p = M.synth_avi_bytes(d)
        w, h, frames = M._decode_avi(p)
        assert (w, h) == (8 + (d % 3) * 4, 6 + (d % 2) * 2)
        assert len(frames) == 3 + d % 6

        def px(f, y, x, c, d=d):
            return ((d * 13 + f * 7 + y * 5 + x * 3 + c) * 2654435761) % 256

        for f in (0, len(frames) - 1):
            for y, x in ((0, 0), (h - 1, w - 1), (1, 2)):
                assert tuple(frames[f][y * w + x]) == (px(f, y, x, 0), px(f, y, x, 1), px(f, y, x, 2))
        # sniffing decode = first-frame thumbnail
        assert M._decode_payload(p) == (w, h, M._pixel_feature(frames[0]))

    # corrupt variants -> stub / dropped
    good = M.synth_avi_bytes(7)
    truncated = good[:48]
    # shrink the strf bpp field to 8: compressed/unsupported pixel format
    compressed = good.replace(b"\x01\x00\x18\x00", b"\x01\x00\x08\x00", 1)
    assert compressed != good
    for bad in (truncated, compressed):
        assert M._decode_payload(bad) == M._fake_decode(bad)

    # engine path: sampler semantics (every_n=2, cap 4) + real features
    ids = spark.range(20, 26).withColumnRenamed("id", "doc_id")
    media = M.synth_avi_table(ids)
    rows = M.video_frame_table(media, every_n=2, max_frames=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for d in range(20, 26):
        n_frames = 3 + d % 6
        want_fnos = list(range(0, n_frames, 2))[:4]
        got = sorted(by_id[d], key=lambda r: r["frame_no"])
        assert [r["frame_no"] for r in got] == want_fnos
        w, h, frames = M._decode_avi(M.synth_avi_bytes(d))
        for r in got:
            assert (r["width"], r["height"]) == (w, h)
            assert r["feature"] == pytest.approx(M._pixel_feature(frames[r["frame_no"]]), abs=1e-6)

    # a non-AVI payload contributes no frame rows
    mixed = media.unionByName(
        spark.createDataFrame(
            [(999, b"not a video", "application/octet-stream", 11),
             (998, compressed, "video/x-msvideo", len(compressed))],
            M.MEDIA_SCHEMA,
        )
    )
    got_ids = {r["media_id"] for r in M.video_frame_table(mixed).collect()}
    assert 999 not in got_ids and 998 not in got_ids and 20 in got_ids

    plan = M.video_frame_table(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_riff_odd_length_chunk_padding():
    """RIFF chunks pad to even length (the spec's easy-to-miss rule,
    shared by the WAV and AVI walkers via _riff_chunks): an odd-length
    JUNK chunk injected before the payload chunks must be skipped with
    its pad byte, leaving the decode identical."""
    import struct as st

    junk = b"JUNK" + st.pack("<I", 5) + b"abcde" + b"\x00"  # odd body + pad

    g = M.synth_avi_bytes(7)
    i = g.find(b"movi") - 8  # LIST header start
    assert g[i : i + 4] == b"LIST"
    patched = g[:i] + junk + g[i:]
    patched = b"RIFF" + st.pack("<I", len(patched) - 8) + patched[8:]
    wp, hp, fp = M._decode_avi(patched)
    wg, hg, fg = M._decode_avi(g)
    assert (wp, hp) == (wg, hg) and len(fp) == len(fg)
    assert all(np.array_equal(a, b) for a, b in zip(fp, fg))

    wv = M.synth_wav_bytes(8)
    j = wv.find(b"data")
    wpat = wv[:j] + junk + wv[j:]
    wpat = b"RIFF" + st.pack("<I", len(wpat) - 8) + wpat[8:]
    assert M._decode_wav(wpat) == M._decode_wav(wv)


def test_avi_truncated_mid_movi_and_audio_strf(spark):
    """r11 (advisor, medium + low): (a) an AVI whose headers are
    intact but whose movi payload is cut mid-frame must raise
    ValueError in _avi_frame_chunks (chunk-length FIELD alone is not
    proof the body exists) so the ingest contract holds — the frame
    table emits NO rows and the sniffing decode stubs, instead of an
    IndexError failing the whole Arrow task; (b) an AVI that also
    carries an audio stream whose strf is exactly 40 bytes
    (WAVEFORMATEXTENSIBLE) must not be misread as a BITMAPINFOHEADER
    and reject the decodable video."""
    import struct as st

    good = M.synth_avi_bytes(4)
    cut = good[:-50]  # advisor repro: headers intact, movi truncated
    with pytest.raises(ValueError):
        M._avi_frame_chunks(cut)
    assert M._decode_payload(cut) == M._fake_decode(cut)

    # full engine path: the truncated payload emits NO rows, the task
    # survives, and the good payload still decodes
    media = spark.createDataFrame(
        [(1, good, "video/x-msvideo", len(good)), (2, cut, "video/x-msvideo", len(cut))],
        M.MEDIA_SCHEMA,
    )
    got_ids = {r["media_id"] for r in M.video_frame_table(media).collect()}
    assert got_ids == {1}

    # (b) inject an audio strl (strh fccType 'auds' + 40-byte strf)
    # BEFORE the video strl inside hdrl
    def chunk(tag, body):
        return tag + st.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    # WAVEFORMATEXTENSIBLE: 40 bytes, nonzero fields everywhere a
    # BITMAPINFOHEADER misread would see biSize/biBitCount/biCompression
    wfx = st.pack("<HHIIHH", 0xFFFE, 2, 48000, 48000 * 8, 8, 32) + b"\x16\x00" + b"\x03" * 22
    assert len(wfx) == 40
    astrh = b"auds" + b"\x00" * 52
    audio_strl = lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", wfx))
    i = good.find(b"LIST", 12)
    hdrl_ln = st.unpack_from("<I", good, i + 4)[0]
    # splice the audio strl at the end of hdrl's body
    end = i + 8 + hdrl_ln
    patched = good[:end] + audio_strl + good[end:]
    patched = patched[: i + 4] + st.pack("<I", hdrl_ln + len(audio_strl)) + patched[i + 8 :]
    patched = b"RIFF" + st.pack("<I", len(patched) - 8) + patched[8:]
    wp, hp, fp = M._decode_avi(patched)
    wg, hg, fg = M._decode_avi(good)
    assert (wp, hp) == (wg, hg) and len(fp) == len(fg)
    assert all(np.array_equal(a, b) for a, b in zip(fp, fg))


def test_jpeg_fill_bytes_between_scans():
    """r11 (advisor, low): repeated 0xFF fill padding before a marker
    is legal (T.81 §B.1.1.2) — the post-scan resync must skip it
    rather than parse the second 0xFF as a marker id. Inject fill
    bytes before EOI (baseline) and before every post-scan marker of
    a progressive stream; decodes must be identical to the unpadded
    bytes."""
    grad = [[(x * 16 + (8 if (x + y) % 2 else 0)) % 256 for x in range(16)] for y in range(8)]

    def eq(a, b):
        return a[0] == b[0] and a[1] == b[1] and np.array_equal(a[2], b[2])

    base = _jpeg_bytes(16, 8, grad, gray=True)
    eoi = base.rfind(b"\xff\xd9")
    padded = base[:eoi] + b"\xff" * 3 + base[eoi:]
    assert eq(M._decode_jpeg(padded), M._decode_jpeg(base))

    prog = _jpeg_progressive_bytes(16, 8, grad, gray=True)
    # pad before every marker segment that FOLLOWS a scan (DHT/SOS/EOI)
    out = bytearray()
    i = 0
    seen_sos = False
    while i < len(prog) - 1:
        if prog[i] == 0xFF and prog[i + 1] in (0xC4, 0xDA, 0xD9) and seen_sos:
            out += b"\xff\xff"
        if prog[i] == 0xFF and prog[i + 1] == 0xDA:
            seen_sos = True
            # skip past the entropy data wholesale: copy to next DHT/EOI
        out.append(prog[i])
        i += 1
    out.append(prog[-1])
    assert eq(M._decode_jpeg(bytes(out)), M._decode_jpeg(prog))


def test_ann_kernels_all_null_batch_and_string_ids(spark):
    """r10 (advisor, low x2): (a) an Arrow batch whose embeddings are
    ALL null degrades to zero vectors (NULL-sim contract: cell =
    highest cid, score NULL) instead of crashing on an (n, 0) matrix;
    (b) the Arrow kernels' id output type follows the input id column
    — string ids survive pq_topk/ivf_topk/semantic_dedup."""
    from pyspark.sql import types as T

    from bigdata_foundation_spark.operators import similarity as S

    # (a) all-null batch through the mapInPandas cell assigner
    centroids = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    nulls = spark.createDataFrame(
        [(1, None), (2, None), (3, None)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("_v", T.ArrayType(T.DoubleType())),
            ]
        ),
    ).repartition(1)
    rows = {
        r["vec_id"]: r
        for r in S._with_cell_np(nulls, centroids, "_v", score_col="score").collect()
    }
    assert len(rows) == 3
    for r in rows.values():
        assert r["cell"] == 1 and r["score"] is None  # ties -> highest cid

    # unit check: explicit dim beats inference on an all-None column
    mat = S._np_mat([None, None], dim=4)
    assert mat.shape == (2, 4) and (mat == 0.0).all()

    # (b) string ids end-to-end
    vecs = [
        ("a", [1.0, 0.0, 0.0, 0.0]),
        ("b", [0.9, 0.1, 0.0, 0.0]),
        ("c", [0.0, 1.0, 0.0, 0.0]),
        ("d", [0.0, 0.95, 0.05, 0.0]),
        ("e", [0.0, 0.0, 1.0, 0.0]),
        ("f", [0.0, 0.0, 0.0, 1.0]),
        ("dup", [1.0, 0.0, 0.0, 0.0]),
    ]
    corpus = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = S.ivf_topk(
        corpus, corpus.filter(F.col("vec_id").isin("a", "c")), k=2, n_cells=2, n_probe=2
    ).collect()
    assert out and all(isinstance(r["query_id"], str) and isinstance(r["neighbor_id"], str) for r in out)

    pq = S.pq_topk(corpus, corpus.filter(F.col("vec_id") == "a"), k=2, m=2, n_codes=4).collect()
    assert pq and all(isinstance(r["neighbor_id"], str) for r in pq)

    sd = {r["vec_id"]: r for r in S.semantic_dedup(corpus, n_cells=2).collect()}
    assert len(sd) == len(vecs)
    # the planted exact duplicate resolves to min(string id) of its group
    grp = sorted(["a", "dup"])
    assert sd["dup"]["duplicate_of"] == grp[0] and sd["a"]["duplicate_of"] == grp[0]


# ---------------------------------------------------------------------------
# as-of / range join / deterministic sampling
# ---------------------------------------------------------------------------

def test_asof_join_backward(spark):
    from bigdata_foundation_spark.operators import relational as R

    left = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 5.0), (2, 10.0)], "k long, t double"
    )
    right = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 15.0, "b"), (3, 1.0, "z")], "k long, t double, v string"
    )
    out = R.asof_join(left, right, on=["k"], left_ts="t", right_ts="t", payload={"v": "v"})
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    # non-strict: equal ts matches; no earlier right row -> null; key 2 has no right rows
    assert got == {(1, 10.0): "a", (1, 20.0): "b", (1, 5.0): None, (2, 10.0): None}

    strict = R.asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", payload={"v": "v"}, strict=True
    )
    got_s = {(r["k"], r["t"]): r["v"] for r in strict.collect()}
    assert got_s[(1, 10.0)] is None  # strict: equal ts excluded


def test_range_join_bounds(spark):
    from bigdata_foundation_spark.operators import relational as R

    left = spark.createDataFrame([(1, 100.0)], "k long, t double")
    right = spark.createDataFrame(
        [(1, 100.0), (1, 104.9), (1, 105.0), (1, 99.0), (2, 101.0)], "k long, rt double"
    )
    out = R.range_join(
        left, right, on=["k"], right_ts="rt",
        lower=F.col("t"), upper=F.col("t") + 5.0,
    )
    got = sorted(r["rt"] for r in out.collect())
    assert got == [100.0, 104.9]  # [lower, upper): 105.0 and 99.0 excluded


def test_hash_sample_deterministic_and_sized(spark):
    from bigdata_foundation_spark.operators import relational as R

    df = spark.range(20000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in R.hash_sample(df, "k", 0.1).collect())
    b = sorted(r["k"] for r in R.hash_sample(df, "k", 0.1).collect())
    assert a == b  # reproducible across runs
    assert 0.08 < len(a) / 20000 < 0.12  # md5 buckets ~uniform
    # nested property: a 5% sample with the same salt is a subset trick
    # does NOT hold for independent thresholds — but a smaller fraction
    # of the same hash IS a subset (threshold monotonicity).
    c = set(r["k"] for r in R.hash_sample(df, "k", 0.05).collect())
    assert c.issubset(set(a))


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.com today"),
            (2, "call (415) 555-1234 or +1 415.555.9876 now"),
            (3, "server at 192.168.1.100 responded"),
            (4, "no pii here at all"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["r"] for r in df.select("id", TX.redact_pii("text").alias("r")).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[3] == "server at <IP> responded"
    assert got[4] == "no pii here at all"


def test_pack_sequences(spark):
    """Every doc packed exactly once, every bin within budget (unless a
    single oversize doc), deterministic across runs."""
    from bigdata_foundation_spark.operators import packing as P

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    budget = 512
    a = P.pack_sequences(docs, budget=budget)
    rows = a.collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in docs.select("doc_id").collect()}
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for toks in per_pack.values():
        assert sum(toks) <= budget or len(toks) == 1  # oversize doc → own bin
    # deterministic
    b = {(r["doc_id"], r["pack_id"]) for r in P.pack_sequences(docs, budget=budget).collect()}
    assert b == {(r["doc_id"], r["pack_id"]) for r in rows}
    # packing should be reasonably dense
    summary = P.pack_summary(a, budget=budget).collect()[0]
    assert summary["n_docs"] == docs.count()
    assert summary["avg_fill"] > 0.5


def test_l2_normalize_unit_norm(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    unit = S.l2_normalize(F.col("embedding"))
    norms = [r["n"] for r in e.select(S.norm(unit).alias("n")).collect()]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)


def test_upsert_semantics(spark):
    from bigdata_foundation_spark.operators import relational as R

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    updates = spark.createDataFrame([(2, "B2"), (9, "NEW")], "k long, v string")
    got = {r["k"]: r["v"] for r in R.upsert(base, updates, ["k"]).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "NEW"}
    # idempotent: re-applying the same updates changes nothing
    again = {r["k"]: r["v"] for r in R.upsert(R.upsert(base, updates, ["k"]), updates, ["k"]).collect()}
    assert again == got


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, " ".join(f"w{i}" for i in range(40))),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["r"] for r in df.select("id", TX.repetition_ratio("text").alias("r")).collect()}
    assert got[1] > 0.8  # all 3-grams identical
    assert got[2] == 0.0  # all distinct


def test_minhash_index_cross_batch(spark, tmp_path):
    """Incremental dedup: build the LSH index on batch A, query batch
    B against it — results must equal EXACTLY the cross-batch subset
    of the one-shot pipeline on A ∪ B (no bucket caps trigger at this
    size, so candidate generation is identical by construction)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "mh_idx")
    D.minhash_index_build(a, idx)
    got = {
        (r["query_id"], r["index_id"]): r["jaccard"]
        for r in D.minhash_index_query(spark, idx, b, threshold=0.5).collect()
    }
    union_pairs = D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    want = {}
    for r in union_pairs:
        ia, ib, j = r["id_a"], r["id_b"], r["jaccard"]
        if ia % 2 != ib % 2:  # cross-batch only
            q, i = (ia, ib) if ia % 2 == 1 else (ib, ia)
            want[(q, i)] = j
    assert got == want
    assert want, "sf0.01 corpus must contain at least one cross-parity near-dup"


def test_minhash_index_append(spark, tmp_path):
    """Incremental ingest: build the index on batch A, APPEND batch B
    (no corpus re-processing), query batch C — results must equal the
    cross-batch subset (C vs A ∪ B) of the one-shot pipeline on
    A ∪ B ∪ C. Also pins that append refreshed the bucket-size table:
    a stale table would mis-cap buckets whose size crossed the cap
    only after B arrived."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)
    idx = str(tmp_path / "mh_idx_app")
    D.minhash_index_build(a, idx)
    D.minhash_index_append(spark, idx, b)
    got = {
        (r["query_id"], r["index_id"]): r["jaccard"]
        for r in D.minhash_index_query(spark, idx, c, threshold=0.5).collect()
    }
    union_pairs = D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    want = {}
    for r in union_pairs:
        ia, ib, j = r["id_a"], r["id_b"], r["jaccard"]
        if (ia % 3 == 2) != (ib % 3 == 2):  # cross C-vs-(A∪B) only
            q, i = (ia, ib) if ia % 3 == 2 else (ib, ia)
            want[(q, i)] = j
    assert got == want
    assert want, "sf0.01 corpus must contain at least one cross-split near-dup"
    # size table reflects A ∪ B, not just A
    sizes = spark.read.parquet(idx + "/bucket_sizes")
    n_postings = spark.read.parquet(idx + "/bands").count()
    assert sizes.agg(F.sum("_bsize")).head()[0] == n_postings


def test_winnow_fingerprints(spark):
    """Winnowing contract (Schleimer 2003): any substring match of
    length >= w + k - 1 contributes a shared fingerprint; disjoint
    texts share nothing; fingerprints are a subset of the k-gram
    hashes (each is a window MINIMUM of them)."""
    k, w = 7, 4
    shared_passage = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [
            (1, f"unrelated preamble AAAA {shared_passage} trailing junk one"),
            (2, f"zzz different intro {shared_passage} and a different ending"),
            (3, "completely disjoint content qqq www eee rrr ttt yyy uuu"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", TX.winnow_fingerprints("text", k=k, w=w).alias("fp")
        ).collect()
    }
    assert len(shared_passage) >= w + k - 1
    assert fps[1] & fps[2], "shared passage must yield a shared fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # every fingerprint is one of the doc's k-gram hashes
    norm = "unrelated preamble aaaa " + shared_passage + " trailing junk one"
    grams = {norm[i : i + k] for i in range(max(len(norm) - (k - 1), 1))}
    gram_hashes = {
        r[0]
        for r in spark.createDataFrame([(g,) for g in grams], "g string")
        .select(F.xxhash64("g"))
        .collect()
    }
    assert fps[1] <= gram_hashes
    # short-doc edge: text shorter than k still fingerprints
    tiny = spark.createDataFrame([(9, "ab")], "doc_id long, text string")
    got = tiny.select(TX.winnow_fingerprints("text", k=k, w=w).alias("fp")).head()["fp"]
    assert len(got) == 1


def test_winnow_engine_matches_replay(spark):
    """The engine's JVM winnowing must equal the pure-Python replay
    the pinned goldens are minted from (tools/gen_pipeline_goldens) on
    arbitrary text — random strings over a small alphabet maximize
    k-gram collisions and window ties, the cases where a selection
    mismatch would hide."""
    import random
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_pipeline_goldens import winnow as py_winnow

    rng = random.Random(7)
    docs = []
    for i in range(60):
        n = rng.randrange(0, 120)
        docs.append((i, "".join(rng.choice("ab c") for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["fp"])
        for r in df.select(
            "doc_id", TX.winnow_fingerprints("text", k=5, w=3).alias("fp")
        ).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == py_winnow(text, k=5, w=3), (doc_id, text)


def test_winnow_overlap_pairs(spark):
    passage = "the quick brown fox jumps over the lazy dog tonight again"
    rows = [
        (1, f"first document with {passage} inside it"),
        (2, f"second document also contains {passage} but differs elsewhere"),
        (3, "nothing in common here at all kkk lll mmm nnn ooo ppp"),
    ]
    # boilerplate shared by EVERYONE — must be killed by the doc-freq cap
    boiler = " copyright footer all rights reserved worldwide"
    df = spark.createDataFrame(
        [(i, t + boiler) for i, t in rows], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["shared"]
        for r in TX.winnow_overlap_pairs(
            df, k=7, w=4, min_shared=2, max_doc_freq=2
        ).collect()
    }
    assert (1, 2) in got
    assert not any(3 in p for p in got), "cap must kill the all-docs boilerplate"


def test_contamination_flags(spark):
    phrase = "alpha bravo charlie delta echo"
    train = spark.createDataFrame(
        [
            (1, f"clean doc one {' '.join(f'x{i}' for i in range(10))}"),
            (2, f"this copies {phrase} wholesale plus extra words"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, f"benchmark question containing {phrase} inside")],
        "doc_id long, text string",
    )
    flagged = {r["doc_id"] for r in TX.contamination_flags(train, eval_docs, n=5).collect()}
    assert flagged == {2}
    # beyond-broadcast regime: identical answer, and no broadcast HINT
    # pinned in the plan (AQE may still broadcast a tiny test input at
    # runtime — at a 10^9-gram eval scale it won't, which is the point)
    big = TX.contamination_flags(train, eval_docs, n=5, broadcast_eval=False)
    assert {r["doc_id"] for r in big.collect()} == {2}
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()
    small = TX.contamination_flags(train, eval_docs, n=5)
    assert "ResolvedHint" in small._jdf.queryExecution().analyzed().toString()


def test_balanced_sample(spark):
    from bigdata_foundation_spark.operators import relational as R

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)], "k long, g string"
    )
    out = R.balanced_sample(df, "g", "k", 5)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 5, "small": 5}
    a = sorted(r["k"] for r in out.collect())
    b = sorted(r["k"] for r in R.balanced_sample(df, "g", "k", 5).collect())
    assert a == b  # deterministic


def test_chunk_documents_reconstruction(spark):
    """Every chunk is <= size chars; step-prefixes of consecutive chunks
    reassemble the original text; overlap region matches."""
    rows = [
        (1, "a" * 10),
        (2, "x"),
        (3, "abcdefghijklmnopqrstuvwxyz" * 20),  # 520 chars
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    size, overlap, step = 7, 3, 4
    out = TX.chunk_documents(df, size=size, overlap=overlap).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = dict(rows)
    # empty string and NULL produce a single empty/NULL-free handling:
    assert 5 not in by_doc  # NULL text -> no chunks (sequence over null)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        original = texts[doc_id] or ""
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert all(c.chunk_len == len(c.chunk_text) <= size for c in chunks)
        rebuilt = "".join(c.chunk_text[:step] for c in chunks[:-1]) + chunks[-1].chunk_text
        assert rebuilt == original
        for a, b in zip(chunks, chunks[1:]):
            if len(a.chunk_text) == size:
                assert a.chunk_text[step:] == b.chunk_text[: overlap]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TX.chunk_documents(df, size=5, overlap=5)


def test_normalize_text_unicode(spark):
    # é (decomposed) must compose to é; case folds; runs of
    # mixed whitespace collapse; outer whitespace trimmed.
    rows = [
        (1, "Café  du\tMonde\n"),
        (2, "  HELLO   world  "),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.norm_text for r in TX.normalize_text(df).collect()}
    assert got[1] == "café du monde"
    assert got[2] == "hello world"
    assert got[3] is None


def test_duplicate_clusters_transitive(spark):
    # A~B and B~C but never A~C: transitivity must still merge all
    # three; {10,11} is a separate component; pair graph with a cycle.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    from bigdata_foundation_spark.operators.dedup import duplicate_clusters

    got = {(r.node, r.cluster_id) for r in duplicate_clusters(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_duplicate_clusters_long_chain(spark):
    # A 40-node path graph: pointer jumping must converge well inside
    # max_iters (O(log diameter)), and the label must be the chain min.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    from bigdata_foundation_spark.operators.dedup import duplicate_clusters

    got = duplicate_clusters(pairs, max_iters=10)
    assert got.count() == 41
    assert {r.cluster_id for r in got.collect()} == {0}


def test_profile_columns(spark):
    from bigdata_foundation_spark.operators import relational as R

    df = spark.createDataFrame(
        [
            (1, "a", 1.234),
            (2, "b", None),
            (3, None, 2.567),
            (4, "b", 9.999),
        ],
        "k long, s string, v double",
    )
    got = {r["col_name"]: r.asDict() for r in R.profile_columns(df, ["k", "s", "v"]).collect()}
    assert set(got) == {"k", "s", "v"}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 0 and got["k"]["n_distinct"] == 4
    assert got["k"]["min_s"] == "1" and got["k"]["max_s"] == "4"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_s"] == "a" and got["s"]["max_s"] == "b"
    # doubles are rounded to 2 dp before min/max stringification
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 3
    assert got["v"]["min_s"] == "1.23" and got["v"]["max_s"] == "10.0"


def test_snapshot_diff(spark):
    from bigdata_foundation_spark.operators import relational as R

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {
        r["k"]: r.asDict()
        for r in R.snapshot_diff(old, new, keys=["k"], compare_cols=["s", "v"]).collect()
    }
    # k=2 unchanged, k=4 unchanged (null-safe: None == None) -> dropped
    assert set(got) == {1, 3, 5}
    assert got[1]["change_type"] == "deleted" and got[1]["old_s"] == "a" and got[1]["new_s"] is None
    assert got[3]["change_type"] == "changed"
    assert got[3]["old_s"] == "c" and got[3]["new_s"] == "CHANGED"
    assert got[5]["change_type"] == "added" and got[5]["new_v"] == 50


def test_gopher_filter_planted_docs(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs off "
        "to find some food for the long winter that is coming soon"
    )
    df = spark.createDataFrame(
        [
            ("good", good),
            ("too_short", "the cat sat"),
            ("no_stopwords", "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
                             "tempor incididunt ut labore et dolore magna aliqua ut enim ad minim"),
            ("symbol_heavy", "the " + "# " * 40 + "and of to in is that for with was"),
            ("ellipsis", "the first line...\nthe second line...\nthe third line...\n"
                         "and of to in is that for with was more words here to pass length"),
            ("null_text", None),
            ("empty_text", ""),
        ],
        "doc_id string, text string",
    )
    kept = TX.gopher_filter(
        df, min_words=10, min_mean_word_len=2.0, max_mean_word_len=12.0,
        min_stop_hits=2, max_ellipsis_line_frac=0.3,
    )
    assert [r["doc_id"] for r in kept.collect()] == ["good"]
    # signal columns are exposed for auditing
    row = kept.first()
    assert row["n_words"] == 25 and row["stop_hits"] >= 2
    assert row["ellipsis_line_frac"] == 0.0

    # paper defaults: the 25-word doc fails the 50-word floor
    assert TX.gopher_filter(df).count() == 0


def test_gopher_rules_signal_values(spark):
    df = spark.createDataFrame(
        [("d1", "aa bb cc dd\nend of line...\nthe plain line")],
        "doc_id string, text string",
    )
    sig = TX.gopher_rules("text")
    row = df.select(*[c.alias(n) for n, c in sig.items()]).first()
    assert row["n_words"] == 10
    # 32 word chars / 10 words (whitespace tokens keep '...' on 'line...')
    assert row["mean_word_len"] == pytest.approx(3.2)
    assert row["ellipsis_line_frac"] == pytest.approx(round(1 / 3, 6))
    assert row["stop_hits"] == 2  # 'of', 'the'
    assert row["symbol_word_ratio"] == pytest.approx(0.1)


def test_line_dedup_repeated_boilerplate(spark):
    boiler = "accept cookies to continue"
    df = spark.createDataFrame(
        [
            (1, f"unique first line\n{boiler}\nreal content one"),
            (2, f"{boiler}\nreal content two"),
            (3, f"real content three\n{boiler}"),
            (4, "entirely unique document"),
            (5, boiler),  # document that is ONLY the boilerplate line
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in TX.line_dedup(df, min_count=2).collect()}
    assert len(got) == 5  # row count preserved
    # canonical copy (min (doc_id, pos)) survives in doc 1 only
    assert got[1] == f"unique first line\n{boiler}\nreal content one"
    assert got[2] == "real content two"
    assert got[3] == "real content three"
    assert got[4] == "entirely unique document"
    assert got[5] == ""  # fully deduped doc stays, empty

    # keep_first=False removes every copy including the canonical one
    got2 = {r["doc_id"]: r["text"] for r in TX.line_dedup(df, min_count=2, keep_first=False).collect()}
    assert got2[1] == "unique first line\nreal content one"


def test_line_dedup_below_threshold_untouched(spark):
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "c\nd")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["text"] for r in TX.line_dedup(df, min_count=2).collect()}
    assert got == {1: "a\nb", 2: "c\nd"}


def test_line_dedup_preserves_blank_lines(spark):
    """Empty lines (\\n\\n paragraph separators) are structure, not
    content: every document keeps them even though '' repeats
    corpus-wide (C4/RefinedWeb practice)."""
    df = spark.createDataFrame(
        [(1, "para one\n\npara two"), (2, "other one\n\nother two"), (3, "x\n\ny")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in TX.line_dedup(df, min_count=2).collect()}
    assert got == {
        1: "para one\n\npara two",
        2: "other one\n\nother two",
        3: "x\n\ny",
    }


def test_gate_order_names_all_registered():
    """Every GATE_ORDER entry must name a registered query — a rename
    must update the gate list, and registry() must never KeyError on a
    stale entry (it skips, but that silently drops a gate slot)."""
    from bigdata_foundation_spark.queries import _REGISTRY, GATE_ORDER

    missing = [n for n in GATE_ORDER if n not in _REGISTRY]
    assert not missing, f"GATE_ORDER names not in registry: {missing}"
    dupes = [n for n in set(GATE_ORDER) if GATE_ORDER.count(n) > 1]
    assert not dupes, f"duplicate GATE_ORDER entries: {dupes}"


def test_ivf_build_query_partition_pruning(spark, vectors, tmp_path):
    """The materialized IVF index must (a) return exactly ivf_topk's
    results and (b) plan its scan with PartitionFilters on cell — the
    partition-pruning deployment where probing skips unprobed cells'
    files entirely."""
    path = str(tmp_path / "ivf_index")
    S.ivf_build(vectors, path, n_cells=8)
    qs = vectors.filter(F.col("vec_id") < 6)
    got = S.ivf_query(spark, path, qs, k=3, n_probe=2)
    want = S.ivf_topk(vectors, qs, k=3, n_cells=8, n_probe=2)
    as_rows = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"]) for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]


def test_hash_split_partitions_every_row(spark):
    """hash_split: every row lands in exactly one split, proportions
    are within binomial noise of the weights, and re-running yields
    identical assignments (engine-independent determinism)."""
    from bigdata_foundation_spark.operators import relational as R2

    df = spark.range(2000).withColumnRenamed("id", "k")
    s1 = {r["k"]: r["split"] for r in R2.hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    s2 = {r["k"]: r["split"] for r in R2.hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert s1 == s2 and len(s1) == 2000
    from collections import Counter

    c = Counter(s1.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.06 < c["val"] / 2000 < 0.14
    import pytest as _pt

    with _pt.raises(ValueError):
        R2.hash_split(df, "k", {"a": 0.5, "b": 0.4})


def test_mixture_sample_fractions(spark):
    """mixture_sample keeps ~the configured per-group fraction, drops
    unlisted groups entirely, and is deterministic."""
    from bigdata_foundation_spark.operators import relational as R2

    rows = [(i, ["web", "code", "books"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, grp string")
    out = R2.mixture_sample(df, "grp", {"web": 0.2, "code": 1.0}, "k")
    got = [(r["k"], r["grp"]) for r in out.collect()]
    grps = {g for _k, g in got}
    assert grps <= {"web", "code"}  # 'books' dropped
    n_code = sum(1 for _k, g in got if g == "code")
    n_web = sum(1 for _k, g in got if g == "web")
    assert n_code == 1000  # fraction 1.0 keeps everything
    assert 0.13 < n_web / 1000 < 0.27
    again = [(r["k"], r["grp"]) for r in R2.mixture_sample(df, "grp", {"web": 0.2, "code": 1.0}, "k").collect()]
    assert sorted(again) == sorted(got)


def test_cluster_keep_best(spark):
    """Keep-best canonicalization: within each duplicate cluster, the
    max-score member wins (ties -> min id); singletons are their own
    canonical."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    attrs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (7, 10), (8, 10)], "doc_id long, score long"
    )
    clusters = D.duplicate_clusters(pairs)
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in D.cluster_keep_best(clusters, attrs, score_col="score").collect()
    }
    # cluster {1,2,3}: scores 50/90/90 -> 2 wins the tie over 3 (min id)
    assert got[1] == (1, False) and got[2] == (1, True) and got[3] == (1, False)
    # cluster {7,8}: tie at 10 -> 7 wins
    assert got[7] == (7, True) and got[8] == (7, False)


def test_minhash_index_compact_preserves_queries(spark, tmp_path):
    """After several appends the index tables fragment into per-batch
    file sets; minhash_index_compact must rewrite each table into few
    files with query results row-identical before/after (the tables
    are unordered relations — only layout changes)."""
    import os

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "mh_idx_cmp")
    D.minhash_index_build(docs.filter(F.col("doc_id") % 4 == 0), idx)
    for m in (1, 2):
        D.minhash_index_append(spark, idx, docs.filter(F.col("doc_id") % 4 == m))
    probe = docs.filter(F.col("doc_id") % 4 == 3)

    def files(sub):
        return sum(
            1
            for f in os.listdir(f"{idx}/{sub}")
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )

    def run():
        return sorted(
            (r["query_id"], r["index_id"], r["jaccard"])
            for r in D.minhash_index_query(spark, idx, probe, threshold=0.5).collect()
        )

    before_rows, before_files = run(), files("bands")
    assert before_files >= 3  # one file set per batch
    new_counts = D.minhash_index_compact(spark, idx)
    assert set(new_counts) == {"shingles", "signatures", "bands", "bucket_sizes"}
    assert files("bands") < before_files
    assert run() == before_rows and before_rows


def test_ivf_append_matches_replay(spark, vectors, tmp_path):
    """ivf_append = FAISS add(): new vectors are cell-assigned under
    the PERSISTED centroids and appended in place. Pin (a) results
    against an independent pure-Python replay of assign→probe→rerank
    over the union with the original centroids, and (b) that the
    planted near-dup added by the append becomes findable."""
    import math

    path = str(tmp_path / "ivf_app")
    a = vectors.filter(F.col("vec_id") % 2 == 0)
    b = vectors.filter(F.col("vec_id") % 2 == 1)
    S.ivf_build(a, path, n_cells=8)
    S.ivf_append(spark, path, b)
    qs = vectors.filter(F.col("vec_id") < 6)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in S.ivf_query(spark, path, qs, k=3, n_probe=2).collect()
    )

    # independent replay with python floats
    cents = {
        int(r["cell"]): list(r["centroid"])
        for r in spark.read.parquet(path + "__centroids").collect()
    }
    rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in vectors.collect()
    }

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        return d / (math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(x * x for x in v)))

    cell_of = {
        vid: max((cos(v, cv), cid) for cid, cv in cents.items())[1]
        for vid, v in rows.items()
    }
    want = []
    for qid in sorted(vid for vid in rows if vid < 6):
        probed = [
            cid
            for _s, cid in sorted(
                ((cos(rows[qid], cv), cid) for cid, cv in cents.items()), reverse=True
            )[:2]
        ]
        cand = [n for n, c in cell_of.items() if c in probed and n != qid]
        scored = sorted(
            ((round(cos(rows[qid], rows[n]), 6), n) for n in cand),
            key=lambda t: (-t[0], t[1]),
        )
        for rk, (cs, n) in enumerate(scored[:3], start=1):
            want.append((qid, n, cs, rk))
    assert got == sorted(want)
    # vec 500 (odd batch, planted near-dup of vec 0) is now vec 0's top hit
    top = [r for r in got if r[0] == 0 and r[3] == 1]
    assert top and top[0][1] == 500


def test_lsh_multiprobe_recall(vectors):
    """Multi-probe LSH (Lv 2007): probing each band key's 1-bit flips
    must strictly dominate exact-key probing — measured 0.4 → 0.9
    top-3 recall vs brute on this fixture — while the corpus side is
    hashed identically (only the broadcast query side fans out)."""
    qs = vectors.filter(F.col("vec_id") < 10)
    brute = {(r["query_id"], r["neighbor_id"]) for r in S.brute_topk(vectors, qs, k=3).collect()}
    single = {(r["query_id"], r["neighbor_id"]) for r in S.lsh_topk(vectors, qs, k=3).collect()}
    multi = {(r["query_id"], r["neighbor_id"]) for r in S.lsh_topk(vectors, qs, k=3, multi_probe=1).collect()}
    r_single = len(brute & single) / len(brute)
    r_multi = len(brute & multi) / len(brute)
    assert r_multi >= r_single
    assert r_multi >= 0.8, (r_single, r_multi)
    assert (0, 500) in multi  # planted near-dup always found


def test_operators_tolerate_empty_and_degenerate_text(spark):
    """Edge-input contract sweep: every dedup/text operator must run
    (not crash) on an EMPTY table and on null / empty-string /
    whitespace-only / emoji text, with documented semantics —
    contentless docs never produce fuzzy pairs (they carry no
    shingles/tokens/n-grams; exact dedup is the operator for them),
    and profile/analyze keep one output row per input row / slice."""
    empty = spark.createDataFrame([], "doc_id long, text string, lang string, source string")
    weird = spark.createDataFrame(
        [
            (1, None, "en", "s"),
            (2, "", "en", "s"),
            (3, "🦊 the quick 🦊 fox", "en", "s"),
            (4, "   ", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    assert D.exact_dedup(empty).count() == 0
    assert D.minhash_lsh_pairs(empty).count() == 0
    assert D.simhash_pairs(empty).count() == 0
    assert D.ngram_jaccard_pairs(empty).count() == 0
    assert D.duplicate_clusters(spark.createDataFrame([], "id_a long, id_b long")).count() == 0
    assert TX.corpus_profile(empty).count() == 0

    assert D.exact_dedup(weird).count() == 4  # all texts distinct after normalize
    assert D.minhash_lsh_pairs(weird).count() == 0
    assert D.simhash_pairs(weird).count() == 0
    # the zero-token guard: contentless docs must NOT pair at jaccard 1.0
    assert D.ngram_jaccard_pairs(weird).count() == 0
    assert TX.analyze(weird).count() == 4
    prof = TX.corpus_profile(weird).first()
    assert prof["n_docs"] == 4 and prof["n_exact_dups"] == 0


def test_embedding_ops_tolerate_degenerate_vectors(spark):
    """Under Spark 4's default ANSI mode a single zero-norm embedding
    (padding row, failed encoder output) used to kill the whole job
    with DIVIDE_BY_ZERO inside cosine. Contract now: cosine is TOTAL —
    degenerate (zero/null) vectors yield NULL similarity and silently
    drop from top-k results and threshold pairs; l2_normalize returns
    a zero vector unchanged; well-formed rows are unaffected."""
    rows = [(0, [1.0] * 8), (1, [0.0] * 8), (2, [0.5] * 8), (3, None), (4, [2.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = S.brute_topk(df, df, k=3, vec_col="embedding").collect()
    ids = {r["neighbor_id"] for r in out} | {r["query_id"] for r in out}
    assert 1 not in ids and 3 not in ids  # degenerate rows absent both sides
    top = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out}
    assert top[(0, 1)] in (2, 4) and top[(2, 1)] in (0, 4)  # parallel vectors, cos 1.0

    pairs = S.embedding_neardup_pairs(df, threshold=0.9, method="exact").collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 2), (0, 4), (2, 4)}

    normed = {
        r["vec_id"]: r["n"]
        for r in df.filter(F.col("embedding").isNotNull())
        .select("vec_id", S.l2_normalize(F.col("embedding")).alias("n"))
        .collect()
    }
    assert normed[1] == [0.0] * 8  # zero vector unchanged, no crash
    assert abs(sum(x * x for x in normed[0]) - 1.0) < 1e-9


def test_minhash_lsh_block_cols(spark):
    """Equality blocking for MinHash-LSH: identical texts in different
    blocks (e.g. languages) must NOT pair when block_cols is set, and
    the unblocked result is unchanged by the feature's default."""
    rows = [
        (1, BASE, "en"),
        (2, BASE, "de"),           # same text, different lang
        (3, BASE + " extra", "en"),  # near-dup of 1, same lang
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    unblocked = _pairs(D.minhash_lsh_pairs(df, threshold=0.5))
    assert unblocked == {(1, 2), (1, 3), (2, 3)}
    blocked = _pairs(D.minhash_lsh_pairs(df, threshold=0.5, block_cols=["lang"]))
    assert blocked == {(1, 3)}


def test_duplicate_clusters_high_diameter_converges_or_raises(spark):
    """Round-6 regression (real bug): per-node min-label relabeling
    without root hooking crawled a few hops per superstep — 79 rounds
    on the CSV7 road graph — and max_iters=50 SILENTLY returned a
    split component. The star-merge (hooking) rewrite must converge a
    300-node path (diameter 300) well inside the default budget with
    shuffled labels (min id in the middle), and exhausting max_iters
    must raise, never return a partial labelling."""
    import pytest as _pytest

    from bigdata_foundation_spark.operators.dedup import duplicate_clusters

    # path over a shuffled id alphabet: zero-padded so string order is
    # value order; place the minimum mid-path to stress propagation
    # both directions.
    import random

    rng = random.Random(5)
    ids = [f"d{i:04d}" for i in range(301)]
    rng.shuffle(ids)
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(300)], "id_a string, id_b string"
    )
    got = duplicate_clusters(pairs, max_iters=12)
    rows = got.collect()
    assert len(rows) == 301
    assert {r.cluster_id for r in rows} == {"d0000"}

    with _pytest.raises(RuntimeError, match="still changing"):
        duplicate_clusters(pairs, max_iters=1)


def test_corpus_profile_approx_within_hll_bounds(spark):
    """r5 verdict task 6: the corpus_profile scale switch is a
    parameter, not a comment. exact=False must (a) keep every
    non-distinct column bit-identical to the exact card, and (b) keep
    n_exact_dups within HLL++ bounds of exact (rsd 2%; allow 5 sigma
    on the distinct estimate) for every slice at sf0.01."""
    from bigdata_foundation_spark.operators.text import corpus_profile

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    key = lambda r: tuple(r[c] for c in ("lang", "source"))
    exact = {key(r): r.asDict() for r in corpus_profile(docs, exact=True).collect()}
    approx = {key(r): r.asDict() for r in corpus_profile(docs, exact=False).collect()}
    assert set(exact) == set(approx) and len(exact) > 10
    for k, e in exact.items():
        a = approx[k]
        for c in ("n_docs", "n_tokens_ws", "avg_chars", "min_chars", "max_chars"):
            assert a[c] == e[c], (k, c)
        d_exact = e["n_docs"] - e["n_exact_dups"]
        d_approx = a["n_docs"] - a["n_exact_dups"]
        assert abs(d_approx - d_exact) <= max(5, 5 * 0.02 * d_exact), (k, d_exact, d_approx)


def test_np_kernels_match_hof_off_ties(spark):
    """r9 (r8 verdict task 1): the Arrow-vectorized numpy ANN kernels
    and the retained HOF expression forms are CROSS-ORACLES — cell
    assignments and PQ codes agree everywhere except floating
    NEAR-TIES (numpy's pairwise summation vs the HOF fold's strict
    left-to-right order differ by ~1e-16 relative), and the raw
    sims/ADC-table values agree to 1e-9. Any disagreement must be
    adjudicated as a tie by the value gap, and ties must be rare."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = S._centroids_from(emb, 8, "vec_id", "embedding")

    base = emb.select("vec_id", S._as_double(F.col("embedding")).alias("_v"))
    hof_cells = {
        r["vec_id"]: r["cell"]
        for r in base.withColumn(
            "cell", F.array_max(S._cell_scores(F.col("_v"), cents))["cid"]
        ).collect()
    }
    np_cells = {
        r["vec_id"]: r["cell"]
        for r in S._with_cell_np(base, cents, "_v").select("vec_id", "cell").collect()
    }
    rows = sorted(
        (r["vec_id"], list(r["embedding"])) for r in emb.select("vec_id", "embedding").collect()
    )
    V = S._np_mat([v for _, v in rows])
    C = S._np_mat([cv for _, cv in sorted(cents)])
    sims = S._np_cell_sims(V, C)
    n_tie = 0
    for i, (vid, _v) in enumerate(rows):
        a, b = hof_cells[vid], np_cells[vid]
        if a != b:
            n_tie += 1
            assert abs(sims[i][a] - sims[i][b]) < 1e-9, (vid, a, b)
    assert n_tie <= max(2, len(rows) // 100), n_tie  # disagreement must be rare

    # PQ: codes cross-check + table values within 1e-9
    books = S._pq_codebooks(emb, "vec_id", "embedding", 8, 8, 4096, 2)
    hof_codes = {
        r["vec_id"]: list(r["_codes"])
        for r in base.withColumn("_codes", S._pq_encode(F.col("_v"), books)).collect()
    }
    B = S._np_books(books)
    npc = S._np_pq_encode(V, B)
    d = B[0].shape[1]
    for i, (vid, _v) in enumerate(rows):
        for j in range(len(B)):
            a, b = hof_codes[vid][j], int(npc[i][j])
            if a != b:
                dists = S._np_pq_dists(V[i : i + 1, j * d : (j + 1) * d], B[j])[0]
                assert abs(dists[a] - dists[b]) < 1e-9, (vid, j, a, b)
    hof_tbl = {
        r["vec_id"]: [list(t) for t in r["_tbl"]]
        for r in base.limit(8).withColumn("_tbl", S._pq_tables(F.col("_v"), books)).collect()
    }
    for vid, tbl in hof_tbl.items():
        i = next(k for k, (v2, _) in enumerate(rows) if v2 == vid)
        want = S._np_pq_tables(V[i : i + 1], B)[0]
        assert np.allclose(tbl, want, atol=1e-9), vid


def test_pq_topk_quality_and_determinism(spark):
    """PQ-ADC (round 6): (a) determinism — identical output across
    corpus partitionings (the sample/codebook/encode chain is
    hash-deterministic); (b) quality — recall@5 vs exact L2 well above
    the ~0.01 chance baseline, and the returned neighbors' TRUE mean
    squared distance far below the corpus mean (the ranking is
    genuinely distance-guided even where iid-random vectors cap recall
    via distance concentration); (c) adc is a plausible squared-L2
    surrogate: non-negative everywhere."""
    import numpy as np
    import pyarrow.parquet as pqt

    from bigdata_foundation_spark.operators import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)
    res = S.pq_topk(e, qs, k=5).collect()
    res2 = S.pq_topk(e.repartition(7), qs, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, res)) == sorted(map(tuple, res2))
    assert len(res) == 20 * 5
    assert all(r["adc"] >= 0.0 for r in res)
    assert all(r["query_id"] != r["neighbor_id"] for r in res)

    t = pqt.read_table("/root/testdata/sf0.01/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    X = np.asarray([list(v) for v in t.column("embedding").to_pylist()], dtype=np.float64)
    idx = {v: i for i, v in enumerate(ids)}
    recalls, true_d, base_d = [], [], []
    for qid in range(20):
        qv = X[idx[qid]]
        d2 = ((X - qv) ** 2).sum(axis=1)
        d2[idx[qid]] = np.inf
        exact = set(np.asarray(ids)[np.argsort(d2, kind="stable")[:5]].tolist())
        got = [r["neighbor_id"] for r in res if r["query_id"] == qid]
        recalls.append(len(exact & set(got)) / 5)
        true_d.extend(d2[idx[g]] for g in got)
        base_d.append(float(np.median(d2[np.isfinite(d2)])))
    assert float(np.mean(recalls)) >= 0.15, np.mean(recalls)  # ~20x chance
    # measured 0.78x on this corpus; chance would be ~1.0x
    assert float(np.mean(true_d)) < 0.85 * float(np.mean(base_d))


def test_ivf_pq_beats_pq_alone_recall(spark):
    """IVF×PQ (r7, verdict item 1) — the recall contract of the
    composition, both deterministic so the bounds are exact pins:

    (a) on the iid-random sf0.01 embeddings, IVF×PQ at n_probe=4/16
    SCANS A QUARTER of the code rows yet matches raw-PQ's recall@5 vs
    exact L2 (measured 0.25 vs 0.25) — equal recall at 4× less scan;

    (b) on a genuinely clustered corpus (the regime real embeddings
    live in), residual encoding uses the same 8-byte budget on the
    WITHIN-cell spread, doubling recall over raw-vector PQ (measured
    0.267 vs 0.133)."""
    import random

    import numpy as np
    import pyarrow.parquet as pqt

    def recall(res, X, ids, nq):
        idx = {v: i for i, v in enumerate(ids)}
        recs = []
        for qid in range(nq):
            qv = X[idx[qid]]
            d2 = ((X - qv) ** 2).sum(axis=1)
            d2[idx[qid]] = np.inf
            exact = set(np.asarray(ids)[np.argsort(d2, kind="stable")[:5]].tolist())
            got = [r["neighbor_id"] for r in res if r["query_id"] == qid]
            recs.append(len(exact & set(got)) / 5)
        return float(np.mean(recs))

    # (a) iid corpus: parity at quarter scan
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)
    t = pqt.read_table("/root/testdata/sf0.01/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    X = np.asarray([list(v) for v in t.column("embedding").to_pylist()], dtype=np.float64)
    r_pq = recall(S.pq_topk(e, qs, k=5).collect(), X, ids, 20)
    r_ivfpq = recall(S.ivf_pq_topk(e, qs, k=5, n_cells=16, n_probe=4).collect(), X, ids, 20)
    assert r_ivfpq >= r_pq - 0.05, (r_ivfpq, r_pq)

    # (b) clustered corpus: residual encoding wins outright
    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(8)]
    rows = [(i, [x + rng.gauss(0, 0.15) for x in centers[i % 8]]) for i in range(1000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cq = df.filter(F.col("vec_id") < 12)
    cX = np.asarray([v for _, v in rows])
    cids = [i for i, _ in rows]
    c_pq = recall(S.pq_topk(df, cq, k=5).collect(), cX, cids, 12)
    c_ivfpq = recall(S.ivf_pq_topk(df, cq, k=5, n_cells=16, n_probe=4).collect(), cX, cids, 12)
    assert c_ivfpq >= c_pq + 0.1, (c_ivfpq, c_pq)


def test_ivf_pq_refine_improves_recall_and_is_exact(spark):
    """The refine tail (FAISS IndexRefineFlat): re-ranking the ADC
    shortlist on true vectors (a) never loses recall vs ADC-only
    ranking at the same probe width, and strictly gains on the sf0.01
    corpus (the quantization bias it removes is what caps ADC recall);
    (b) returns the TRUE squared L2 in ``dist`` (checked against
    numpy to 6 dp) — the downstream consumer can threshold on it,
    unlike the ``adc`` surrogate; (c) is partition-deterministic."""
    import numpy as np
    import pyarrow.parquet as pqt

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)
    t = pqt.read_table("/root/testdata/sf0.01/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    idx = {v: i for i, v in enumerate(ids)}
    X = np.asarray([list(v) for v in t.column("embedding").to_pylist()], dtype=np.float64)

    def recall(res, nq):
        recs = []
        for qid in range(nq):
            d2 = ((X - X[idx[qid]]) ** 2).sum(axis=1)
            d2[idx[qid]] = np.inf
            exact = set(np.asarray(ids)[np.argsort(d2, kind="stable")[:5]].tolist())
            got = [r["neighbor_id"] for r in res if r["query_id"] == qid]
            recs.append(len(exact & set(got)) / 5)
        return float(np.mean(recs))

    plain = S.ivf_pq_topk(e, qs, k=5).collect()
    refined = S.ivf_pq_refine_topk(e, qs, k=5, shortlist=20).collect()
    r_plain, r_ref = recall(plain, 20), recall(refined, 20)
    assert r_ref >= r_plain, (r_ref, r_plain)
    assert r_ref > r_plain + 0.1, (r_ref, r_plain)  # measured 0.48 vs 0.25

    for r in refined:
        true_d2 = float(((X[idx[r["query_id"]]] - X[idx[r["neighbor_id"]]]) ** 2).sum())
        assert abs(r["dist"] - round(true_d2, 6)) < 1e-6, r

    again = S.ivf_pq_refine_topk(e.repartition(7), qs, k=5, shortlist=20).collect()
    assert sorted(map(tuple, refined)) == sorted(map(tuple, again))


def test_ivf_pq_query_refine_matches_inline(spark, vectors, tmp_path):
    """The materialized-index refine path (probe = partition pruning,
    candidates re-ranked against the SOURCE table) returns exactly the
    inline ivf_pq_refine_topk rows with the same parameters."""
    path = str(tmp_path / "ivfpq_ref_index")
    S.ivf_pq_build(vectors, path, n_cells=8, m=8, n_codes=16)
    qs = vectors.filter(F.col("vec_id") < 6)
    got = S.ivf_pq_query_refine(spark, path, qs, vectors, k=3, shortlist=10, n_probe=2)
    want = S.ivf_pq_refine_topk(
        vectors, qs, k=3, shortlist=10, n_cells=8, n_probe=2, m=8, n_codes=16
    )
    as_rows = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["dist"], r["rank"]) for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)


def test_ivf_pq_determinism_and_self_exclusion(spark):
    """IVF×PQ output is identical across corpus partitionings (the
    centroid/codebook/encode chain is hash-deterministic, same
    contract as pq_topk) and never returns a self-match; adc is a
    squared-L2 surrogate: non-negative."""
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 8)
    a = S.ivf_pq_topk(e, qs, k=5).collect()
    b = S.ivf_pq_topk(e.repartition(7), qs, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 8 * 5
    assert all(r["adc"] >= 0.0 for r in a)
    assert all(r["query_id"] != r["neighbor_id"] for r in a)


def test_ivf_pq_build_query_matches_inline(spark, vectors, tmp_path):
    """The materialized IVF×PQ index returns exactly ivf_pq_topk's
    rows with the same parameters — training + encoding paid once,
    probe = partition pruning (plan pinned in test_plans.py)."""
    path = str(tmp_path / "ivfpq_index")
    S.ivf_pq_build(vectors, path, n_cells=8, m=8, n_codes=16)
    qs = vectors.filter(F.col("vec_id") < 6)
    got = S.ivf_pq_query(spark, path, qs, k=3, n_probe=2)
    want = S.ivf_pq_topk(vectors, qs, k=3, n_cells=8, n_probe=2, m=8, n_codes=16)
    as_rows = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["adc"], r["rank"]) for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]


def test_ivf_pq_append_equals_union_encode(spark, vectors, tmp_path):
    """ivf_pq_append = FAISS IndexIVFPQ.add (r8 — the lifecycle plain
    IVF got in r7): new vectors are cell-assigned and residual-encoded
    under the PERSISTED centroids/codebooks and appended in place.
    Queries after the append equal encoding the stored-∪-new corpus
    with the original (half-A-trained) parameters, and the appended
    ids are findable through the pruned probe path."""
    from bigdata_foundation_spark.operators.similarity import (
        _adc_rank,
        _ivf_pq_corpus_codes,
        _ivf_pq_load,
        _ivf_pq_probe_tables,
    )

    path = str(tmp_path / "ivfpq_app")
    a = vectors.filter(F.col("vec_id") % 2 == 0)
    b = vectors.filter(F.col("vec_id") % 2 == 1)
    S.ivf_pq_build(a, path, n_cells=8, m=8, n_codes=16)
    S.ivf_pq_append(spark, path, b)
    qs = vectors.filter(F.col("vec_id") < 6)
    as_rows = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["adc"], r["rank"]) for r in df.collect()
    )
    got = as_rows(S.ivf_pq_query(spark, path, qs, k=3, n_probe=2))

    cents, books = _ivf_pq_load(spark, path)
    c = _ivf_pq_corpus_codes(vectors, cents, books, "vec_id", "embedding")
    q = _ivf_pq_probe_tables(qs, cents, books, 2, "vec_id", "embedding")
    joined = (
        F.broadcast(q).join(c, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    )
    want = as_rows(_adc_rank(joined, len(books), 3))
    assert got == want and got
    # appended (odd-id) vectors actually surface as neighbors
    assert any(nid % 2 == 1 for _q, nid, _a, _r in got)


def test_ivf_pq_compact_preserves_queries(spark, vectors, tmp_path):
    """ivf_compact over an ivf_pq_build index (r8): append
    fragmentation coalesces, the cell partition layout (and pruning)
    survives, centroids/codebooks are untouched, and ADC queries are
    row-identical before/after — mirroring
    test_ivf_compact_preserves_queries for the composed index."""
    import os

    path = str(tmp_path / "ivfpq_cmp")
    thirds = [vectors.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    S.ivf_pq_build(thirds[0], path, n_cells=8, m=8, n_codes=16)
    for part in thirds[1:]:
        S.ivf_pq_append(spark, path, part)
    qs = vectors.filter(F.col("vec_id") < 6)

    def files(cell_dir):
        return sum(
            1
            for f in os.listdir(cell_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )

    cell_dirs = [
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("cell=")
    ]
    before_files = sum(files(d) for d in cell_dirs)

    def run():
        return sorted(
            (r["query_id"], r["neighbor_id"], r["adc"], r["rank"])
            for r in S.ivf_pq_query(spark, path, qs, k=3, n_probe=2).collect()
        )

    before_rows = run()
    S.ivf_compact(spark, path)
    after_dirs = [
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("cell=")
    ]
    assert sorted(after_dirs) == sorted(cell_dirs)
    assert sum(files(d) for d in after_dirs) < before_files
    assert run() == before_rows and before_rows
    plan = (
        S.ivf_pq_query(spark, path, qs, k=3, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_ivf_compact_preserves_queries(spark, vectors, tmp_path):
    """ivf_compact (r7, verdict item 5 — the lifecycle step MinHash
    already has): after appends fragment the cell directories into
    per-batch file sets, compaction coalesces each cell's files,
    PRESERVES the cell partition layout (pruning keeps working), and
    queries are row-identical before/after. Works on both ivf_build
    and ivf_pq_build indexes; centroids/codebooks untouched."""
    import os

    path = str(tmp_path / "ivf_cmp")
    thirds = [vectors.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    S.ivf_build(thirds[0], path, n_cells=8)
    for part in thirds[1:]:
        S.ivf_append(spark, path, part)
    qs = vectors.filter(F.col("vec_id") < 6)

    def files(cell_dir):
        return sum(
            1
            for f in os.listdir(cell_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )

    cell_dirs = [
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("cell=")
    ]
    before_files = sum(files(d) for d in cell_dirs)

    def run():
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
            for r in S.ivf_query(spark, path, qs, k=3, n_probe=2).collect()
        )

    before_rows = run()
    counts = S.ivf_compact(spark, path)
    after_dirs = [
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("cell=")
    ]
    assert sorted(after_dirs) == sorted(cell_dirs)  # partition layout preserved
    assert sum(files(d) for d in after_dirs) < before_files
    assert sum(counts.values()) == len(after_dirs)  # one file per small cell
    assert run() == before_rows and before_rows
    # plan still prunes partitions after the rewrite
    plan = (
        S.ivf_query(spark, path, qs, k=3, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_semantic_dedup_semantics_and_determinism(spark):
    """SemDeDup (round 6): a planted exact-duplicate embedding is
    caught (same cell, cosine 1.0 >= 0.95) and the lower id survives;
    every kept/duplicate_of assignment is internally consistent
    (duplicate_of <= vec_id for losers, kept rows point at
    themselves); output is deterministic across partitionings; the
    candidate join is cell-keyed, never a cartesian, never Python."""
    from bigdata_foundation_spark.operators import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    # plant an exact duplicate of vec 3 under a fresh max id
    clone = e.filter(F.col("vec_id") == 3).select(
        F.lit(100000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = e.unionByName(clone)
    res = {r["vec_id"]: r for r in S.semantic_dedup(corpus).collect()}
    assert len(res) == 501
    assert res[100000]["duplicate_of"] == 3 and not res[100000]["is_kept"]
    assert res[3]["is_kept"] and res[3]["duplicate_of"] == 3
    for r in res.values():
        assert r["is_kept"] == (r["duplicate_of"] == r["vec_id"])
        assert r["duplicate_of"] <= r["vec_id"]

    res2 = {r["vec_id"]: tuple(r) for r in S.semantic_dedup(corpus.repartition(7)).collect()}
    assert {k: tuple(v) for k, v in res.items()} == res2

    plan = S.semantic_dedup(e)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_fertility_semantics(spark):
    """Fertility audit (r7): with NO merges every word costs
    len(word)+1 tokens (chars + </w>), so fertility is exactly
    (total chars-in-words + n_words)/n_words per group — checked on a
    hand corpus; groups aggregate independently; ratios are 6-dp."""
    rows = [
        (0, "ab ab", "s1"),
        (1, "abcd", "s1"),
        (2, "a a a", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in TX.bpe_fertility(df, merges=[]).collect()}
    # s1: words ab,ab,abcd -> tokens (2+1)+(2+1)+(4+1)=11, words 3, chars 5+4=9
    assert got["s1"]["n_docs"] == 2
    assert got["s1"]["n_words"] == 3
    assert got["s1"]["n_bpe_tokens"] == 11
    assert got["s1"]["n_chars"] == 9
    assert abs(got["s1"]["fertility"] - round(11 / 3, 6)) < 1e-9
    assert abs(got["s1"]["tokens_per_char"] - round(11 / 9, 6)) < 1e-9
    # s2: a a a -> 3*(1+1)=6 tokens, 3 words, 5 chars
    assert got["s2"]["n_bpe_tokens"] == 6 and got["s2"]["n_words"] == 3
    # with the ('a','</w>') merge trained in, s2's fertility halves
    merges = [("a", "</w>")]
    got2 = {r["source"]: r for r in TX.bpe_fertility(df, merges=merges).collect()}
    assert got2["s2"]["n_bpe_tokens"] == 3
    assert abs(got2["s2"]["fertility"] - 1.0) < 1e-9


def test_rfm_segmentation_semantics(spark):
    """RFM (r7): recency anchored to the dataset max date; scores are
    ntile quintiles with 5 = best (most recent / most frequent /
    biggest spender); deterministic under repartition."""
    rows = []
    oid = 0
    # customer c gets c orders, each of 10*c value, last order day c
    for c in range(1, 11):
        for j in range(c):
            oid += 1
            rows.append((oid, c, f"2024-01-{c:02d} 00:00:00", 10.0 * c))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    got = {r["o_custkey"]: r for r in R.rfm_segmentation(df).collect()}
    assert got[10]["recency_days"] == 0 and got[1]["recency_days"] == 9
    assert got[10]["frequency"] == 10 and got[10]["monetary"] == 1000.0
    # customer 10 is best on all three axes; customer 1 worst on all
    assert (got[10]["r_score"], got[10]["f_score"], got[10]["m_score"]) == (5, 5, 5)
    assert (got[1]["r_score"], got[1]["f_score"], got[1]["m_score"]) == (1, 1, 1)
    assert got[10]["rfm_cell"] == 555 and got[1]["rfm_cell"] == 111
    again = {r["o_custkey"]: tuple(r) for r in R.rfm_segmentation(df.repartition(7)).collect()}
    assert {k: tuple(v) for k, v in got.items()} == again


def test_funnel_and_retention_semantics(spark):
    """Funnel (r7): strict first-touch ordering — a step-2 event
    BEFORE step 1 doesn't count, a later step-1 never resets; stage =
    furthest consecutive step. Retention (r7): cohort = first activity
    date, week buckets floor(days/7), distinct users per cell."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "signup"),
        (2, "2024-01-01 09:00:00", 1, "view"),    # view BEFORE signup: ignored
        (3, "2024-01-02 10:00:00", 1, "view"),    # counts (after signup)
        (4, "2024-01-02 09:00:00", 1, "click"),   # click before view-touch: ignored
        (5, "2024-01-03 10:00:00", 2, "view"),    # user 2 never signed up
        (6, "2024-01-09 10:00:00", 1, "click"),   # week 1 activity + stage 3
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in R.funnel_stages(
        df, ["signup", "view", "click", "purchase"]).collect()}
    assert got[1]["stage"] == 3
    assert str(got[1]["t1"]) == "2024-01-01 10:00:00"
    assert str(got[1]["t2"]) == "2024-01-02 10:00:00"
    assert str(got[1]["t3"]) == "2024-01-09 10:00:00"
    assert got[1]["t4"] is None
    assert got[2]["stage"] == 0 and got[2]["t1"] is None

    ret = sorted(
        (r["cohort_date"], r["week_offset"], r["n_users"])
        for r in R.retention_cohorts(df).collect()
    )
    # user 1 cohort 01-01: active days 01,02 (wk0) and 09 (wk1); user 2 cohort 01-03 wk0
    assert ret == [
        ("2024-01-01", 0, 1),
        ("2024-01-01", 1, 1),
        ("2024-01-03", 0, 1),
    ]


def test_sessionize_gap_semantics(spark):
    """Batch sessionization (r7): an exactly-at-gap event continues
    the session (strict > gap opens one); sessions number per key in
    time order; value totals are 2-dp; partition-count invariant."""
    rows = [
        (1, "2024-01-01 10:00:00", 7, 1.0),
        (2, "2024-01-01 10:30:00", 7, 2.0),   # exactly 30 min -> same session
        (3, "2024-01-01 11:00:01", 7, 4.0),   # 30m01s -> new session
        (4, "2024-01-01 09:00:00", 8, 8.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = sorted(
        (r["user_id"], r["session_id"], str(r["session_start"]), r["n_events"], r["total_value"])
        for r in R.sessionize(df, "user_id", "ts", "event_id", 30, "value").collect()
    )
    assert got == [
        (7, 1, "2024-01-01 10:00:00", 2, 3.0),
        (7, 2, "2024-01-01 11:00:01", 1, 4.0),
        (8, 1, "2024-01-01 09:00:00", 1, 8.0),
    ]
    got2 = sorted(
        (r["user_id"], r["session_id"], str(r["session_start"]), r["n_events"], r["total_value"])
        for r in R.sessionize(df.repartition(3), "user_id", "ts", "event_id", 30, "value").collect()
    )
    assert got2 == got


def test_scd2_history_semantics(spark):
    """SCD2 build (r7): on a hand-built changelog — repeats extend the
    open version, changes close it at the next start, versions chain
    gaplessly (valid_to == next valid_from), exactly one current row
    per key (high-date sentinel), n_events counts the run length,
    same-timestamp changes order by the tiebreak column; result is
    partition-count invariant."""
    rows = [
        (1, "2024-01-01 10:00:00", 100, "a"),
        (2, "2024-01-01 11:00:00", 100, "a"),  # repeat -> same version
        (3, "2024-01-01 12:00:00", 100, "b"),  # change -> v2
        (4, "2024-01-01 12:00:00", 100, "c"),  # same ts as id 3: tiebreak -> v3
        (5, "2024-01-02 09:00:00", 200, "x"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = R.scd2_history(df, "user_id", "event_type", "ts", "event_id")
    res = sorted(
        (r["user_id"], r["version"], r["event_type"], str(r["valid_from"]),
         str(r["valid_to"]), r["n_events"], r["is_current"])
        for r in got.collect()
    )
    assert res == [
        (100, 1, "a", "2024-01-01 10:00:00", "2024-01-01 12:00:00", 2, False),
        (100, 2, "b", "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1, False),
        (100, 3, "c", "2024-01-01 12:00:00", "2261-12-31 00:00:00", 1, True),
        (200, 1, "x", "2024-01-02 09:00:00", "2261-12-31 00:00:00", 1, True),
    ]
    res2 = sorted(
        (r["user_id"], r["version"], r["event_type"], str(r["valid_from"]),
         str(r["valid_to"]), r["n_events"], r["is_current"])
        for r in R.scd2_history(df.repartition(5), "user_id", "event_type", "ts", "event_id").collect()
    )
    assert res2 == res


def test_unimax_mixture_waterfill_semantics(spark):
    """UniMax (r7): on a skewed corpus the allocation (a) conserves
    the budget exactly when the budget is below the cap sum, (b) caps
    exactly the smallest groups at max_epochs and gives every uncapped
    group the SAME level t, (c) degrades to cap-for-everyone when the
    budget exceeds the cap sum; values match an independent in-test
    water-fill replay."""
    rows = []
    did = 0
    for grp, ndocs, tok in [("a", 2, "x y z"), ("b", 4, "x y z w"), ("c", 20, "x y z w q")]:
        for _ in range(ndocs):
            rows.append((did, tok, grp))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # token counts: a=6, b=16, c=100; caps(me=2)=12,32,200; total=122
    got = {
        r["source"]: r
        for r in TX.unimax_mixture(df, budget_frac=1.0, max_epochs=2.0).collect()
    }
    n = {"a": 6.0, "b": 16.0, "c": 100.0}
    caps = {g: 2.0 * v for g, v in n.items()}
    B = 122.0
    t = max(
        (B - sum(sorted(caps.values())[:j])) / (3 - j)
        for j in range(3)
    )
    want_alloc = {g: min(caps[g], t) for g in n}
    assert abs(sum(want_alloc.values()) - B) < 1e-9  # replay conserves budget
    for g in n:
        assert abs(got[g]["allocation"] - round(want_alloc[g], 6)) < 1e-9, (g, got[g])
        assert got[g]["n_tokens"] == int(n[g])
        assert got[g]["capped"] == (caps[g] <= t)
    assert got["a"]["capped"] and got["b"]["capped"] and not got["c"]["capped"]
    assert abs(got["a"]["epochs"] - 2.0) < 1e-9
    assert abs(sum(r["allocation"] for r in got.values()) - B) < 1e-6

    # budget above the cap sum: everyone gets exactly their cap
    big = {
        r["source"]: r
        for r in TX.unimax_mixture(df, budget_frac=3.0, max_epochs=2.0).collect()
    }
    for g in n:
        assert abs(big[g]["allocation"] - caps[g]) < 1e-9
        assert big[g]["capped"]

    # zero-token group: epochs pinned to 0, so capped must be False
    # (its cap 0 <= t always — the flag gates on mass)
    withz = df.union(spark.createDataFrame([(99, "", "z")], df.schema))
    z = {r["source"]: r for r in TX.unimax_mixture(withz, budget_frac=1.0, max_epochs=2.0).collect()}
    assert z["z"]["n_tokens"] == 0 and z["z"]["epochs"] == 0.0 and not z["z"]["capped"]


def test_pmi_collocations_math_and_plan(spark):
    """PMI collocations (r7): values equal the independent in-test
    computation ln(c_xy·N²/(N_bi·c_x·c_y)) on a hand-built corpus; a
    genuine collocation ("san francisco" — the words only ever appear
    together) outranks a chance pairing of common words; min_count
    floors rare pairs out; no cartesian / no Python in the plan."""
    import math as _m
    from collections import Counter

    docs = [
        (i, "san francisco is big and the city of san francisco is wet") for i in range(3)
    ] + [(10 + i, "the city is big and the bay is wet near the city") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["w1"], r["w2"]): r for r in TX.pmi_collocations(df, k=100, min_count=3).collect()}

    toks = [d[1].split() for d in docs]
    uni = Counter(w for t in toks for w in t)
    n_uni = sum(uni.values())
    bi = Counter((t[i], t[i + 1]) for t in toks for i in range(len(t) - 1))
    n_bi = sum(bi.values())
    want = {
        p: _m.log((c * n_uni * n_uni) / (n_bi * uni[p[0]] * uni[p[1]]))
        for p, c in bi.items()
        if c >= 3
    }
    assert set(got) == set(want)
    for p, r in got.items():
        assert abs(r["pmi"] - round(want[p], 6)) < 1e-9, (p, r["pmi"], want[p])
        assert r["n_pair"] == bi[p]
    assert got[("san", "francisco")]["rank"] < got[("the", "city")]["rank"]
    ranks = sorted(r["rank"] for r in got.values())
    assert ranks == list(range(1, len(got) + 1))

    plan = TX.pmi_collocations(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_perplexity_semantics(spark):
    """Unigram-LM scoring (round 6): an out-of-distribution document
    (tokens appearing nowhere else) must score strictly higher than a
    document of corpus-common tokens; scores are positive; empty/
    whitespace-only documents are absent; deterministic across
    partitionings."""
    from bigdata_foundation_spark.operators.text import unigram_logprob_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "the cat and the dog sat"),
        (4, "zxqv wvuts qqqqe zzyyx plmko"),  # OOD: all-rare tokens
        (5, "   "),  # whitespace-only: absent from output
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob_score(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert all(r["nll_per_token"] > 0 for r in got.values())
    common_max = max(got[i]["nll_per_token"] for i in (1, 2, 3))
    assert got[4]["nll_per_token"] > common_max
    assert got[1]["n_tokens"] == 6

    got2 = {r["doc_id"]: r["nll_per_token"] for r in unigram_logprob_score(docs.repartition(5)).collect()}
    for i in (1, 2, 3, 4):
        assert abs(got2[i] - got[i]["nll_per_token"]) < 1e-9


def test_perplexity_buckets_semantics(spark):
    """CCNet bucketing (NEW r9): per language the head/middle/tail
    split is an ntile over (nll, id) — bucket sizes differ by ≤1
    within a language, every head doc scores ≤ every tail doc of the
    same language, zero-token docs are absent, and the split is
    deterministic across partitionings."""
    from bigdata_foundation_spark.operators.text import perplexity_buckets

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the rug", "en"),
        (3, "the cat and the dog sat", "en"),
        (4, "zxqv wvuts qqqqe zzyyx plmko", "en"),  # OOD -> tail
        (5, "the the the the", "en"),
        (6, "und der hund sass", "de"),
        (7, "der hund und der hund", "de"),
        (8, "qqqqe zzyyx", "de"),
        (9, "   ", "en"),  # zero tokens: absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in perplexity_buckets(docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 8}
    for lang in ("en", "de"):
        members = [r for r in got.values() if r["lang"] == lang]
        sizes = [sum(1 for r in members if r["bucket"] == b) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        heads = [r["nll_per_token"] for r in members if r["bucket"] == "head"]
        tails = [r["nll_per_token"] for r in members if r["bucket"] == "tail"]
        assert max(heads) <= min(tails), lang
    assert got[4]["bucket"] == "tail"  # the OOD doc
    got2 = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(docs.repartition(7)).collect()}
    assert got2 == {k: v["bucket"] for k, v in got.items()}


def test_perplexity_buckets_approx_matches_exact_off_boundaries(spark):
    """r10 (the r9 verdict's scale-axis demand): ``exact=False``
    buckets by per-language percentile_approx BOUNDARIES assigned
    scan-side — no per-language sort, no skewed-key Exchange. On the
    real corpus the two modes must agree on every row EXCEPT those
    whose quantized nll EQUALS a bucket-boundary key (rank-bucketing
    splits such ties across the cut; value-bucketing cannot), and the
    approx plan must contain no Window/Sort over the document table."""
    from bigdata_foundation_spark.operators.text import perplexity_buckets

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r["doc_id"]: r for r in perplexity_buckets(docs).collect()}
    approx = {r["doc_id"]: r for r in perplexity_buckets(docs, exact=False).collect()}
    assert set(exact) == set(approx)

    # per-language boundary keys of the exact split: the max quantized
    # key inside each non-final bucket
    import collections

    by_lang = collections.defaultdict(list)
    for r in exact.values():
        by_lang[r["lang"]].append(r)
    boundary_keys = {}
    for lang, members in by_lang.items():
        keys = set()
        for b in ("head", "middle"):
            ks = [round(m["nll_per_token"], 6) for m in members if m["bucket"] == b]
            if ks:
                keys.add(max(ks))
        boundary_keys[lang] = keys

    n_disagree = 0
    for did, er in exact.items():
        ar = approx[did]
        if er["bucket"] != ar["bucket"]:
            n_disagree += 1
            k = round(er["nll_per_token"], 6)
            assert k in boundary_keys[er["lang"]], (did, k, er["bucket"], ar["bucket"])
    # sanity: the modes agree on the overwhelming majority
    assert n_disagree <= len(exact) * 0.05, n_disagree

    # plan shape: no Window (ntile) and no skewed-lang Sort in approx mode
    plan = (
        perplexity_buckets(docs, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # NB: match "ntile(" as a function call — "ntile" alone would hit
    # the approx mode's own "percentile_approx"
    assert "Window" not in plan and "ntile(" not in plan
    exact_plan = perplexity_buckets(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in exact_plan  # the gate-oracle mode keeps ntile


def test_zipf_fit_semantics(spark):
    """Zipf fit (NEW r9): on a corpus built to follow freq(r) = C/r
    exactly, the OLS slope over the log-log rank/frequency points must
    be -1 (to rounding); on the real documents table the slope is
    negative; deterministic across partitionings."""
    from bigdata_foundation_spark.operators.text import zipf_fit

    # token "t{r}" appears floor(1200/r) times -> ln f = ln 1200 - ln r
    words = []
    for r in range(1, 51):
        words += [f"t{r:02d}"] * (1200 // r)
    docs = spark.createDataFrame(
        [(1, " ".join(words[:2000])), (2, " ".join(words[2000:]))],
        "doc_id long, text string",
    )
    row = zipf_fit(docs, top_n=40).head()
    assert row["n_points"] == 40
    assert abs(row["zipf_slope"] + 1.0) < 0.02, row["zipf_slope"]
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r1 = zipf_fit(real).head()
    r2 = zipf_fit(real.repartition(13)).head()
    assert r1["zipf_slope"] < 0
    assert r1 == r2


def test_exact_substring_spans_semantics(spark):
    """ExactSubstr (round 6): a >=L-token run shared by two documents
    is reported in BOTH as one merged span with exact boundaries; a
    within-document repeat also triggers; unique text and docs shorter
    than L are absent; fingerprint and exact-gram paths agree."""
    from bigdata_foundation_spark.operators.dedup import (
        exact_substring_spans,
        remove_duplicate_spans,
    )

    shared = " ".join(f"s{i}" for i in range(6))  # 6 shared tokens
    rows = [
        (1, f"a1 a2 a3 {shared} b1 b2 b3"),   # shared run at pos 3..8
        (2, f"{shared} c1 c2 c3 c4 c5 c6"),   # shared run at pos 0..5
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),  # all unique
        (4, f"d1 {shared} d2 {shared} d3"),   # self-repeat
        (5, "t1 t2"),                          # shorter than L
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = exact_substring_spans(docs, min_tokens=4)
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in spans.collect()
    }
    # doc 3 and doc 5 clean; docs 1, 2, 4 flagged
    assert set(got) == {1, 2, 4}
    # doc 1: duplicated 4-gram starts at positions 3..5 → span [3, 9)
    assert got[1] == (3, 9, 6)
    assert got[2] == (0, 6, 6)
    # doc 4: duplicated starts {1,2,3} and {8,9,10}; the gap 8-3=5 > L
    # so the two occurrences stay separate spans (d2 at pos 7 between)
    all4 = sorted(
        (r["span_start"], r["span_end"])
        for r in spans.filter("doc_id = 4").collect()
    )
    assert all4 == [(1, 7), (8, 14)]

    exact = exact_substring_spans(docs, min_tokens=4, fingerprint=False)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, spans.collect()))

    cleaned = {r["doc_id"]: r for r in remove_duplicate_spans(docs, spans).collect()}
    assert cleaned[3]["clean_text"] == rows[2][1]  # untouched
    assert cleaned[3]["n_tokens_removed"] == 0
    assert cleaned[1]["clean_text"] == "a1 a2 a3 b1 b2 b3"
    assert cleaned[1]["n_tokens_removed"] == 6
    assert cleaned[4]["clean_text"] == "d1 d2 d3"  # d2 sits between spans
    assert cleaned[4]["n_tokens_removed"] == 12
    # whitespace-only / short docs survive removal untouched
    assert cleaned[5]["clean_text"] == "t1 t2"


def test_exact_substring_single_gram_skew_bounded(spark):
    """r7 (verdict item 3): a SINGLE gram repeated ~10^6 times across
    the corpus — the corpus-wide boilerplate worst case — must not
    funnel every occurrence into one task's buffer. The r6 shape
    (window count over partitionBy(_g)) did exactly that; the
    two-phase shape bounds the count shuffle via map-side partial
    aggregation: the hot gram's reduce input is at most one row per
    input partition, measured here via the gram-count aggregate's own
    output (one row total for the single distinct gram), while the
    full run still returns the exact whole-document spans."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark.operators.dedup import exact_substring_spans

    n_docs, toklen = 64, 16_000  # ~1M duplicated gram starts, one gram
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(F.sequence(F.lit(1), F.lit(toklen)), lambda _: F.lit("boiler")),
                " ",
            ).alias("text"),
        )
        .repartition(32)
    )
    spans = exact_substring_spans(docs, min_tokens=15)
    rows = spans.collect()
    # every document is one whole-document duplicated span
    assert len(rows) == n_docs
    assert all(
        (r["span_start"], r["span_end"], r["span_len"]) == (0, toklen, toklen) for r in rows
    )
    # the aggregate the shuffle carries: ONE distinct gram corpus-wide,
    # so the per-gram count table is a single row — the skewed key
    # never materializes its occurrence list anywhere. (Tokenize in a
    # SEPARATE projection — inlining split() into the per-gram lambda
    # would recompute it per position.)
    L = 15
    toks = docs.select(
        "doc_id", F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("_toks")
    )
    grams = toks.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - F.lit(L)),
                lambda i: F.xxhash64(
                    F.array_join(F.slice(F.col("_toks"), i + F.lit(1), F.lit(L)), " ")
                ),
            )
        ).alias("pos", "_g")
    )
    assert grams.select("_g").distinct().count() == 1


def test_bm25_semantics(spark):
    """BM25 (round 6): higher tf wins at equal length; longer document
    loses at equal tf (length normalization); non-matching documents
    absent; idf never negative (Lucene variant); deterministic across
    partitionings."""
    import math

    from bigdata_foundation_spark.operators.text import bm25_scores

    rows = [
        (1, "apple banana apple cherry"),          # tf(apple)=2, dl=4
        (2, "apple banana grape cherry"),          # tf(apple)=1, dl=4
        (3, "apple banana grape cherry date elderberry fig grape "
            "honeydew kiwi lemon mango"),          # tf(apple)=1, dl=12
        (4, "banana cherry grape"),                # no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bm25_scores(docs, ["apple"]).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["bm25"] > got[2]["bm25"] > got[3]["bm25"]
    assert all(r["bm25"] > 0 for r in got.values())
    assert got[1]["n_matched_terms"] == 1

    # hand-check doc 2 against the closed form: N=4, df=3, avgdl=23/4
    n_docs, df, k1, b = 4, 3, 1.2, 0.75
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    tf, dl, avgdl = 1, 4, 23 / 4
    expect = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(got[2]["bm25"] - expect) < 1e-12

    got2 = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs.repartition(5), ["apple"]).collect()}
    for i in (1, 2, 3):
        assert abs(got2[i] - got[i]["bm25"]) < 1e-12


def test_dsir_scores_semantics(spark):
    """DSIR (round 6): documents resembling the target corpus must
    outscore documents resembling only the raw-source bulk; scores are
    deterministic across partitionings; hashed-feature mode is
    deterministic and preserves the target>source ordering on a
    collision-free vocabulary."""
    from bigdata_foundation_spark.operators.text import dsir_logratio_scores

    rows = [
        (1, "law court judge ruling appeal"),      # target-like
        (2, "law court judge verdict statute"),    # target-like
        (3, "pizza burger fries soda shake"),      # source-bulk
        (4, "pizza burger fries cola taco"),       # source-bulk
        (5, "law court pizza burger judge fries"), # mixed
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id <= 2")
    got = {r["doc_id"]: r["dsir_logratio"] for r in dsir_logratio_scores(docs, target).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert min(got[1], got[2]) > got[5] > max(got[3], got[4])

    got2 = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_logratio_scores(docs.repartition(7), target).collect()
    }
    for i in got:
        assert abs(got2[i] - got[i]) < 1e-12

    hashed = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_logratio_scores(docs, target, hash_buckets=1 << 20).collect()
    }
    assert min(hashed[1], hashed[2]) > hashed[5] > max(hashed[3], hashed[4])


def test_dsir_gumbel_topk(spark):
    """Gumbel top-k resampling: exactly k rows, deterministic for a
    fixed seed, near-argmax at T→0, and a changed seed actually
    changes the draw at high temperature (the noise is live)."""
    from bigdata_foundation_spark.operators.text import dsir_gumbel_topk

    rows = [(i, float(-i) * 0.5) for i in range(40)]  # score falls with id
    scores = spark.createDataFrame(rows, "doc_id long, dsir_logratio double")

    a = [r["doc_id"] for r in dsir_gumbel_topk(scores, k=8, seed=1).collect()]
    b = [r["doc_id"] for r in dsir_gumbel_topk(scores, k=8, seed=1).collect()]
    assert a == b and len(a) == 8

    cold = {r["doc_id"] for r in dsir_gumbel_topk(scores, k=8, temperature=1e-6).collect()}
    assert cold == set(range(8))  # T→0 ⇒ plain top-k by score

    hot1 = {r["doc_id"] for r in dsir_gumbel_topk(scores, k=8, temperature=50.0, seed=1).collect()}
    hot2 = {r["doc_id"] for r in dsir_gumbel_topk(scores, k=8, temperature=50.0, seed=2).collect()}
    assert hot1 != cold or hot2 != cold  # noise participates
    assert hot1 != hot2  # seed matters (overwhelmingly likely by construction)


def test_rrf_fuse_semantics(spark):
    """RRF (round 6): item in both rankers' heads beats single-ranker
    items; missing-from-one contributes 0 (union contract); score is
    the exact rational 1/(k+r1) + 1/(k+r2); empty rankings rejected."""
    import pytest as _pytest

    from bigdata_foundation_spark.operators.relational import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 2), (4, 1), (3, 9)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse({"a": a, "b": b}, k=60).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["rrf_score"] == 1 / 61 + 1 / 62
    assert got[2]["rrf_score"] == 1 / 62          # only ranker a
    assert got[4]["rrf_score"] == 1 / 61          # only ranker b
    assert got[3]["rrf_score"] == 1 / 63 + 1 / 69
    assert got[1]["rrf_score"] > max(got[2]["rrf_score"], got[4]["rrf_score"])
    assert got[2]["a_rank"] == 2 and got[2]["b_rank"] is None

    with _pytest.raises(ValueError):
        rrf_fuse({})


def test_kmeans_cluster_contract(spark, vectors):
    """Round-7 first-class k-means: deterministic across runs and
    partition layouts, clusters in 0..k-1, scores in [-1, 1], and the
    (k=16, lloyd_iters=2) configuration reproduces SemDeDup's cell
    assignment exactly — both ride the same shared centroid contract,
    so a drift between them would mean the contract forked."""
    got = S.kmeans_cluster(vectors, k=16, lloyd_iters=2).collect()
    assert len(got) == vectors.count()
    assert {r.cluster for r in got} <= set(range(16))
    assert all(-1.0 - 1e-9 <= r.score <= 1.0 + 1e-9 for r in got)
    again = S.kmeans_cluster(vectors.repartition(13), k=16, lloyd_iters=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    sem = S.semantic_dedup(vectors, n_cells=16)
    cells = {r.vec_id: r.cell for r in sem.collect()}
    mine = {r.id: r.cluster for r in got}
    assert mine == cells


def test_bpe_train_encode_contract(spark):
    """Round-7 BPE: merge table matches an inline independent replay
    on a toy corpus (count ties break to the smallest pair; </w> stops
    merges at word boundaries), encoding is greedy lowest-rank, token
    counts are whole-word consistent, and training is deterministic
    across partition layouts."""
    from bigdata_foundation_spark.operators.text import (
        _bpe_apply,
        bpe_encode,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lower"), (2, "newest newest widest")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=50)
    # independent replay of the published contract
    hist = {"low": 3, "lower": 2, "newest": 2, "widest": 1}
    words = {tuple(list(w) + ["</w>"]): n for w, n in hist.items()}
    expect = []
    while len(expect) < 50:
        pc = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + n
        if not pc or max(pc.values()) < 2:
            break
        bn = max(pc.values())
        bp = min(p for p, c in pc.items() if c == bn)
        nw = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == bp:
                    out.append(syms[i] + syms[i + 1]); i += 2
                else:
                    out.append(syms[i]); i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + n
        words = nw
        expect.append(bp)
    assert merges == expect
    # 'low' collapses fully; merges never cross the </w> boundary
    ranks = {p: i for i, p in enumerate(merges)}
    assert _bpe_apply("low", ranks) == ["low</w>"]
    assert all("</w>" not in left for left, _ in merges)
    enc = {r.id: r for r in bpe_encode(docs, merges).collect()}
    assert enc[1].n_tokens == sum(len(_bpe_apply(w, ranks)) for w in
                                  ["low", "low", "low", "lower", "lower"])
    # determinism across layouts
    assert bpe_train(docs.repartition(5), num_merges=50) == merges


def test_linear_classifier_contract(spark):
    """Round-7 hashed linear classifier: learns a separable toy
    problem (distinct vocabularies), scoring is deterministic across
    partition layouts, probs are valid, and the scoring plan is pure
    scan-side — no Exchange, no Python eval."""
    from bigdata_foundation_spark.operators.text import (
        linear_classifier_score,
        train_linear_classifier,
    )

    pos = [(i, "good clean prose with helpful sentences here", "en") for i in range(20)]
    neg = [(100 + i, "zz xx qq vv kk jj ww yy uu tt", "xx") for i in range(20)]
    docs = spark.createDataFrame(pos + neg, "doc_id long, text string, lang string")
    w, b = train_linear_classifier(docs, F.col("lang") == "en", dim=64, iters=10)
    assert len(w) == 64 and all(isinstance(x, float) for x in w)
    scored = {r.id: (r.prob, r.predicted) for r in linear_classifier_score(docs, w, b).collect()}
    assert all(scored[i][1] for i, _t, _l in pos)
    assert not any(scored[i][1] for i, _t, _l in neg)
    assert all(0.0 <= p <= 1.0 for p, _ in scored.values())
    again = {
        r.id: (r.prob, r.predicted)
        for r in linear_classifier_score(docs.repartition(7), w, b).collect()
    }
    assert scored == again
    plan = linear_classifier_score(docs, w, b)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan

    # SAMPLE CONTRACT (r8): training is bounded by train_sample — the
    # docs with smallest (xxhash64(id), id). Weights from the capped
    # run equal weights from training directly on exactly that subset,
    # regardless of what else is in the corpus.
    n_keep = 10
    hashed = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", F.xxhash64("doc_id").alias("h")).collect()
    }
    keep_ids = sorted(hashed, key=lambda d: (hashed[d], d))[:n_keep]
    sub = docs.filter(F.col("doc_id").isin(keep_ids))
    w_cap, b_cap = train_linear_classifier(
        docs, F.col("lang") == "en", dim=64, iters=10, train_sample=n_keep
    )
    w_sub, b_sub = train_linear_classifier(
        sub, F.col("lang") == "en", dim=64, iters=10, train_sample=n_keep
    )
    assert (w_cap, b_cap) == (w_sub, b_sub)


def test_pca_train_project_semantics(spark, vectors):
    """embedding_pca (r8): components are orthonormal and ordered by
    descending explained variance; projected score variance matches
    the eigenvalues on the training set; the sign convention pins each
    loading's largest-|coordinate| entry positive; projection is
    partition-invariant and pure scan-side (no Exchange, no Python);
    training obeys the hash-spread sample cap."""
    import numpy as np

    mu, comps, var = S.pca_train(vectors, n_components=4)
    W = np.array(comps)
    assert np.allclose(W @ W.T, np.eye(4), atol=1e-4)  # orthonormal (6dp-rounded)
    assert var == sorted(var, reverse=True) and var[0] > 0
    for w in comps:
        assert w[int(np.argmax(np.abs(w)))] > 0
    proj = S.pca_project(vectors, mu, comps)
    got = {r["id"]: list(r["pc"]) for r in proj.collect()}
    # replay the fold independently
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in vectors.collect()}
    for vid, v in rows.items():
        for k, w in enumerate(comps):
            s = 0.0
            for x, m, c in zip(v, mu, w):
                s = s + (x - m) * c
            assert abs(got[vid][k] - round(s, 6)) < 1e-9, (vid, k)
    # score variance tracks eigenvalues (training set == corpus here)
    P = np.array([got[vid] for vid in sorted(rows)])
    sv = P.var(axis=0, ddof=1)
    for k in range(4):
        assert abs(sv[k] - var[k]) / max(var[k], 1e-9) < 0.01, (k, sv[k], var[k])
    # partition invariance + plan purity
    again = {r["id"]: list(r["pc"]) for r in S.pca_project(vectors.repartition(7), mu, comps).collect()}
    assert again == got
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    # sample cap: training on the capped corpus == training on the subset
    hashed = {r["vec_id"]: r["h"] for r in vectors.select("vec_id", F.xxhash64("vec_id").alias("h")).collect()}
    keep = sorted(hashed, key=lambda d: (hashed[d], d))[:10]
    sub = vectors.filter(F.col("vec_id").isin(keep))
    assert S.pca_train(vectors, 4, train_sample=10) == S.pca_train(sub, 4, train_sample=10)


def test_ks_drift_semantics(spark):
    """ks_drift (r8): values equal an independent in-test ECDF sup
    computation on a hand-built dataset; a shifted slice shows large
    D while an identically-distributed slice sits near 0; a
    single-slice corpus returns NULL; NULL groups/values excluded."""
    rows = []
    for i in range(200):
        rows.append(("a", float(i % 10)))
        rows.append(("b", float(i % 10)))          # b ~ identical to a
    for i in range(100):
        rows.append(("c", 100.0 + (i % 10)))       # c fully shifted
    rows += [(None, 1.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in R.ks_drift(df, "g", "v").collect()}
    assert set(got) == {"a", "b", "c"}

    # independent replay
    import collections
    data = collections.defaultdict(list)
    for g, v in rows:
        if g is not None and v is not None:
            data[g].append(v)
    all_vals = sorted({v for vs in data.values() for v in vs})
    for g in data:
        rest = [v for gg, vs in data.items() if gg != g for v in vs]
        want = max(
            abs(
                sum(1 for x in data[g] if x <= t) / len(data[g])
                - sum(1 for x in rest if x <= t) / len(rest)
            )
            for t in all_vals
        )
        assert abs(got[g]["ks_d"] - want) < 1e-12, (g, got[g]["ks_d"], want)
        assert got[g]["n_slice"] == len(data[g]) and got[g]["n_rest"] == len(rest)
    assert got["c"]["ks_d"] == pytest.approx(1.0)     # disjoint support
    assert got["a"]["ks_d"] < got["c"]["ks_d"]        # shifted slice drifts most

    single = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    srow = R.ks_drift(single, "g", "v").collect()
    assert len(srow) == 1 and srow[0]["ks_d"] is None


def test_bigram_perplexity_order_sensitivity(spark):
    """bigram_logprob_score (r8): captures word ORDER — a document
    with exactly the token multiset of the corpus's dominant sentence
    but shuffled scores IDENTICAL under the unigram LM and strictly
    worse under the interpolated bigram; a 1-token doc scores as pure
    unigram; n_tokens counts every position; empty docs are absent."""
    from bigdata_foundation_spark.operators.text import (
        bigram_logprob_score,
        unigram_logprob_score,
    )

    sent = "the cat sat on the mat"
    rows = [(i, sent) for i in range(10)] + [(100, "mat the on sat cat the"),
                                             (200, "the"), (300, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r["doc_id"]: r for r in unigram_logprob_score(df).collect()}
    bi = {r["doc_id"]: r for r in bigram_logprob_score(df).collect()}
    assert 300 not in bi and 300 not in uni  # empty doc absent
    assert bi[0]["n_tokens"] == 6 and bi[100]["n_tokens"] == 6
    # same multiset -> unigram cannot separate
    assert abs(uni[100]["nll_per_token"] - uni[0]["nll_per_token"]) < 1e-12
    # bigram does
    assert bi[100]["nll_per_token"] > bi[0]["nll_per_token"] + 0.1
    # 1-token doc == its unigram score
    assert abs(bi[200]["nll_per_token"] - uni[200]["nll_per_token"]) < 1e-12
    # no cartesian, no Python in the plan
    plan = bigram_logprob_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "Python" not in plan


def test_corpus_drift_semantics(spark):
    """corpus_drift (round 7): identically-distributed slices sit at
    JS ~ 0 against the rest; a disjoint-vocabulary slice hits the JS
    maximum of EXACTLY 1.0 (the telescoped absent-token closed form:
    inside = 0.5, coverage = 0); a single-source corpus has no rest
    and returns NULL; doc-split invariance (the statistic depends on
    the token multiset, not document boundaries); NULL groups are
    excluded."""
    from bigdata_foundation_spark.operators.text import corpus_drift

    # Two sources with the SAME token distribution, one disjoint one.
    rows = [
        (1, "alpha beta alpha beta", "a"),
        (2, "alpha beta alpha beta", "a"),
        (3, "alpha beta alpha beta alpha beta alpha beta", "b"),
        (4, "zeta eta theta zeta", "c"),
        (5, None, "a"),
        (6, "ghost tokens", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in corpus_drift(docs).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"]["n_tokens"] == 8 and out["a"]["n_types"] == 2
    # c's vocabulary is disjoint from the rest -> JS == 1.0 exactly.
    assert out["c"]["js_divergence"] == 1.0
    # a vs rest shares the dominant alpha/beta mass -> far from 1;
    # a and b are identically distributed, so a's divergence comes
    # only from c's tail and stays small but positive.
    assert 0.0 < out["a"]["js_divergence"] < 0.25
    assert out["b"]["js_divergence"] < out["c"]["js_divergence"]

    # Doc-split invariance: one source's text split across more docs.
    split_rows = [
        (1, "alpha beta", "a"), (7, "alpha beta", "a"),
        (2, "alpha beta alpha beta", "a"),
        (3, "alpha beta alpha beta alpha beta alpha beta", "b"),
        (4, "zeta eta theta zeta", "c"),
    ]
    split_docs = spark.createDataFrame(split_rows, "doc_id long, text string, source string")
    out2 = {r["source"]: r for r in corpus_drift(split_docs).collect()}
    for g in ("a", "b", "c"):
        assert out2[g]["n_tokens"] == out[g]["n_tokens"]
        assert abs(out2[g]["js_divergence"] - out[g]["js_divergence"]) < 1e-12

    solo = spark.createDataFrame([(1, "only one source here", "s")],
                                 "doc_id long, text string, source string")
    srow = corpus_drift(solo).collect()
    assert len(srow) == 1 and srow[0]["js_divergence"] is None


def test_hard_negatives_semantics(spark):
    """hard_negatives (round 7): the nearest SAME-label vector is
    excluded and the nearest different-label one wins rank 1; self
    never appears; NULL labels are null-safe (NULL vs NULL = same
    label, excluded); output ranks are dense 1..k per query."""
    from bigdata_foundation_spark.operators import similarity as S

    rows = [
        (0, [1.0, 0.0], 7),      # query
        (1, [0.999, 0.05], 7),   # nearest overall but SAME label
        (2, [0.95, 0.3], 1),     # nearest different-label -> rank 1
        (3, [0.0, 1.0], 2),      # orthogonal different-label -> rank 2
        (4, [1.0, 0.01], None),  # NULL label vs 7 -> different, very close
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    qs = emb.filter(F.col("vec_id") == 0)
    out = S.hard_negatives(emb, qs, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [4, 2, 3]
    assert all(r["query_id"] == 0 for r in out)
    assert [r["rank"] for r in out] == [1, 2, 3]

    # NULL query label: NULL IS NOT DISTINCT FROM NULL -> 4 excluded.
    rows2 = rows + [(5, [0.9, 0.1], None)]
    emb2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>, label int")
    qs2 = emb2.filter(F.col("vec_id") == 5)
    out2 = S.hard_negatives(emb2, qs2, k=5).collect()
    assert {r["neighbor_id"] for r in out2} == {0, 1, 2, 3}


def test_bloom_build_probe_contract(spark):
    """Bloom filter (round 7): the engine bitmap is EXACTLY the
    pure-Python replay (ported xxhash64 — false positives and all);
    no false negatives ever; a tiny 64-bit bloom saturates into
    deterministic false positives that both sides agree on; NULL
    probes to NULL; n_bits validation raises."""
    import os
    import sys

    import pytest as _pytest

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from spark_hashes import pmod, spark_xxhash64

    from bigdata_foundation_spark.operators.dedup import bloom_build, bloom_probe

    seen = ["alpha", "beta", "gamma", "delta"]
    df = spark.createDataFrame([(s,) for s in seen], "text string")
    n_bits, k = 1 << 10, 5
    words = bloom_build(df, col="text", n_bits=n_bits, n_hashes=k)

    # Exact bitmap replay.
    replay = [0] * (n_bits // 64)
    for s in seen:
        for i in range(1, k + 1):
            p = pmod(spark_xxhash64(s, ("int", i)), n_bits)
            replay[p >> 6] |= 1 << (p & 63)
    replay = [w - (1 << 64) if w >= (1 << 63) else w for w in replay]
    assert words == replay

    probe = spark.createDataFrame(
        [("alpha",), ("beta",), ("zzz-unseen",), (None,)], "text string"
    )
    got = {r["text"]: r["maybe_seen"] for r in bloom_probe(probe, words, col="text", n_hashes=k).collect()}
    assert got["alpha"] is True and got["beta"] is True   # no false negatives
    assert got[None] is None
    # replay the unseen probe decision rather than assuming it's False
    expect_unseen = all(
        (replay[pmod(spark_xxhash64("zzz-unseen", ("int", i)), n_bits) >> 6]
         >> (pmod(spark_xxhash64("zzz-unseen", ("int", i)), n_bits) & 63)) & 1
        for i in range(1, k + 1)
    )
    assert got["zzz-unseen"] == expect_unseen

    # A saturated tiny bloom: every bit set -> everything "maybe seen".
    many = spark.createDataFrame([(f"doc-{i}",) for i in range(200)], "text string")
    tiny = bloom_build(many, col="text", n_bits=64, n_hashes=3)
    assert tiny == [-1]  # all 64 bits set
    out = bloom_probe(probe, tiny, col="text", n_hashes=3).collect()
    assert all(r["maybe_seen"] is True for r in out if r["text"] is not None)

    with _pytest.raises(ValueError):
        bloom_build(df, col="text", n_bits=100)


def test_count_min_sketch_contract(spark):
    """Count-Min (round 7): estimates are NEVER below true counts
    (one-sided error); shard sketches merge by SUMMING cells (the
    distributed-union property); a wide sketch on a tiny vocab is
    exact; out-of-range cells raise."""
    import pytest as _pytest

    from bigdata_foundation_spark.operators.text import cms_estimate, count_min_cells

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b c d d d d"), (3, None)],
        "doc_id long, text string",
    )
    depth, width = 4, 1 << 10
    cells = [(r["row"], r["col"], r["c"])
             for r in count_min_cells(docs, depth=depth, width=width).collect()]
    truth = {"a": 4, "b": 3, "c": 2, "d": 4}
    toks = spark.createDataFrame([(t,) for t in truth], "tok string")
    est = {r["tok"]: r["est"]
           for r in cms_estimate(toks, cells, depth=depth, width=width).collect()}
    for t, c in truth.items():
        assert est[t] >= c
    # tiny vocab + wide sketch -> no collisions -> exact
    assert est == truth

    # NULL token -> NULL estimate (bloom_probe's NULL contract):
    # xxhash64 skips NULL args, so an unguarded lookup would hash only
    # the row salt and return an arbitrary cell's count
    nulled = spark.createDataFrame([("a",), (None,)], "tok string")
    got_null = {r["tok"]: r["est"]
                for r in cms_estimate(nulled, cells, depth=depth, width=width).collect()}
    assert got_null["a"] == truth["a"] and got_null[None] is None

    # shard merge: cells(A) + cells(B) == cells(A ∪ B)
    a = docs.filter(F.col("doc_id") == 1)
    b = docs.filter(F.col("doc_id") != 1)
    merged: dict = {}
    for shard in (a, b):
        for r in count_min_cells(shard, depth=depth, width=width).collect():
            merged[(r["row"], r["col"])] = merged.get((r["row"], r["col"]), 0) + r["c"]
    whole = {(r["row"], r["col"]): r["c"]
             for r in count_min_cells(docs, depth=depth, width=width).collect()}
    assert merged == whole

    with _pytest.raises(ValueError):
        cms_estimate(toks, [(99, 0, 1)], depth=depth, width=width)


def test_temperature_mixture_semantics(spark):
    """temperature_mixture (round 7): alpha=1 is exactly proportional
    sampling; alpha->0 flattens toward uniform (small groups gain,
    big groups lose); weights sum to 1; budget conservation
    (sum allocation == budget); empty-text group gets 0 weight;
    alpha validation raises."""
    import pytest as _pytest

    from bigdata_foundation_spark.operators.text import temperature_mixture

    rows = [
        (1, "t " * 90, "big"),      # 90 tokens
        (2, "t " * 9, "small"),     # 9 tokens
        (3, "t", "tiny"),           # 1 token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    prop = {r["source"]: r for r in temperature_mixture(docs, alpha=1.0).collect()}
    assert abs(prop["big"]["weight"] - 0.9) < 1e-6
    assert abs(prop["small"]["weight"] - 0.09) < 1e-6
    # alpha=1: every group's epochs == budget_frac exactly
    assert all(abs(r["epochs"] - 1.0) < 1e-6 for r in prop.values())

    cool = {r["source"]: r for r in temperature_mixture(docs, alpha=0.3).collect()}
    assert cool["big"]["weight"] < prop["big"]["weight"]      # big loses
    assert cool["tiny"]["weight"] > prop["tiny"]["weight"]    # tiny gains
    assert abs(sum(r["weight"] for r in cool.values()) - 1.0) < 1e-5
    assert abs(sum(r["allocation"] for r in cool.values()) - 100.0) < 1e-3
    # the overfit signal: the up-weighted tiny group repeats >1 epoch
    assert cool["tiny"]["epochs"] > 1.0

    with _pytest.raises(ValueError):
        temperature_mixture(docs, alpha=0.0)
    with _pytest.raises(ValueError):
        temperature_mixture(docs, alpha=1.5)


def test_dataset_diff_semantics(spark):
    """dataset_diff (round 7): all four statuses; NULL-vs-NULL content
    is unchanged (null-safe); content compare respects every
    content_col; the join output covers the id union exactly."""
    from bigdata_foundation_spark.operators.relational import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, None, "z"), (4, "gone", "w")],
        "doc_id long, text string, meta string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "y"), (3, None, "z"), (5, "fresh", "v")],
        "doc_id long, text string, meta string",
    )
    out = {r["doc_id"]: r["status"]
           for r in dataset_diff(old, new, content_cols=["text", "meta"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}

    # second content col participates
    new2 = spark.createDataFrame([(1, "a", "CHANGED")], "doc_id long, text string, meta string")
    out2 = {r["doc_id"]: r["status"]
            for r in dataset_diff(old.filter(F.col("doc_id") == 1), new2,
                                  content_cols=["text", "meta"]).collect()}
    assert out2 == {1: "changed"}
