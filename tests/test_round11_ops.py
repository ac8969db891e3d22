"""Round-11 additions: GIF codec, URL curation, Stupid Backoff LM."""

import math
import struct
import sys

import numpy as np
import pytest

from pyspark.sql import functions as F

from bigdata_foundation_spark.operators import multimodal as M
from bigdata_foundation_spark.operators import web as W
from bigdata_foundation_spark.operators.text import stupid_backoff_score


# ------------------------------ GIF ----------------------------------

def test_gif_lzw_roundtrip_fuzz():
    """encode∘decode == identity across alphabet sizes, lengths, and
    across the 4096-entry clear-reset."""
    rng = np.random.RandomState(7)
    for trial in range(120):
        n = int(rng.randint(1, 700))
        ncol = int(rng.choice([2, 4, 16, 256]))
        idx = rng.randint(0, ncol, n).astype(np.uint8)
        min_code = max(2, int(ncol - 1).bit_length())
        enc = M._gif_lzw_encode(idx, min_code)
        dec = M._gif_lzw_decode(enc, min_code, n)
        assert np.array_equal(dec, idx)
    big = rng.randint(0, 256, 120_000).astype(np.uint8)
    assert np.array_equal(
        M._gif_lzw_decode(M._gif_lzw_encode(big, 8), 8, len(big)), big
    )


def test_gif_decode_matches_bytes_free_replay():
    """The decoder applied to the REAL encoded payload equals the
    bytes-free replay of the synth rule (tools/gen_pipeline_goldens)
    for ids covering every matrix cell: interlace (odd d), local
    palette (d%3==0, ≥2 frames), region frames (d%4==3), transparency
    (d%5==2, ≥2 frames)."""
    sys.path.insert(0, "/root/repo/tools")
    from gen_pipeline_goldens import _gif_replay_frames

    for d in [0, 1, 2, 3, 6, 7, 12, 17, 22, 27, 57, 102]:
        w1, h1, fr1 = M._gif_frames(M.synth_gif_bytes(d))
        w2, h2, fr2 = _gif_replay_frames(d)
        assert (w1, h1, len(fr1)) == (w2, h2, len(fr2)), d
        for a, b in zip(fr1, fr2):
            assert np.array_equal(a, b), d


def test_gif_87a_and_spec_conventions():
    """87a header decodes; transparency composites the PREVIOUS canvas
    through; a region frame leaves the border untouched."""
    # 87a: rewrite the version bytes of a synth payload
    p = bytearray(M.synth_gif_bytes(4))
    p[3:6] = b"87a"
    w, h, frames = M._gif_frames(bytes(p))
    assert (w, h) == (10 + 4 % 5 * 3, 8 + 4 % 4 * 3) and len(frames) == 1
    # transparency: d=2 -> n_frames=3, d%5==2 -> frames>=1 carry GCE
    # idx 3, full-frame (d%4==2, no region offset)
    w, h, frames = M._gif_frames(M.synth_gif_bytes(2))
    idx1 = M._synth_gif_indices(2, 1, w, h)
    mask = idx1 == 3
    assert mask.any()  # the matrix cell is actually exercised
    assert np.array_equal(frames[1][mask], frames[0][mask])
    assert not np.array_equal(frames[1][~mask], frames[0][~mask])
    # region frames: d=3 -> frames>=1 sit at (2,1) sized (w-4, h-2)
    w, h, frames = M._gif_frames(M.synth_gif_bytes(3))
    assert np.array_equal(frames[1][:1, :], frames[0][:1, :])  # top row untouched
    assert np.array_equal(frames[1][:, :2], frames[0][:, :2])  # left cols untouched


def test_gif_malformed_payloads():
    """Truncated/garbage payloads raise inside _gif_frames (and thus
    stub-fallback in decode_features / emit no rows in the frame
    table) — the corpus-ingest total-function contract."""
    good = M.synth_gif_bytes(5)
    for p in [b"GIF89a", good[:-10], good[:20], b"GIF89a" + b"\x00" * 7 + b"\x3b"]:
        with pytest.raises((ValueError, struct.error, IndexError)):
            M._gif_frames(p)
    # undefined: palette index out of a SHORT local table -> ValueError
    # (decoder validates idx.max() < len(pal))


def test_gif_frame_table_and_decode_features(spark):
    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    media = M.synth_gif_table(ids)
    dec = M.decode_features(media).orderBy("media_id").collect()
    assert len(dec) == 24
    for r in dec:
        d = r["media_id"]
        assert r["width"] == 10 + (d % 5) * 3
        assert r["height"] == 8 + (d % 4) * 3
        assert len(r["feature"]) == 8
    frames = M.gif_frame_table(media, every_n=2, max_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_no"])
    for d in range(24):
        n = 1 + d % 4
        expect = [fi for k, fi in enumerate(range(0, n, 2)) if k < 4]
        assert sorted(by_id[d]) == expect, d
    # non-GIF payloads emit no frame rows
    junk = media.withColumn("payload", F.lit(b"not a gif at all"))
    assert M.gif_frame_table(junk).count() == 0


# ------------------------------ URL ----------------------------------

def test_normalize_url_semantics(spark):
    cases = [
        # consecutive tracking params collapse, survivor keeps its '?'
        ("https://A.com/p?utm_a=1&utm_b=2&id=3", "https://a.com/p?id=3"),
        # tracking-only query loses the '?'
        ("https://a.com/p?utm_medium=m&utm_term=t", "https://a.com/p"),
        # mid-query tracking, fragment, default port
        ("HTTPS://WWW.Ex.COM:443/Path?a=1&ref=rss&b=2#frag",
         "https://www.ex.com/Path?a=1&b=2"),
        # :80 is default for http only
        ("HTTP://h.org:80/x", "http://h.org/x"),
        ("https://h.org:80/x", "https://h.org:80/x"),
        ("https://h.org:8080/x?gclid=z", "https://h.org:8080/x"),
        # path case preserved; no query/fragment untouched
        ("https://CDN.net/CaseSensitive", "https://cdn.net/CaseSensitive"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(W.normalize_url("url")).collect()]
    assert got == [want for _, want in cases]


def test_registered_domain_and_blocklist(spark):
    cases = [
        ("https://www.example.com/a", "example.com"),
        ("https://news.site3.co.uk:8080/b", "site3.co.uk"),
        ("https://a.b.c.deep.org/c", "deep.org"),
        ("https://cdn.media2.net/d", "media2.net"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(W.registered_domain("url")).collect()]
    assert got == [want for _, want in cases]
    kept = W.blocklist_filter(df, ["Example.COM", "deep.org"]).collect()
    assert sorted(r["url"] for r in kept) == sorted(
        [cases[1][0], cases[3][0]]
    )
    assert W.blocklist_filter(df, []).count() == 4


def test_domain_stats_counts(spark):
    rows = [
        ("https://a.com/x?utm_a=1",),   # -> https://a.com/x
        ("https://A.com:443/x",),       # -> https://a.com/x (same)
        ("https://a.com/y",),
        ("https://b.co.uk/z",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {
        r["domain"]: (r["n_urls"], r["n_unique"])
        for r in W.domain_stats(df).collect()
    }
    assert got == {"a.com": (3, 2), "b.co.uk": (1, 1)}


# --------------------------- Stupid Backoff ---------------------------

def test_stupid_backoff_tiers_exact(spark):
    """Each backoff tier produces the closed-form value."""
    train = spark.createDataFrame(
        [("a b c",), ("a b d",)], ["text"]
    )
    # train counts: uni a:2 b:2 c:1 d:1 (N=6, V=4); bi ab:2 bc:1 bd:1;
    # tri abc:1 abd:1
    docs = spark.createDataFrame(
        [
            (1, "a b c"),      # tri tier: S = c(abc)/c(ab) = 1/2
            (2, "x b c"),      # tri miss, bi(b,c)=1, c(b)=2 -> 0.4*1/2
            (3, "x y c"),      # all miss -> 0.16*(c(c)+0.5)/(N+0.5V)
            (4, "a b"),        # <3 tokens: absent
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_per_token"])
        for r in stupid_backoff_score(docs, train).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 1 and got[1][1] == pytest.approx(-math.log2(0.5), abs=1e-12)
    assert got[2][1] == pytest.approx(-math.log2(0.4 * 1 / 2), abs=1e-12)
    floor = 0.4 * 0.4 * (1 + 0.5) / (6 + 0.5 * 4)
    assert got[3][1] == pytest.approx(-math.log2(floor), abs=1e-12)


def test_stupid_backoff_self_scoring_never_backs_off(spark):
    """Scoring the training slice itself: every trigram is in the
    counts, so tier 1 always fires and nll <= -log2 of the smallest
    trigram ratio (sanity: finite, non-negative)."""
    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        ["doc_id", "text"],
    )
    out = stupid_backoff_score(corpus, corpus).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_tokens"] == 7
        assert 0.0 <= r["nll_per_token"] < 50


# ------------------------------ ADPCM --------------------------------

def test_ima_adpcm_block_exact_and_tracking():
    """Every block's header sample reconstructs EXACTLY; a smooth
    signal tracks within the quantizer's error envelope."""
    n = 500
    sig = [int(9000 * math.sin(i / 15)) for i in range(n)]
    enc = M._encode_ima_adpcm([sig], 2)
    dec = M._decode_ima_adpcm(enc, 1, 4 + 8, n)
    spb = 17
    for blk in range(0, n, spb):
        assert dec[blk] == sig[blk]
    err = np.abs(np.array(sig) - np.asarray(dec))
    assert err.mean() < 300


def test_ima_adpcm_wav_decode_stereo_fact_bound():
    """The format-17 WAV path: stereo interleave is channel-faithful
    and the fact chunk bounds frames below the padded block count."""
    d = 7  # synth ADPCM id, stereo (1 + 7 % 2 == 2)
    p = M.synth_wav_bytes(d)
    n_frames, n_ch, feat = M._decode_wav(p)
    assert (n_frames, n_ch) == (64 + 7 % 129, 2)
    assert len(feat) == 8 and all(0.0 <= v <= 1.0 for v in feat)
    # engine decode == the independent scalar replay in the goldens tool
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from gen_pipeline_goldens import _ima_replay_decoded

    vals = ((7 * 31 + np.arange(n_frames)[:, None] * 17
             + np.arange(2)[None, :] * 7) * 2654435761) % 65536
    chans = [(vals[:, c] - 32768).tolist() for c in range(2)]
    dec_replay = _ima_replay_decoded(chans, 2)
    inter = np.empty(n_frames * 2, dtype=np.int64)
    for c in range(2):
        inter[c::2] = dec_replay[c]
    want = M._audio_feature(inter.astype(np.float64) / 32768.0, 8000)
    assert feat == want


def test_ima_adpcm_malformed_falls_to_stub():
    p = bytearray(M.synth_wav_bytes(18))  # mono ADPCM id
    # corrupt a header step index past 88 -> ValueError -> stub upstream
    data_at = bytes(p).find(b"data") + 8
    p[data_at + 2] = 200
    with pytest.raises(ValueError):
        M._decode_wav(bytes(p))
    # truncated mid-data: fact frames exceed what the blocks carry
    with pytest.raises(ValueError):
        M._decode_wav(bytes(M.synth_wav_bytes(18))[:-40])


# --------------------- r11 review-finding regressions -----------------

def test_normalize_url_query_anchored_and_userinfo(spark):
    """Review findings: a literal '&ref=' in the PATH or userinfo must
    survive normalization; userinfo never pollutes host/domain; the
    default port strips through a userinfo authority."""
    cases = [
        ("https://a.com/price&ref=sidebar/page?x=1",
         "https://a.com/price&ref=sidebar/page?x=1"),
        ("https://user&ref=c@h.com/p", "https://user&ref=c@h.com/p"),
        ("HTTPS://u:Pw@H.com:443/p?ref=rss&a=1", "https://u:pw@h.com/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(W.normalize_url("url")).collect()]
    assert got == [want for _, want in cases]
    doms = [r[0] for r in df.select(W.registered_domain("url")).collect()]
    assert doms == ["a.com", "h.com", "h.com"]


def test_url_ip_hosts_and_ref_value_exact(spark):
    """r12 advice fixes: (a) IP-hosted URLs — bracketed IPv6 and
    dotted-quad IPv4 — extract the full host and use it whole as the
    registered domain (previously 'https://1.2.3.4/' bucketed as the
    pseudo-domain '3.4' and '[::1]' extracted '[' as the host);
    (b) 'ref' strips only for value-exact referral slugs — a
    meaningful 'ref' (refinement/pagination) survives normalization."""
    cases = [
        ("https://[::1]/p", "::1", "::1"),
        ("HTTPS://[2001:DB8::7]:443/x?utm_a=1", "2001:db8::7", "2001:db8::7"),
        ("https://1.2.3.4/q", "1.2.3.4", "1.2.3.4"),
        ("http://203.0.113.9:8080/r", "203.0.113.9", "203.0.113.9"),
        ("https://u:p@[2001:db8::2]/s", "2001:db8::2", "2001:db8::2"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], ["url"])
    hosts = [r[0] for r in df.select(W.url_host("url")).collect()]
    assert hosts == [h for _, h, _ in cases]
    doms = [r[0] for r in df.select(W.registered_domain("url")).collect()]
    assert doms == [d for _, _, d in cases]
    # IPv6 default-port strip + normalization end-to-end
    norm = [
        r[0]
        for r in spark.createDataFrame(
            [("HTTPS://[2001:DB8::7]:443/x?utm_a=1",)], ["url"]
        )
        .select(W.normalize_url("url"))
        .collect()
    ]
    assert norm == ["https://[2001:db8::7]/x"]
    # ref value-exactness: slug strips, non-slug and prefixed survive
    ref_cases = [
        ("https://a.com/p?ref=rss", "https://a.com/p"),
        ("https://a.com/p?ref=rss2", "https://a.com/p?ref=rss2"),
        ("https://a.com/p?ref=p2&x=1", "https://a.com/p?ref=p2&x=1"),
        ("https://a.com/p?x=1&ref=share", "https://a.com/p?x=1"),
    ]
    df2 = spark.createDataFrame([(u,) for u, _ in ref_cases], ["url"])
    got = [r[0] for r in df2.select(W.normalize_url("url")).collect()]
    assert got == [want for _, want in ref_cases]
    # blocklisting an IP-hosted domain works
    kept = W.blocklist_filter(df, ["1.2.3.4", "2001:db8::7"]).collect()
    assert len(kept) == 3


def test_blocklist_userinfo_bypass_and_null_urls(spark):
    """Review findings: 'https://x@blocked.com/' must NOT bypass the
    blocklist; NULL-url rows must be KEPT (the filter only removes
    confirmed hits)."""
    rows = [("https://x@blocked.com/page",), ("https://ok.org/a",), (None,)]
    df = spark.createDataFrame(rows, "url string")
    kept = W.blocklist_filter(df, ["blocked.com"]).collect()
    assert sorted(str(r["url"]) for r in kept) == ["None", "https://ok.org/a"]


def test_gif_background_index_fills_canvas():
    """Review finding: the logical-screen background uses the header's
    bg INDEX, not palette entry 0 — visible where a region first frame
    leaves border pixels showing the background."""
    d = 3  # region frames from f>=1; frame 0 full — so craft a custom GIF
    pal = M._synth_gif_palette(d, 0)
    idx = M._synth_gif_indices(d, 0, 4, 3)
    data = M._gif_lzw_encode(idx.reshape(-1), 4)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 8, 6, 0x80 | 0x03, 2, 0)  # bg=2
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 4, 3, 0)  # region frame
    out += bytes([4]) + bytes([len(data)]) + data + b"\x00\x3b"
    w, h, frames = M._gif_frames(bytes(out))
    assert (w, h) == (8, 6)
    assert np.array_equal(frames[0][0, 0], pal[2])  # border = bg color
    assert np.array_equal(frames[0][1:4, 1:5], pal[idx.reshape(-1)].reshape(3, 4, 3))


# ------------------------- HTML extraction ---------------------------

def test_html_to_text_semantics(spark):
    html = (
        '<html><head><STYLE media="x">body{}</STYLE>'
        "<script>var a = '<p>not text</p>';</script></head>"
        "<body><!-- hidden -->"
        "<h1>Title</h1><p>Hello <b>bold</b> world</p>"
        "<div>A &amp; B &amp;lt; C&nbsp;D &#39;q&#39;</div>"
        "<ul><li>one</li><li>two</li></ul>   trailing</body></html>"
    )
    df = spark.createDataFrame([(html,)], ["h"])
    got = df.select(W.html_to_text("h").alias("t")).collect()[0]["t"]
    assert got == (
        "Title\nHello bold world\nA & B &lt; C D 'q'\none\ntwo\ntrailing"
    )


def test_domain_cap_sample_caps_every_domain(spark):
    from bigdata_foundation_spark.queries import registry

    out = registry()["domain_cap_sample"].fn(spark, "/root/testdata/sf0.01")
    counts = out.groupBy("domain").count().collect()
    assert all(r["count"] <= 5 for r in counts)
    assert sum(r["count"] for r in counts) == out.count()


# --------------------------- image dHash ------------------------------

def test_dhash_known_values_and_planted_pairs(spark):
    # monotone horizontal gradient -> every gradient bit set -> -1
    grad = np.tile(np.arange(36, dtype=np.uint8) * 7, (16, 1))
    pix = np.stack([grad] * 3, axis=2)
    assert M._dhash64(pix) == -1
    # flat image -> no bits set
    assert M._dhash64(np.full((16, 36, 3), 9, dtype=np.uint8)) == 0
    # planted near-dup corpus: engine pipeline finds the (d, d+250)
    # pairs whose local 3x3 edit stays within hamming 3
    ids = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    media = M.synth_image_pair_table(ids)
    hashes = M.image_dhash_table(media)
    assert hashes.count() == 500  # every BMP decodable
    from bigdata_foundation_spark.operators.dedup import hash64_neardup_pairs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in hash64_neardup_pairs(hashes).collect()}
    planted = [(d, d + 250) for d in range(250)]
    found = [p for p in planted if p in pairs]
    assert len(found) >= 0.8 * len(planted)  # a few edits cross the threshold
    assert all(h <= 3 for h in pairs.values())


def test_image_dhash_table_drops_undecodable(spark):
    ids = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    media = M.synth_image_pair_table(ids).withColumn(
        "payload", F.lit(b"not an image")
    )
    assert M.image_dhash_table(media).count() == 0


def test_hash64_pairs_loose_threshold_best_effort(spark):
    """max_hamming >= chunks is ACCEPTED with best-effort recall (the
    legacy simhash_pairs contract — the full-battery run caught an
    earlier draft raising here and breaking simhash_pairs
    max_hamming=5): pairs within chunk agreement still verify."""
    from bigdata_foundation_spark.operators.dedup import hash64_neardup_pairs

    rows = [(1, 0), (2, 0b11111), (3, 0)]  # 1~3 identical; 2 differs in 5 bits
    df = spark.createDataFrame(rows, ["media_id", "dhash"])
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in hash64_neardup_pairs(df, max_hamming=5, chunks=4).collect()}
    assert got[(1, 3)] == 0
    assert got[(1, 2)] == 5  # shares 3 of 4 chunks -> candidate found


# --------------------------- fixed width ------------------------------

def test_parse_fixed_width_offsets_trim_casts(spark):
    from bigdata_foundation_spark.io import parse_fixed_width

    rows = [("        42    -7   hello world  2020-02-29",)]
    df = spark.createDataFrame(rows, ["line"])
    got = parse_fixed_width(
        df,
        "line",
        [
            ("a", 1, 10, "bigint"),
            ("b", 11, 6, "int"),
            ("c", 17, 14, "string"),
            ("d", 31, 13, "date"),
        ],
    ).collect()[0]
    import datetime

    assert got["a"] == 42 and got["b"] == -7
    assert got["c"] == "hello world"
    assert got["d"] == datetime.date(2020, 2, 29)


def test_review2_regressions(spark):
    """Second review pass: corrupt-JPEG ZeroDivisionError skipped (not
    task-fatal), CRLF folds to LF in html_to_text, sub-grid images
    rejected by dHash."""
    # malformed JPEG: zero sampling factors -> ZeroDivisionError inside
    # the decoder must SKIP the row, not fail the Arrow task
    bad_jpeg = (
        b"\xff\xd8\xff" + b"\xc0\x00\x11\x08\x00\x10\x00\x10\x03"
        + b"\x01\x00\x00\x02\x00\x01\x03\x00\x01"  # component with 0x00 factors
    )
    ids = spark.range(0, 2).withColumnRenamed("id", "doc_id")
    media = M.synth_image_pair_table(ids).withColumn("payload", F.lit(bytes(bad_jpeg)))
    assert M.image_dhash_table(media).count() == 0
    # CRLF normalization
    df = spark.createDataFrame([("<p>a\r\nb</p><div>c\rd</div>",)], ["h"])
    got = df.select(W.html_to_text("h").alias("t")).collect()[0]["t"]
    assert got == "a\nb\nc\nd"
    # sub-grid image -> ValueError (false near-dup pairs are worse
    # than dropping the file)
    with pytest.raises(ValueError):
        M._dhash64(np.zeros((4, 4, 3), dtype=np.uint8))
