"""Round-13 operator tests: the r12 advice fixes (og:description
fallback, header-block Content-Type, file-tier spill-dir routing,
append-retry schema re-check), plus the round's new surface.
"""

import pytest
from pyspark.sql import functions as F

from bigdata_foundation_spark.operators import web as W


# ---------------------- html_meta og:description ----------------------


def _meta_row(spark, html):
    df = spark.createDataFrame([(html,)], ["html"])
    return W.html_meta(df).drop("html").first()


def test_html_meta_og_description_fallback(spark):
    """Pages with ONLY property=og:description (both attribute orders)
    must fall back to it — r12 advice: the docstring promised this
    but both regexes matched name=description only."""
    r = _meta_row(
        spark,
        '<html><head><meta property="og:description" content="og only"></head></html>',
    )
    assert r["meta_description"] == "og only"
    r = _meta_row(
        spark,
        '<html><head><meta content="og first" property="og:description"></head></html>',
    )
    assert r["meta_description"] == "og first"


def test_html_meta_name_description_precedence(spark):
    """name=description still wins over og:description when both
    exist (documented precedence)."""
    r = _meta_row(
        spark,
        '<html><head><meta property="og:description" content="og">'
        '<meta name="description" content="plain"></head></html>',
    )
    assert r["meta_description"] == "plain"


# ---------------------- parse_warc Content-Type -----------------------


def test_parse_warc_content_type_header_block_only(spark):
    """A response whose HTTP headers LACK Content-Type must yield ''
    even when the body text contains a 'Content-Type:' line — r12
    advice: the old regex scanned the whole payload."""
    from bigdata_foundation_spark.io import parse_warc

    body = "a page that says\r\nContent-Type: text/evil\r\nin its body"
    http = "HTTP/1.1 200 OK\r\nServer: s\r\n\r\n" + body
    rec = (
        "WARC-Type: response\r\nWARC-Target-URI: https://x.com/\r\n"
        f"Content-Length: {len(http)}\r\n\r\n" + http
    )
    df = spark.createDataFrame([(rec,)], ["record"])
    row = parse_warc(df).first()
    assert row["http_status"] == 200
    assert row["content_type"] == ""
    assert row["body"] == body


def test_parse_warc_content_type_from_header(spark):
    from bigdata_foundation_spark.io import parse_warc

    http = "HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=x\r\n\r\nhi"
    rec = (
        "WARC-Type: response\r\nWARC-Target-URI: https://x.com/\r\n"
        f"Content-Length: {len(http)}\r\n\r\n" + http
    )
    df = spark.createDataFrame([(rec,)], ["record"])
    assert parse_warc(df).first()["content_type"] == "text/html"


# ---------------------- file-tier routing guards -----------------------


class _FakeSC:
    def __init__(self, master):
        self.master = master


class _FakeSpark:
    def __init__(self, master):
        self.sparkContext = _FakeSC(master)


def test_file_tier_availability_rules():
    """auto must not route to the file tier on a multi-host master
    without a shared spill_dir (r12 advice: the default tempdir is
    driver-local and unreadable from executors there)."""
    from bigdata_foundation_spark.graph import paths as P

    assert P._file_tier_available(_FakeSpark("local[32]"), None)
    assert not P._file_tier_available(_FakeSpark("spark://h:7077"), None)
    assert P._file_tier_available(_FakeSpark("spark://h:7077"), "/shared/x")
    with pytest.raises(ValueError, match="SHARED"):
        P._require_file_tier(_FakeSpark("yarn"), None)
    P._require_file_tier(_FakeSpark("yarn"), "/shared/x")  # no raise


def test_spill_dir_cache_keyed_on_destination(spark, tmp_path):
    """A projection first spilled to the default local tempdir must
    RE-SPILL when the caller later supplies shared storage (r12
    advice: the old cache ignored the new spill_dir)."""
    from bigdata_foundation_spark.graph import paths as P

    df = spark.createDataFrame(
        [("1", "2", 1.0), ("2", "3", 2.0)], ["src", "dst", "cost"]
    )
    proj = P.build_projection(df)
    default_spill = P._get_spill_dir(proj, None)
    assert P._get_spill_dir(proj, None) == default_spill  # cached
    shared = str(tmp_path / "shared")
    import os

    os.makedirs(shared, exist_ok=True)
    shared_spill = P._get_spill_dir(proj, shared)
    assert shared_spill != default_spill
    assert shared_spill.startswith(shared)
    assert P._get_spill_dir(proj, shared) == shared_spill  # cached per dest


# ---------------------- snapshot append schema race ---------------------


def test_snapshot_append_schema_recheck_in_retry(spark, tmp_path, monkeypatch):
    """An append racing a concurrent overwrite with a DIFFERENT schema
    must fail fast instead of committing a mixed-schema file set (r12
    advice: the pre-write check ran only against the pre-race head)."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a")], ["id", "s"])
    bio.write_snapshot(df1, tdir, mode="overwrite")

    # Simulate the race: after write_snapshot read the head for its
    # pre-write check, a concurrent overwrite changes the schema. We
    # intercept the EXCL-create to fire the concurrent commit once,
    # forcing the retry loop to re-read the new head.
    import os as _os

    real_open = _os.open
    fired = {"done": False}

    def racing_open(path, flags, *a, **kw):
        if (
            not fired["done"]
            and "_manifests" in str(path)
            and flags & _os.O_EXCL
        ):
            fired["done"] = True
            df_new = spark.createDataFrame([(2.5,)], ["other"])
            bio.write_snapshot(df_new, tdir, mode="overwrite")
        return real_open(path, flags, *a, **kw)

    monkeypatch.setattr(_os, "open", racing_open)
    df2 = spark.createDataFrame([(2, "b")], ["id", "s"])
    with pytest.raises(ValueError, match="schema"):
        bio.write_snapshot(df2, tdir, mode="append")


# ---------------------- splittable .warc.gz -----------------------------


def _make_warc_gz(tmp_path, n=60, name="t.warc.gz"):
    import gzip

    recs, blob = [], b""
    for i in range(n):
        body = f"<html><body><p>doc {i} " + "y" * (40 + 29 * (i % 11)) + "</p></body></html>"
        http = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{body}"
        rec = (
            f"WARC-Type: response\r\nWARC-Target-URI: https://s{i % 5}.com/p/{i}\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: {len(http)}\r\n\r\n{http}"
        )
        recs.append(rec)
        blob += gzip.compress(("WARC/1.0\r\n" + rec + "\r\n\r\n").encode())
    path = str(tmp_path / name)
    with open(path, "wb") as fh:
        fh.write(blob)
    return path, recs


def test_read_warc_gz_splits_and_roundtrips(spark, tmp_path):
    """A multi-member archive must split into >1 byte-range tasks and
    every record must round-trip byte-exact exactly once (mid-range
    re-synchronization: members cross every split boundary)."""
    from bigdata_foundation_spark.io import read_warc_gz

    path, recs = _make_warc_gz(tmp_path)
    df = read_warc_gz(spark, path, target_split_bytes=2048)
    assert df.rdd.getNumPartitions() > 1
    got = [r["record"] for r in df.collect()]
    assert sorted(got) == sorted(recs)


def test_read_warc_gz_single_split_matches(spark, tmp_path):
    """Same archive through ONE range (no re-sync path) — identical."""
    from bigdata_foundation_spark.io import read_warc_gz

    path, recs = _make_warc_gz(tmp_path, n=12)
    df = read_warc_gz(spark, path, target_split_bytes=1 << 30)
    got = [r["record"] for r in df.collect()]
    assert sorted(got) == sorted(recs)


def test_read_warc_gz_false_magic_rejected(spark, tmp_path):
    """A record whose BODY contains the raw gzip magic bytes must not
    desynchronize a mid-range task — candidates are validated by
    CRC-checked inflation, not by the magic alone."""
    import gzip

    recs, blob = [], b""
    for i in range(30):
        # plant the 3-byte gzip magic inside the body text
        body = "A" * 50 + "\x1f\x8b\x08" + "B" * (60 + 17 * (i % 7))
        http = f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n{body}"
        rec = (
            f"WARC-Type: response\r\nWARC-Target-URI: https://m.com/{i}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n{http}"
        )
        recs.append(rec)
        blob += gzip.compress(("WARC/1.0\r\n" + rec + "\r\n\r\n").encode())
    path = str(tmp_path / "magic.warc.gz")
    with open(path, "wb") as fh:
        fh.write(blob)
    from bigdata_foundation_spark.io import read_warc_gz

    df = read_warc_gz(spark, path, target_split_bytes=1024)
    assert df.rdd.getNumPartitions() > 1
    got = [r["record"] for r in df.collect()]
    assert sorted(got) == sorted(recs)


def test_read_warc_gz_leading_garbage_resyncs(spark, tmp_path):
    """Non-gzip bytes BEFORE the first member (a truncated/corrupt
    prefix) must not silence range 0 — every task re-synchronizes by
    scan + validated inflate, including the first."""
    import gzip

    recs, blob = [], b"NOT GZIP JUNK" * 10
    for i in range(8):
        rec = (
            f"WARC-Type: response\r\nWARC-Target-URI: https://g.com/{i}\r\n"
            f"Content-Length: 2\r\n\r\nhi"
        )
        recs.append(rec)
        blob += gzip.compress(("WARC/1.0\r\n" + rec + "\r\n\r\n").encode())
    path = str(tmp_path / "garbage.warc.gz")
    with open(path, "wb") as fh:
        fh.write(blob)
    from bigdata_foundation_spark.io import read_warc_gz

    got = [r["record"] for r in read_warc_gz(spark, path, target_split_bytes=1 << 20).collect()]
    assert sorted(got) == sorted(recs)


def test_warc_gz_parse_matches_plain_warc_parse(spark):
    """The gate contract: the SAME records through the gzip-member
    path and the plain-text-split path land on the SAME aggregate."""
    from bigdata_foundation_spark.queries import registry

    reg = registry()
    sf = "/root/testdata/sf0.001"
    a = {
        tuple(r)
        for r in reg["warc_parse"].fn(spark, sf).collect()
    }
    b = {
        tuple(r)
        for r in reg["warc_gz_parse"].fn(spark, sf).collect()
    }
    assert a == b


# ---------------------- write_warc_gz round trip -------------------------


def test_write_warc_gz_roundtrip_multifile(spark, tmp_path):
    """Executors write one per-record-gzip file per partition; the
    member-aware reader gets every record back byte-exact; empty
    partitions write nothing."""
    from bigdata_foundation_spark.io import read_warc_gz, write_warc_gz

    recs = [
        f"WARC-Type: response\r\nWARC-Target-URI: https://w.com/{i}\r\n"
        f"Content-Length: 2\r\n\r\nok"
        for i in range(40)
    ]
    df = spark.createDataFrame([(r,) for r in recs], ["record"]).repartition(8)
    out_dir = str(tmp_path / "out")
    written = write_warc_gz(df, out_dir)
    assert sum(n for _, n in written) == 40
    assert 1 <= len(written) <= 8
    assert all(f.endswith(".warc.gz") for f, _ in written)
    got = [r["record"] for r in read_warc_gz(spark, out_dir).collect()]
    assert sorted(got) == sorted(recs)


def test_write_warc_gz_skips_null_and_empty(spark, tmp_path):
    from bigdata_foundation_spark.io import write_warc_gz

    df = spark.createDataFrame(
        [("a-rec",), (None,), ("",)], "record string"
    ).coalesce(1)
    written = write_warc_gz(df, str(tmp_path / "o2"))
    assert sum(n for _, n in written) == 1


# ---------------------- robots_crawl_delay ------------------------------


def test_robots_crawl_delay_semantics(spark):
    """Only '*' sections emit; later values override; absent domains
    produce NO row (caller default applies); decimals parse."""
    rows = [
        ("a.com", "User-agent: g\nCrawl-delay: 9\nUser-agent: *\n"
                  "Crawl-delay: 2.5\nCrawl-delay: 4\nUser-agent: b\nCrawl-delay: 7"),
        ("b.com", "User-agent: *\nCrawl-delay: 1.5"),
        ("c.com", "User-agent: onlybot\nCrawl-delay: 3"),
    ]
    robots = spark.createDataFrame(rows, ["domain", "robots_txt"])
    got = {
        r["domain"]: r["crawl_delay"]
        for r in W.robots_crawl_delay(robots).collect()
    }
    assert got == {"a.com": 4.0, "b.com": 1.5}


# ---------------------- snapshot history + as-of -------------------------


def test_snapshot_history_and_as_of(spark, tmp_path):
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1,)], ["id"])
    v1 = bio.write_snapshot(df, tdir, mode="overwrite")
    v2 = bio.write_snapshot(df, tdir, mode="append", commit_id="c2")
    hist = bio.snapshot_history(tdir)
    assert [h["version"] for h in hist] == [v1, v2]
    assert hist[0]["parent"] is None and hist[1]["parent"] == v1
    assert hist[1]["commit_id"] == "c2"
    t1, t2 = hist[0]["committed_at"], hist[1]["committed_at"]
    assert t1 is not None and t2 is not None and t1 <= t2
    # as-of exactly t1 sees v1; as-of after t2 sees v2; both modes
    # conflict with an explicit version; before t1 raises
    assert bio.read_at_version(spark, tdir, as_of=t1).count() == 1
    assert bio.read_at_version(spark, tdir, as_of=t2 + 1).count() == 2
    with pytest.raises(ValueError, match="not both"):
        bio.read_at_version(spark, tdir, version=v1, as_of=t1)
    with pytest.raises(ValueError, match="at or before"):
        bio.read_at_version(spark, tdir, as_of=t1 - 10)


# ---------------------- robots.txt v2: wildcards + Allow ----------------


def test_robots_rules_wildcard_translation(spark):
    """'*' and a trailing '$' translate to regex at RULE BUILD time;
    other metacharacters are literal; Allow lines emit typed rows."""
    txt = (
        "User-agent: *\n"
        "Disallow: /*.zip$\n"
        "Allow: /a(b)+c\n"
        "Disallow: /plain\n"
    )
    robots = spark.createDataFrame([("a.com", txt)], ["domain", "robots_txt"])
    rows = {
        (r["rule"], r["prefix"]): (r["pattern"], r["spec"])
        for r in W.robots_rules(robots).collect()
    }
    assert rows[("disallow", "/*.zip$")] == ("^/.*\\.zip$", 7)
    assert rows[("allow", "/a(b)+c")] == ("^/a\\(b\\)\\+c", 7)
    assert rows[("disallow", "/plain")] == ("^/plain", 6)


def test_robots_filter_precedence(spark):
    """RFC 9309 precedence: longest matching rule wins; on an
    allow/disallow specificity tie, ALLOW wins; no match keeps."""
    txt = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/pub\n"
        "Disallow: /*.zip$\n"
        "Allow: /dup\n"
        "Disallow: /dup\n"
        "Disallow: /\n"
        "Allow: /articles/\n"
    )
    robots = spark.createDataFrame([("a.com", txt)], ["domain", "robots_txt"])
    rules = W.robots_rules(robots)
    cases = [
        ("https://a.com/private/x", False),      # /private beats /
        ("https://a.com/private/pub/y", True),   # longer allow wins
        ("https://a.com/f.zip", False),          # wildcard + $ anchor
        ("https://a.com/f.zipx", False),         # $ fails but Disallow: / blocks
        ("https://a.com/dup/d", True),           # tie -> allow wins
        ("https://a.com/articles/1", True),      # allow /articles/ beats /
        ("https://other.org/x", True),           # no rules for domain
    ]
    urls = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    kept = {r["url"] for r in W.robots_filter(urls, rules).collect()}
    for u, want in cases:
        assert (u in kept) == want, u


def test_robots_filter_legacy_prefix_table(spark):
    """A legacy (domain, prefix) rule table still filters as literal
    anchored disallow prefixes."""
    rules = spark.createDataFrame(
        [("a.com", "/private")], ["domain", "prefix"]
    )
    urls = spark.createDataFrame(
        [("https://a.com/private/x",), ("https://a.com/ok",)], ["url"]
    )
    kept = [r["url"] for r in W.robots_filter(urls, rules).collect()]
    assert kept == ["https://a.com/ok"]


# ---------------------- PSL registered_domain ---------------------------


def test_registered_domain_psl_rule_kinds(spark):
    """Every PSL rule kind: plain 2-label, 3-label, wildcard,
    exception (checked before the www-strip), IP literals, and the
    implicit '*' default."""
    cases = [
        ("https://www.example.com/a", "example.com"),
        ("https://news.site3.co.uk/b", "site3.co.uk"),
        ("https://district3.k12.ca.us/z", "district3.k12.ca.us"),
        ("https://foo.ca.us/z", "foo.ca.us"),
        ("https://a.b.shop2.kawasaki.jp/x", "b.shop2.kawasaki.jp"),
        ("https://Sub1.City.Kawasaki.JP/y", "city.kawasaki.jp"),
        ("https://x.anything.ck/", "x.anything.ck"),
        ("https://deep.www.ck/", "www.ck"),
        ("https://1.2.3.4/q", "1.2.3.4"),
        ("https://school.k12.tr/e", "school.k12.tr"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(W.registered_domain("url")).collect()]
    assert got == [want for _, want in cases]


def test_psl_sql_replay_agrees(spark):
    """The generated DuckDB CASE must agree with the Spark expression
    on the same hosts (the oracle-lockstep contract)."""
    import duckdb

    urls = [
        "https://www.example.com/a",
        "https://news.site3.co.uk/b",
        "https://a.b.shop2.kawasaki.jp/x",
        "https://Sub1.City.Kawasaki.JP/y",
        "https://district3.k12.ca.us/z",
        "https://deep.www.ck/",
        "https://1.2.3.4/q",
        "https://[2001:DB8::7]/v6",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r[0] for r in df.select(W.registered_domain("url")).collect()]
    host0 = (
        "regexp_replace(lower(regexp_extract(url, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?"
        "(\\[[^\\]/?#]*\\]|[^/:?#@]+)', 1)), '^\\[|\\]$', '', 'g')"
    )
    hostn = f"regexp_replace({host0}, '^www\\.', '', 'g')"
    sql = W.psl_domain_sql(host0, hostn)
    con = duckdb.connect()
    con.execute("create table u(url varchar)")
    for u in urls:
        con.execute("insert into u values (?)", [u])
    duck = [r[0] for r in con.execute(f"select {sql} from u").fetchall()]
    assert duck == got


# ---------------------- snapshot log-store seam -------------------------


def test_posix_log_store_passes_contract(tmp_path):
    from bigdata_foundation_spark import io as bio

    bio.check_log_store(bio.PosixSnapshotLogStore(), str(tmp_path))


def test_lying_log_store_detected(tmp_path):
    """A backend whose publish is check-then-write (the blind-PUT
    shape every naive S3 implementation has) must be DETECTED by the
    contract probe — it would silently lose racing commits."""
    import json
    import os

    from bigdata_foundation_spark import io as bio

    class LyingStore(bio.PosixSnapshotLogStore):
        def publish(self, mdir, version, manifest):
            # non-atomic: existence check, then unconditional write
            path = os.path.join(mdir, f"v{version:08d}.json")
            with open(path, "w") as fh:  # blind PUT — always "wins"
                json.dump(manifest, fh)
            return True

    with pytest.raises(ValueError, match="non-atomic"):
        bio.check_log_store(LyingStore(), str(tmp_path))


def test_snapshot_roundtrip_through_custom_store(spark, tmp_path):
    """The commit path must route every manifest operation through the
    installed store — verified by a counting wrapper."""
    from bigdata_foundation_spark import io as bio

    calls = {"publish": 0, "list": 0}

    class CountingStore(bio.PosixSnapshotLogStore):
        def publish(self, mdir, version, manifest):
            calls["publish"] += 1
            return super().publish(mdir, version, manifest)

        def list_versions(self, mdir):
            calls["list"] += 1
            return super().list_versions(mdir)

    old = bio.get_snapshot_log_store()
    bio.set_snapshot_log_store(CountingStore())
    try:
        tdir = str(tmp_path / "tbl")
        df = spark.createDataFrame([(1,)], ["id"])
        v1 = bio.write_snapshot(df, tdir, mode="overwrite")
        v2 = bio.write_snapshot(df, tdir, mode="append")
        assert (v1, v2) == (1, 2)
        assert calls["publish"] == 2 and calls["list"] >= 2
        assert bio.read_at_version(spark, tdir, 2).count() == 2
    finally:
        bio.set_snapshot_log_store(old)


# ---------------------- CDX member index + selective read ----------------


def test_write_warc_gz_index_and_selective_read(spark, tmp_path):
    """index=True records exact (offset, length, target_uri) per
    member; the indexed reader with a predicate returns EXACTLY the
    matching records (no leak in either direction) and without one
    returns everything, byte-exact."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark.io import read_warc_gz_indexed, write_warc_gz

    recs = [
        f"WARC-Type: response\r\nWARC-Target-URI: https://s{i % 3}.com/{i}\r\n"
        f"Content-Length: 2\r\n\r\nok"
        for i in range(30)
    ]
    df = spark.createDataFrame([(r,) for r in recs], ["record"]).repartition(4)
    out_dir = str(tmp_path / "idx")
    write_warc_gz(df, out_dir, index=True)

    got_all = [r["record"] for r in read_warc_gz_indexed(spark, out_dir).collect()]
    assert sorted(got_all) == sorted(recs)

    want = [r for r in recs if "https://s1.com/" in r]
    got = [
        r["record"]
        for r in read_warc_gz_indexed(
            spark, out_dir, predicate=F.col("target_uri").startswith("https://s1.com/")
        ).collect()
    ]
    assert sorted(got) == sorted(want)


def test_warc_cdx_sidecar_ignored_by_plain_reader(spark, tmp_path):
    """The _cdx sidecar directory must not confuse the byte-range
    reader's directory listing — plain read still sees every record."""
    from bigdata_foundation_spark.io import read_warc_gz, write_warc_gz

    recs = [
        f"WARC-Type: response\r\nWARC-Target-URI: https://p.com/{i}\r\n"
        f"Content-Length: 2\r\n\r\nok"
        for i in range(12)
    ]
    df = spark.createDataFrame([(r,) for r in recs], ["record"]).coalesce(1)
    out_dir = str(tmp_path / "mix")
    write_warc_gz(df, out_dir, index=True)
    got = [r["record"] for r in read_warc_gz(spark, out_dir).collect()]
    assert sorted(got) == sorted(recs)


def test_warc_cdx_index_offsets_are_exact(spark, tmp_path):
    """Each (offset, length) must inflate standalone to its member —
    the contract read_warc_gz_indexed relies on."""
    import gzip

    from bigdata_foundation_spark.io import write_warc_gz

    recs = [
        f"WARC-Type: response\r\nWARC-Target-URI: https://e.com/{i}\r\n"
        f"Content-Length: 2\r\n\r\nok"
        for i in range(9)
    ]
    df = spark.createDataFrame([(r,) for r in recs], ["record"]).coalesce(1)
    out_dir = str(tmp_path / "exact")
    write_warc_gz(df, out_dir, index=True)
    idx = spark.read.parquet(out_dir + "/_cdx").collect()
    assert len(idx) == 9
    got = []
    for row in idx:
        with open(row["file"], "rb") as fh:
            fh.seek(row["offset"])
            text = gzip.decompress(fh.read(row["length"])).decode()
        assert text.startswith("WARC/1.0\r\n") and text.endswith("\r\n\r\n")
        got.append(text[len("WARC/1.0\r\n"):-4])
        assert row["target_uri"].startswith("https://e.com/")
    assert sorted(got) == sorted(recs)


# ---------------------- snapshot merge / delete ---------------------------


def test_snapshot_merge_file_granular_and_time_travel(spark, tmp_path):
    """Only files holding matched keys are rewritten (untouched files
    carry over BY REFERENCE); the parent version still reads the
    pre-merge rows; merged state = replaced + inserted + untouched."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("v")
    )
    v1 = bio.write_snapshot(
        base.repartitionByRange(4, F.col("k")), tdir, mode="overwrite"
    )
    man1 = bio._read_manifest(tdir, v1)
    updates = spark.createDataFrame(
        [(3, -1.0), (7, -2.0), (500, -3.0)], "k bigint, v double"
    )
    v2 = bio.snapshot_merge(spark, tdir, updates, ["k"])
    man2 = bio._read_manifest(tdir, v2)
    carried = set(man1["files"]) & set(man2["files"])
    # keys 3 and 7 live in the FIRST range file; the other 3 files
    # must carry over untouched
    assert len(carried) == 3
    assert man2["mode"] == "merge"
    got = {r["k"]: r["v"] for r in bio.read_at_version(spark, tdir, v2).collect()}
    assert len(got) == 101
    assert got[3] == -1.0 and got[7] == -2.0 and got[500] == -3.0
    assert got[4] == 40.0
    # time travel: parent still pre-merge
    old = {r["k"]: r["v"] for r in bio.read_at_version(spark, tdir, v1).collect()}
    assert old[3] == 30.0 and 500 not in old
    # append deltas are no longer well-defined across the merge
    with pytest.raises(ValueError, match="merge"):
        bio.read_version_delta(spark, tdir, v1, v2)


def test_snapshot_merge_rejects_duplicate_keys_and_schema_drift(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl2")
    base = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    bio.write_snapshot(base, tdir, mode="overwrite")
    dup = spark.createDataFrame([(1, 2.0), (1, 3.0)], "k bigint, v double")
    with pytest.raises(ValueError, match="duplicate key"):
        bio.snapshot_merge(spark, tdir, dup, ["k"])
    drift = spark.createDataFrame([(1, "x")], "k bigint, v string")
    with pytest.raises(ValueError, match="schema"):
        bio.snapshot_merge(spark, tdir, drift, ["k"])


def test_snapshot_merge_commit_id_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl3")
    base = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    bio.write_snapshot(base, tdir, mode="overwrite")
    updates = spark.createDataFrame([(1, 9.0)], "k bigint, v double")
    v2 = bio.snapshot_merge(spark, tdir, updates, ["k"], commit_id="mX")
    v2b = bio.snapshot_merge(spark, tdir, updates, ["k"], commit_id="mX")
    assert v2 == v2b
    assert bio.snapshot_versions(tdir)[-1] == v2


def test_snapshot_delete_prune_noop_and_time_travel(spark, tmp_path):
    """Files outside the prune range are never rewritten; a delete
    matching nothing commits nothing; old versions keep the rows."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl4")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("double").alias("q")
    )
    v1 = bio.write_snapshot(
        base.repartitionByRange(4, F.col("q")), tdir, mode="overwrite"
    )
    man1 = bio._read_manifest(tdir, v1)
    v2 = bio.snapshot_delete(
        spark, tdir, F.col("q") >= 8.0, prune=[("q", 8.0, None)]
    )
    man2 = bio._read_manifest(tdir, v2)
    assert man2["mode"] == "delete"
    # the low-q range files carry over by reference
    assert len(set(man1["files"]) & set(man2["files"])) >= 2
    assert bio.read_at_version(spark, tdir, v2).count() == 80
    assert bio.read_at_version(spark, tdir, v1).count() == 100
    # nothing matches: head returned unchanged, no new version
    v3 = bio.snapshot_delete(spark, tdir, F.col("q") > 99.0)
    assert v3 == v2 and bio.snapshot_versions(tdir)[-1] == v2


# ---------------------- streaming snapshot merge sink --------------------


def _feed_stream(spark, df, feed_dir, n_files, key):
    from pyspark.sql import functions as F

    df.repartitionByRange(n_files, F.col(key)).write.parquet(feed_dir)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )


def test_streaming_snapshot_merge_multibatch(spark, tmp_path):
    """Each micro-batch merges file-granularly; the end state is the
    base with matched keys replaced and new keys inserted; every
    batch boundary stays a readable version."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.sinks import foreach_batch_snapshot_merge

    tdir = str(tmp_path / "tbl")
    base = spark.range(0, 60).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    bio.write_snapshot(base.repartitionByRange(4, F.col("k")), tdir, mode="overwrite")
    updates = spark.createDataFrame(
        [(5, 1.0), (25, 2.0), (45, 3.0), (100, 4.0)], "k bigint, v double"
    )
    stream = _feed_stream(spark, updates, str(tmp_path / "feed"), 3, "k")
    versions = foreach_batch_snapshot_merge(stream, tdir, ["k"])
    assert len(versions) == 3
    got = {r["k"]: r["v"] for r in bio.read_at_version(spark, tdir).collect()}
    assert len(got) == 61
    assert got[5] == 1.0 and got[25] == 2.0 and got[45] == 3.0 and got[100] == 4.0
    assert got[6] == 0.0


def test_streaming_snapshot_merge_replay_is_noop_with_checkpoint(spark, tmp_path):
    """With a persistent checkpoint, a full re-run of an already-
    committed feed commits NOTHING (batch-id commit ids) — and a
    replay after new files landed processes only the new batch."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.sinks import foreach_batch_snapshot_merge

    tdir = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    feed = str(tmp_path / "feed")
    base = spark.range(0, 20).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    bio.write_snapshot(base, tdir, mode="overwrite")
    updates = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double")
    stream = _feed_stream(spark, updates, feed, 2, "k")
    foreach_batch_snapshot_merge(stream, tdir, ["k"], checkpoint_dir=ckpt)
    head = bio.snapshot_versions(tdir)[-1]
    # replay the same checkpoint: the source has no new files, so no
    # batches fire and no versions are minted
    stream2 = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    foreach_batch_snapshot_merge(stream2, tdir, ["k"], checkpoint_dir=ckpt)
    assert bio.snapshot_versions(tdir)[-1] == head


def test_streaming_snapshot_merge_order_col_last_wins(spark, tmp_path):
    """Within one batch, the row with the LARGEST order_col wins per
    key; without order_col duplicate keys raise."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.sinks import foreach_batch_snapshot_merge

    tdir = str(tmp_path / "tbl")
    base = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v"), F.lit(0).cast("bigint").alias("seq")
    )
    bio.write_snapshot(base, tdir, mode="overwrite")
    dup = spark.createDataFrame(
        [(1, 10.0, 1), (1, 20.0, 2), (2, 5.0, 1)], "k bigint, v double, seq bigint"
    )
    feed = str(tmp_path / "feed")
    dup.coalesce(1).write.parquet(feed)
    stream = spark.readStream.schema(dup.schema).parquet(feed)
    foreach_batch_snapshot_merge(stream, tdir, ["k"], order_col="seq")
    got = {r["k"]: r["v"] for r in bio.read_at_version(spark, tdir).collect()}
    assert got[1] == 20.0 and got[2] == 5.0 and got[0] == 0.0


def test_streaming_snapshot_merge_bootstraps_empty_table(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.sinks import foreach_batch_snapshot_merge

    tdir = str(tmp_path / "tbl")
    rows = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double")
    feed = str(tmp_path / "feed")
    rows.coalesce(1).write.parquet(feed)
    stream = spark.readStream.schema(rows.schema).parquet(feed)
    versions = foreach_batch_snapshot_merge(stream, tdir, ["k"])
    assert versions == [1]
    assert bio.read_at_version(spark, tdir).count() == 2


# ---------------------- build_warc_cdx (index an existing archive) -------


def test_build_warc_cdx_then_selective_read(spark, tmp_path):
    """An archive NOT written by write_warc_gz (hand-packed members,
    no sidecar) gets indexed by one distributed scan; selective reads
    then return exactly the matching records."""
    import gzip

    from pyspark.sql import functions as F

    from bigdata_foundation_spark.io import build_warc_cdx, read_warc_gz_indexed

    d = tmp_path / "arch"
    d.mkdir()
    recs = []
    for fidx in range(2):
        blob = b""
        for i in range(10):
            n = fidx * 10 + i
            rec = (
                f"WARC-Type: response\r\nWARC-Target-URI: https://c{n % 4}.com/{n}\r\n"
                f"Content-Length: 2\r\n\r\nok"
            )
            recs.append(rec)
            blob += gzip.compress(("WARC/1.0\r\n" + rec + "\r\n\r\n").encode())
        (d / f"crawl-{fidx}.warc.gz").write_bytes(blob)
    n = build_warc_cdx(spark, str(d), target_split_bytes=256)
    assert n == 20
    want = [r for r in recs if "https://c2.com/" in r]
    got = [
        r["record"]
        for r in read_warc_gz_indexed(
            spark, str(d), predicate=F.col("target_uri").startswith("https://c2.com/")
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    got_all = [r["record"] for r in read_warc_gz_indexed(spark, str(d)).collect()]
    assert sorted(got_all) == sorted(recs)


# ---------------------- merge/delete conflict auto-retry ------------------


def test_snapshot_merge_retries_after_concurrent_commit(spark, tmp_path):
    """A concurrent append landing between the merge's computation and
    its publish: without retries the merge raises (lost-update
    protection); with max_retries it recomputes against the new head,
    preserving BOTH the concurrent rows and the merge."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame([(i, 0.0) for i in range(10)], "k bigint, v double")
    bio.write_snapshot(base, tdir, mode="overwrite")
    updates = spark.createDataFrame([(3, 9.0)], "k bigint, v double")
    concurrent = spark.createDataFrame([(100, 7.0)], "k bigint, v double")

    real = bio.get_snapshot_log_store()

    class RacingStore(bio.PosixSnapshotLogStore):
        """First publish attempt loses: a concurrent append takes the
        version first (through the REAL store), then this publish
        correctly reports the EXCL loss."""

        def __init__(self):
            self.raced = False

        def publish(self, mdir, version, manifest):
            if not self.raced and manifest.get("mode") == "merge":
                self.raced = True
                bio.set_snapshot_log_store(real)
                try:
                    bio.write_snapshot(concurrent, tdir, mode="append")
                finally:
                    bio.set_snapshot_log_store(self)
            return super().publish(mdir, version, manifest)

    bio.set_snapshot_log_store(RacingStore())
    try:
        with pytest.raises(RuntimeError, match="concurrent commit"):
            bio.snapshot_merge(spark, tdir, updates, ["k"])
    finally:
        bio.set_snapshot_log_store(real)

    # retry path: race again, this time with max_retries=1
    concurrent = spark.createDataFrame([(200, 8.0)], "k bigint, v double")
    bio.set_snapshot_log_store(RacingStore())
    try:
        v = bio.snapshot_merge(spark, tdir, updates, ["k"], max_retries=1)
    finally:
        bio.set_snapshot_log_store(real)
    got = {r["k"]: r["v"] for r in bio.read_at_version(spark, tdir, v).collect()}
    assert got[3] == 9.0          # the merge applied
    assert got[100] == 7.0        # first race's concurrent append survived
    assert got[200] == 8.0        # second race's concurrent append survived


# ---------------------- snapshot zorder --------------------------------


def test_snapshot_zorder_rows_and_skipping(spark, tmp_path):
    """Z-ordered rewrite commits identical rows as a new version, and
    footer ranges become tight on BOTH clustered columns: a 2-D prune
    opens strictly fewer files than the shuffled pre-zorder layout."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl")
    base = (
        spark.range(0, 4000)
        .select(
            (F.col("id") % 63).cast("double").alias("x"),
            ((F.col("id") * 37) % 101).cast("double").alias("y"),
        )
        .repartition(8)  # shuffled: every file spans ~the full x/y range
    )
    v1 = bio.write_snapshot(base, tdir, mode="overwrite")
    v2 = bio.snapshot_zorder(spark, tdir, ["x", "y"], n_files=8)
    assert v2 == v1 + 1
    a = sorted((r["x"], r["y"]) for r in bio.read_at_version(spark, tdir, v1).collect())
    b = sorted((r["x"], r["y"]) for r in bio.read_at_version(spark, tdir, v2).collect())
    assert a == b

    def files_opened(v):
        man = bio._read_manifest(tdir, v)
        stats = man.get("stats", {})
        from bigdata_foundation_spark.io import _intersecting_files

        return len(
            _intersecting_files(
                man["files"], stats, [("x", 0.0, 8.0), ("y", 0.0, 12.0)]
            )
        )

    assert files_opened(v1) == 8           # shuffled: nothing prunes
    assert files_opened(v2) < 8            # clustered: the 2-D corner prunes
    got = (
        bio.read_at_version(spark, tdir, v2, prune=[("x", 0.0, 8.0), ("y", 0.0, 12.0)])
        .filter((F.col("x") <= 8) & (F.col("y") <= 12))
        .count()
    )
    want = sum(1 for x, y in a if x <= 8 and y <= 12)
    assert got == want
