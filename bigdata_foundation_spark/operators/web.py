"""Web/URL curation primitives — the pre-crawl-text half of a
training-data pipeline (C4, RefinedWeb, Dolma all start here): URL
normalization for exact URL-level dedup, registered-domain extraction
for per-domain statistics / caps, and domain blocklist filtering.

Every operator here is a pure scan-side JVM expression tree (regexp
extract/replace + string ops) — zero shuffle, zero Python — so URL
normalization of a 100 TB crawl runs at scan speed inside whole-stage
codegen, and the DuckDB oracle replays the identical regex pipeline
(all patterns are RE2-safe: no lookarounds, no backreferences in the
MATCH; only $n/\\n group substitutions, where a non-participating
group substitutes the empty string in BOTH engines).

Reference scope note: the reference repo has no web/URL surface —
this module is north-star LLM-pipeline coverage (SURVEY.md §2.4),
like the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking param=value alternation stripped by normalize_url; shared
# verbatim with the SQL oracle — extend both together. utm_*/fbclid/
# gclid/msclkid strip regardless of value; ``ref`` strips ONLY for a
# closed set of referral slugs (r11 advice: ``ref`` is commonly a
# meaningful param — refinements/pagination — so a blanket strip
# conflates genuinely distinct pages and inflates the URL-level
# exact-duplicate rate). The run-consuming outer pattern appends
# (&|$), so the ref slugs are value-EXACT: ``ref=rss2`` survives.
TRACKING_PARAM_RE = (
    r"(?:utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&]*"
    r"|ref=(?:rss|feed|share|social|twitter|facebook|newsletter|email)"
)

# --------------------------------------------------------------------
# Public Suffix List (r13 — r12 verdict task 5: the hardcoded
# multi-suffix regex is replaced by a PSL DATA FILE in the publicsuffix
# .org format, parsed once at import). A deployment drops in the full
# Mozilla list unchanged; the shipped file is a curated ICANN-section
# snapshot covering every rule KIND (plain multi-label, wildcard '*.',
# exception '!'). The PSL algorithm: the longest matching rule is the
# public suffix; registered domain = suffix + one label; an exception
# rule IS the registered domain for hosts under it.
# --------------------------------------------------------------------


def _load_psl() -> tuple[list[str], list[str], list[str]]:
    """(exceptions, plain rules, wildcard tails) from the data file,
    ICANN section only (everything in the shipped snapshot)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "public_suffix_list.dat",
    )
    exc: list[str] = []
    plain: list[str] = []
    wild: list[str] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!"):
                exc.append(line[1:].lower())
            elif line.startswith("*."):
                wild.append(line[2:].lower())
            else:
                plain.append(line.lower())
    return exc, plain, wild


def _psl_compile() -> tuple[str | None, str | None, list[tuple[str, int]]]:
    """Compile the parsed PSL into (exception_regex, exact_suffix
    regex, tiers): each tier is (host-ends-with-suffix regex, suffix
    label count k), descending k so the longest rule wins — matching
    hosts keep their last k+1 labels. The exact regex matches a host
    that IS a public suffix itself (``co.uk``, or a 3-label host
    directly under a wildcard rule like ``shop.kawasaki.jp``) — PSL
    semantics give such hosts NO registered domain (r13 advice: the
    tier regexes all require a preceding dot, so these used to fall
    through to the default 2-label extract and return the suffix
    itself). All regexes are RE2-safe (pure alternation, no
    lookaround) and shared VERBATIM with the DuckDB oracle via
    :func:`psl_domain_sql`. Single-label TLDs are the implicit '*'
    default rule (the final 2-label extract), not enumerated."""
    import re as _re

    exc, plain, wild = _load_psl()
    by_k: dict[int, list[str]] = {}
    exact: list[str] = []
    for s in plain:
        k = s.count(".") + 1
        if k >= 2:
            by_k.setdefault(k, []).append(_re.escape(s))
            exact.append(_re.escape(s))
    for tail in wild:
        k = tail.count(".") + 2
        pat = r"[^.]+\." + _re.escape(tail)
        by_k.setdefault(k, []).append(pat)
        exact.append(pat)
        # NOTE the bare tail ('kawasaki.jp') is NOT exact-suffix: the
        # wildcard rule needs one more label to match, so the PSL
        # default '*' rule applies and the tail keeps itself as its
        # registered domain
    tiers = [
        (r"\.(?:" + "|".join(sorted(by_k[k])) + r")$", k)
        for k in sorted(by_k, reverse=True)
    ]
    exc_re = (
        r"(?:^|\.)(" + "|".join(sorted(_re.escape(e) for e in exc)) + r")$"
        if exc
        else None
    )
    exact_re = r"^(?:" + "|".join(sorted(set(exact))) + r")$" if exact else None
    return exc_re, exact_re, tiers


PSL_EXCEPTION_RE, PSL_EXACT_SUFFIX_RE, PSL_TIERS = _psl_compile()

_PSL_LABELS_FMT = r"((?:[^.]+\.){%d}[^.]+)$"


def psl_domain_sql(host0: str, hostn: str) -> str:
    """DuckDB SQL replay of :func:`registered_domain`'s suffix logic,
    generated from the SAME compiled PSL tiers — ``host0`` is a SQL
    expression for the raw lowercased host (exceptions match before
    the www-strip), ``hostn`` for the www-stripped host."""
    parts = [
        f"WHEN regexp_matches({hostn}, '{IPV4_HOST_RE}') "
        f"OR contains({hostn}, ':') THEN {hostn}"
    ]
    if PSL_EXCEPTION_RE:
        parts.append(
            f"WHEN regexp_matches({host0}, '{PSL_EXCEPTION_RE}') "
            f"THEN regexp_extract({host0}, '{PSL_EXCEPTION_RE}', 1)"
        )
    if PSL_EXACT_SUFFIX_RE:
        # lockstep with registered_domain: host IS a public suffix →
        # no registered domain
        parts.append(
            f"WHEN regexp_matches({hostn}, '{PSL_EXACT_SUFFIX_RE}') "
            f"THEN NULL"
        )
    for match_re, k in PSL_TIERS:
        ext = _PSL_LABELS_FMT % k
        parts.append(
            f"WHEN regexp_matches({hostn}, '{match_re}') "
            f"THEN regexp_extract({hostn}, '{ext}', 1)"
        )
    return (
        "CASE "
        + " ".join(parts)
        + f" ELSE regexp_extract({hostn}, '([^.]+\\.[^.]+)$', 1) END"
    )


_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_url(url: Column | str) -> Column:
    """Canonical URL form for exact URL-level dedup. Steps (order
    matters and is shared with the SQL oracle):

    1. drop the fragment (``#...`` — never sent to the server);
    2. strip tracking query parameters (``utm_*``, ``fbclid``,
       ``gclid``, ``msclkid``, and ``ref`` with a value-exact
       referral slug — see TRACKING_PARAM_RE) from the QUERY STRING
       ONLY
       (the strip runs on the part after the first ``?``, so a
       literal ``&ref=`` inside a path or userinfo is never touched —
       r11 review finding), keeping the relative order of the
       survivors (a now-empty query loses its ``?`` too);
    3. lowercase the scheme and authority (host names are
       case-insensitive; paths are NOT touched — they are
       case-sensitive by spec);
    4. strip the default port (``:443`` for https, ``:80`` for http —
       userinfo-bearing authorities included).

    Pure codegen expression — normalizing URLs never shuffles."""
    u = _c(url)
    # 1. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. tracking params, QUERY PART ONLY: split at the first '?',
    # strip runs there, reassemble. One repeated group eats a RUN of
    # params (a two-step strip misses consecutive params — global
    # replace consumes the following '&', hiding the next run member),
    # keeping the ?/& that introduced the run for any survivor…
    base = F.regexp_extract(u, r"^[^?]*", 0)
    qry = F.regexp_replace(u, r"^[^?]*", "")
    qry = F.regexp_replace(
        qry, r"([?&])(?:(?:" + TRACKING_PARAM_RE + r")(?:&|$))+", r"$1"
    )
    # …then drop the introducer if nothing survived behind it
    qry = F.regexp_replace(qry, r"[?&]$", "")
    u = F.concat(base, qry)
    # 3. lowercase scheme://authority, keep the rest byte-identical
    u = F.concat(
        F.lower(F.regexp_extract(u, _PREFIX_RE, 0)),
        F.regexp_replace(u, _PREFIX_RE, ""),
    )
    # 4. default ports (after lowercasing, so the scheme test is
    # clean; [^/?#]+ keeps userinfo ':' inside the group so the
    # pattern anchors on the trailing port)
    u = F.regexp_replace(u, r"^(https://[^/?#]+):443([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/?#]+):80([/?].*)?$", r"$1$2")
    return u


# IPv4 literal host (r12 advice fix: IP hosts have no label
# structure to cut, so registered_domain must keep them whole).
# Shared verbatim with the SQL oracle.
IPV4_HOST_RE = r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$"


def url_host(url: Column | str) -> Column:
    """Authority host of a URL (userinfo, port, and IPv6 brackets
    excluded), lowercased. The optional ``user[:pass]@`` runs to the
    LAST ``@`` in the authority (hostnames cannot contain ``@``) —
    r11 review finding: without this, ``https://x@blocked.com/``
    computed a userinfo-polluted domain and slipped past blocklists.
    A bracketed IPv6 literal (``https://[::1]/``) is matched FIRST
    (the bare-host alternative would stop at its ':') and returned
    without the brackets (r12 advice fix)."""
    raw = F.regexp_extract(
        _c(url),
        r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?(\[[^\]/?#]*\]|[^/:?#@]+)",
        1,
    )
    return F.lower(F.regexp_replace(raw, r"^\[|\]$", ""))


def registered_domain(url: Column | str) -> Column:
    """eTLD+1 (the per-site aggregation key for domain caps and
    blocklists): host, minus a leading ``www.``, cut to the public
    suffix plus one label — the PSL algorithm over the shipped
    Public Suffix List data file (r13: longest matching rule wins,
    wildcard ``*.`` rules match any label, exception ``!`` rules ARE
    the registered domain and are checked against the raw host before
    the www-strip). IP-hosted URLs (dotted-quad IPv4, or IPv6 — any
    host containing ':' after bracket strip) have no label structure
    to cut: the full host IS the registered domain (r12 advice fix).
    Pure codegen: the compiled tiers are a fixed when-chain of
    alternation regexes, evaluated scan-side."""
    host0 = url_host(_c(url))
    host = F.regexp_replace(host0, r"^www\.", "")
    expr = F.when(host.rlike(IPV4_HOST_RE) | host.contains(":"), host)
    if PSL_EXCEPTION_RE:
        expr = expr.when(
            host0.rlike(PSL_EXCEPTION_RE),
            F.regexp_extract(host0, PSL_EXCEPTION_RE, 1),
        )
    if PSL_EXACT_SUFFIX_RE:
        # a host that IS a public suffix has no registered domain
        # (r13 advice); checked AFTER exceptions (an exception host
        # also matches its covering wildcard's exact pattern, and the
        # exception IS registered)
        expr = expr.when(
            host.rlike(PSL_EXACT_SUFFIX_RE), F.lit(None).cast("string")
        )
    for match_re, k in PSL_TIERS:
        expr = expr.when(
            host.rlike(match_re),
            F.regexp_extract(host, _PSL_LABELS_FMT % k, 1),
        )
    return expr.otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def registered_domain_lookup(
    df: DataFrame, url_col: str = "url", out_col: str = "domain"
) -> DataFrame:
    """eTLD+1 via BROADCAST SUFFIX LOOKUP — the full-PSL scale path.

    :func:`registered_domain`'s alternation-regex tiers are perfect at
    curated-list size but TERMINAL at the full publicsuffix.org scale:
    java.util.regex evaluates a 180 KB alternation per row — measured
    74 s/1M URLs with a 14.5k-rule stress list vs 2.5 s curated
    (tools/psl_scale_probe.py, CALIBRATION.md r14). This variant is
    rule-count-INDEPENDENT per row: the host's k-label suffixes
    (k = the distinct rule lengths, ≤ ~5) each probe a broadcast hash
    table of rules, and a when-chain picks the PSL winner — exception
    rules first (matched against the raw host, pre-www-strip, same as
    the regex impl), then longest match with wildcard semantics
    (``*.tail`` needs one label more than the tail; a host that IS a
    public suffix gets NULL; the implicit ``*`` default keeps the last
    two labels). All joins are broadcast-left (map-side, one codegen
    stage); the URL side never shuffles. Output values are IDENTICAL
    to :func:`registered_domain` — pinned by pytest on the fixture
    families and by the shared oracle on the synth corpus
    (``domain_lookup_stats`` replays psl_domain_sql).

    Measured (1M URLs, local[8], min-of-3): lookup 6.2 s curated /
    6.5 s stress — FLAT in rule count; regex 2.5 s curated / 74 s
    stress. Use the regex tiers with small curated lists (2.5× faster
    there — no joins, no label split), this lookup with the full
    publicsuffix.org list (11× faster there and scaling flat)."""
    spark = df.sparkSession
    exc, plain, wild = _load_psl()

    by_k: dict[int, dict[str, list[bool]]] = {}
    for r in plain:
        k = r.count(".") + 1
        if k >= 2:  # 1-label plain rules equal the implicit '*' default
            by_k.setdefault(k, {}).setdefault(r, [False, False])[0] = True
    for t in wild:
        k = t.count(".") + 1
        by_k.setdefault(k, {}).setdefault(t, [False, False])[1] = True
    exc_by_k: dict[int, list[str]] = {}
    for e in exc:
        exc_by_k.setdefault(e.count(".") + 1, []).append(e)

    host0 = url_host(F.col(url_col))
    host = F.regexp_replace(host0, r"^www\.", "")
    out = df.withColumn("__h0", host0).withColumn("__h", host)
    labels = F.split(F.col("__h"), r"\.")
    labels0 = F.split(F.col("__h0"), r"\.")
    n = F.size(labels)

    def _last(col_labels, num):
        return F.array_join(F.slice(col_labels, -num, num), ".")

    from bigdata_foundation_spark._local import local_df

    # exception probes against the RAW host (ends-with by labels).
    # Rule tables are driver-local metadata: local_df plans them as a
    # JVM LocalTableScan, so each broadcast build is JVM-only instead
    # of spinning a Python worker to re-evaluate a pickled RDD per
    # execution (r15 optimization — plan diff: 5 Scan ExistingRDD → 5
    # LocalTableScan in domain_lookup_stats).
    for k in sorted(exc_by_k, reverse=True):
        rdf = local_df(spark, [(e,) for e in exc_by_k[k]], f"__ekey{k} string")
        out = out.withColumn(
            f"__es{k}",
            F.when(F.size(labels0) >= k, _last(labels0, k)),
        )
        out = out.join(
            F.broadcast(rdf), out[f"__es{k}"] == rdf[f"__ekey{k}"], "left"
        )
    # rule probes against the www-stripped host, one per rule length
    for k in sorted(by_k, reverse=True):
        rows = [(key, fl[0], fl[1]) for key, fl in by_k[k].items()]
        rdf = local_df(spark, rows, f"__key{k} string, __p{k} boolean, __w{k} boolean")
        out = out.withColumn(f"__s{k}", F.when(n >= k, _last(labels, k)))
        out = out.join(
            F.broadcast(rdf), out[f"__s{k}"] == rdf[f"__key{k}"], "left"
        )

    # PSL winner: IP literals whole; exceptions beat everything;
    # else longest match (wildcards add one label); else the implicit
    # '*' default (2-label extract, same as the regex impl's else)
    expr = F.when(
        F.col("__h").rlike(IPV4_HOST_RE) | F.col("__h").contains(":"),
        F.col("__h"),
    )
    for k in sorted(exc_by_k, reverse=True):
        expr = expr.when(F.col(f"__ekey{k}").isNotNull(), F.col(f"__ekey{k}"))
    for k in sorted(by_k, reverse=True):
        key = F.col(f"__key{k}")
        is_w = F.col(f"__w{k}") & (n > k)
        is_p = F.col(f"__p{k}")
        expr = expr.when(
            key.isNotNull() & (is_w | is_p),
            F.when(
                is_w,
                # wildcard: suffix = one label + tail; host == suffix → NULL
                F.when(n == k + 1, F.lit(None)).otherwise(_last(labels, k + 2)),
            ).otherwise(
                F.when(n == k, F.lit(None)).otherwise(_last(labels, k + 1))
            ),
        )
    expr = expr.otherwise(F.regexp_extract(F.col("__h"), r"([^.]+\.[^.]+)$", 1))

    helper = (
        ["__h0", "__h"]
        + [c for k in exc_by_k for c in (f"__es{k}", f"__ekey{k}")]
        + [c for k in by_k for c in (f"__s{k}", f"__key{k}", f"__p{k}", f"__w{k}")]
    )
    return out.withColumn(out_col, expr).drop(*helper)


def domain_stats(
    df: DataFrame, url_col: str = "url", out_domain: str = "domain"
) -> DataFrame:
    """Per-registered-domain crawl statistics: page count and count of
    DISTINCT normalized URLs (the URL-level dedup denominator — their
    gap is the exact-duplicate-URL rate). ONE map-side-combined
    aggregate keyed on the domain; the normalization itself is
    scan-side, so nothing shuffles except (domain, url) pairs."""
    return (
        df.select(
            registered_domain(F.col(url_col)).alias(out_domain),
            normalize_url(F.col(url_col)).alias("_norm"),
        )
        .groupBy(out_domain)
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.countDistinct("_norm").cast("bigint").alias("n_unique"),
        )
    )


def blocklist_filter(
    df: DataFrame, blocked_domains: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is on the blocklist. The
    blocklist ships as a broadcast literal set inside ONE codegen
    isin — filtering 100 TB costs a scan, never a join. For
    million-entry blocklists swap isin for a broadcast left-anti
    join; the call site contract (domain-keyed exclusion) is the
    same. Rows whose url is NULL (or whose domain cannot be
    extracted) are KEPT — this filter only removes confirmed
    blocklist hits (r11 review finding: a bare ``~isin`` drops
    NULL-url rows through three-valued logic)."""
    if not blocked_domains:
        return df
    dom = registered_domain(F.col(url_col))
    return df.filter(
        dom.isNull() | ~dom.isin([d.lower() for d in blocked_domains])
    )


# Block-level elements whose open/close tags become newlines in
# html_to_text (and block boundaries in html_main_content). Shared
# verbatim with the SQL oracle.
_BLOCK_TAG_RE = r"(?i)</?(?:p|br|div|li|ul|ol|tr|table|h[1-6])\b[^>]*>"

# Anchor ELEMENTS (with their text) — the link-density numerator of
# html_main_content. Inline by the HTML content model, so an anchor
# almost never crosses a block boundary; one that does (malformed
# markup) counts as body text in that block — documented contract.
_ANCHOR_RE = r"(?is)<a\b[^>]*>.*?</a>"

# Entity decode pairs, '&amp;' LAST (the classic double-decode
# pitfall). Shared by html_to_text and html_main_content.
_ENTITY_PAIRS = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(html: Column | str) -> Column:
    """Crawl-side HTML → text extraction (the step every web corpus —
    C4, RefinedWeb, Dolma — runs before any text operator), as a pure
    codegen regexp chain. DOCUMENTED SIMPLIFIED CONTRACT (a real
    deployment swaps in a DOM/boilerplate extractor; this operator is
    the scan-speed scaffold with the same signature):

    1. drop ``<script>``/``<style>`` elements WITH their content and
       HTML comments (non-greedy, case-insensitive, dot-matches-all);
    2. block-level tags (p/br/div/li/ul/ol/tr/table/h1–h6) become
       newlines; every other tag is deleted;
    3. the five predefined entities plus ``&#39;`` and ``&nbsp;``
       decode (``&amp;`` LAST — the classic double-decode pitfall);
    4. whitespace normalizes: CR/CRLF fold to LF first (the dominant
       real-world line ending — r11 review), runs of spaces/tabs
       collapse to one space, spaces around newlines drop, newline
       runs collapse to one, ends trimmed.

    All patterns are RE2-safe and replayed verbatim by the oracle."""
    t = _strip_scaffolding(html)
    t = F.regexp_replace(t, _BLOCK_TAG_RE, "\n")
    t = F.regexp_replace(t, r"<[^>]*>", "")
    for ent, rep in _ENTITY_PAIRS:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"\r\n?", "\n")
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    return F.btrim(t, F.lit(" \n"))


def _strip_scaffolding(html: Column | str) -> Column:
    """script/style elements (with content) and comments removed —
    the shared front of html_to_text and html_main_content."""
    t = _c(html)
    t = F.regexp_replace(t, r"(?is)<script\b[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", "")
    return F.regexp_replace(t, r"(?s)<!--.*?-->", "")


def _block_plain_text(b: Column) -> Column:
    """One block's visible text: inline tags stripped, entities
    decoded, whitespace collapsed to single spaces, ends trimmed."""
    t = F.regexp_replace(b, r"<[^>]*>", "")
    for ent, rep in _ENTITY_PAIRS:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r\n]+", " ")
    return F.btrim(t, F.lit(" "))


def html_main_content(
    html: Column | str,
    min_words: int = 8,
    max_link_density: float = 0.34,
) -> Column:
    """Boilerplate-removing main-content extraction (the step that
    separates C4-grade corpora from tag-stripped soup): a
    Kohlschütter-style (WSDM 2010 boilerplate detection) per-block
    shallow-text-feature classifier, as a PURE codegen expression —
    zero Python, zero shuffle, so it runs at scan speed over a 100 TB
    crawl exactly like html_to_text.

    Method: after script/style/comment removal the page splits into
    blocks at the block-level tags ``_BLOCK_TAG_RE`` recognizes
    (p/br/div/li/ul/ol/tr/table/h1–h6 — nav bars, cookie banners,
    footers, and related-link lists are block elements in any real
    page). Each block gets two shallow features:

    - word count of its visible text (Kohlschütter's strongest single
      feature: boilerplate blocks are short);
    - link density = fraction of visible characters contributed by
      anchor ``<a>…</a>`` elements (navigation is nearly all links).

    A block is KEPT iff it has at least ``min_words`` words AND link
    density at most ``max_link_density`` (the published decision-tree
    thresholds sit near 1/3); survivors reassemble in document order
    joined by newlines. Headings shorter than ``min_words`` are
    dropped with the boilerplate — the known trade of the word-count
    rule; callers wanting headlines lower ``min_words``.

    The whole computation is array ops over the split blocks
    (transform/filter/array_join) — per-row, order-preserving, no
    explode, no shuffle — and every pattern is RE2-safe so the DuckDB
    oracle replays it verbatim with list lambdas."""
    t = _strip_scaffolding(html)
    blocks = F.split(t, _BLOCK_TAG_RE)
    feats = F.transform(
        blocks,
        lambda b: F.struct(
            _block_plain_text(b).alias("txt"),
            _block_plain_text(
                F.regexp_replace(b, _ANCHOR_RE, "")
            ).alias("na"),
        ),
    )
    kept = F.filter(
        feats,
        lambda s: (s["txt"] != F.lit(""))
        & (F.size(F.split(s["txt"], " ")) >= F.lit(min_words))
        & (
            (F.length(s["txt"]) - F.length(s["na"])).cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["txt"]).cast("double")
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["txt"]), "\n")


def robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Parse per-domain robots.txt content into typed REP rules for
    the wildcard agent — the crawl-politeness filter every
    responsible corpus applies before fetching (and re-applies when
    re-filtering an existing crawl).

    Output columns: ``domain``, ``rule`` ('allow'|'disallow'),
    ``prefix`` (the raw path value, wildcards included), ``pattern``
    (the value translated to an anchored RE2-safe regex at RULE BUILD
    time — ``*`` → ``.*``, a trailing ``$`` → end anchor, everything
    else literal-escaped; r12 verdict task 5), and ``spec`` (the raw
    value's length — RFC 9309's specificity: the longest matching
    rule wins, and on an allow/disallow tie ALLOW wins; see
    :func:`robots_filter`).

    SIMPLIFIED CONTRACT (documented, shared with the SQL oracle):
    a rule line belongs to the most recent ``User-agent:`` line above
    it (consecutive user-agent lines are NOT grouped — the second
    overrides), and only sections for agent ``*`` emit rules;
    ``Disallow:``/``Allow:`` with an empty value emit no rule.
    Comments (``#…``) and surrounding whitespace are stripped.

    Shape: one scan-side line explode + ONE domain-keyed window (the
    running "current section" is last_value(ignorenulls) over line
    position) + a filter — robots files are KB-sized, so the window
    state per domain is trivial and the output rule table is small
    enough to broadcast into :func:`robots_filter`."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(
            F.split(F.col(robots_col), r"\r?\n")
        ).alias("_pos", "_line"),
    ).select(
        "domain",
        "_pos",
        F.btrim(F.regexp_replace(F.col("_line"), r"#.*$", "")).alias("_line"),
    )
    ua = F.regexp_extract(F.col("_line"), r"(?i)^user-agent:\s*(\S+)\s*$", 1)
    dis = F.regexp_extract(F.col("_line"), r"(?i)^disallow:\s*(\S*)\s*$", 1)
    alw = F.regexp_extract(F.col("_line"), r"(?i)^allow:\s*(\S*)\s*$", 1)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("domain")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.select(
        "domain",
        "_pos",
        F.last(F.when(ua != "", ua), ignorenulls=True).over(w).alias("_ua"),
        F.when(F.col("_line").rlike(r"(?i)^disallow:"), F.lit("disallow"))
        .when(F.col("_line").rlike(r"(?i)^allow:"), F.lit("allow"))
        .alias("_rule"),
        F.when(F.col("_line").rlike(r"(?i)^disallow:"), dis)
        .otherwise(alw)
        .alias("_val"),
    )
    val = F.col("_val")
    # */$ → regex, at rule-build time (the 100 TB URL side never pays
    # translation): trailing '$' is the end anchor; every other regex
    # metacharacter is literal; '*' becomes '.*'; anchored at start.
    ends_dollar = val.rlike(r"\$$")
    core = F.when(
        ends_dollar, F.expr("substring(_val, 1, length(_val) - 1)")
    ).otherwise(val)
    esc = F.regexp_replace(core, r"([.\\+?(){}\[\]|^$])", r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    pattern = F.concat(
        F.lit("^"), esc, F.when(ends_dollar, F.lit("$")).otherwise(F.lit(""))
    )
    return (
        tagged.filter(
            (F.col("_ua") == "*") & F.col("_rule").isNotNull() & (val != "")
        )
        .select(
            "domain",
            F.col("_rule").alias("rule"),
            val.alias("prefix"),
            pattern.alias("pattern"),
            F.length(val).cast("int").alias("spec"),
        )
        .distinct()
    )


def robots_crawl_delay(
    robots: DataFrame,
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Per-domain ``Crawl-delay`` (seconds, double) for the wildcard
    agent — the rate-limit half of crawl politeness (robots_filter is
    the path half; a polite fetcher keys its token bucket on this).
    Same section semantics as :func:`robots_rules` (a line binds to
    the most recent ``User-agent:``; only ``*`` sections emit); a
    domain without a wildcard-section ``Crawl-delay`` is ABSENT (the
    caller's default applies); several values in one section keep the
    LAST (later lines override). One scan-side line explode + one
    domain-keyed window — same KB-sized shape as robots_rules."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(robots_col), r"\r?\n")).alias("_pos", "_line"),
    ).select(
        "domain",
        "_pos",
        F.btrim(F.regexp_replace(F.col("_line"), r"#.*$", "")).alias("_line"),
    )
    ua = F.regexp_extract(F.col("_line"), r"(?i)^user-agent:\s*(\S+)\s*$", 1)
    delay = F.regexp_extract(
        F.col("_line"), r"(?i)^crawl-delay:\s*([0-9]+(?:\.[0-9]+)?)\s*$", 1
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("domain")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.select(
        "domain",
        "_pos",
        F.last(F.when(ua != "", ua), ignorenulls=True).over(w).alias("_ua"),
        delay.alias("_delay"),
    )
    return (
        tagged.filter((F.col("_ua") == "*") & (F.col("_delay") != ""))
        .groupBy("domain")
        .agg(
            F.max_by(F.col("_delay"), F.col("_pos")).cast("double").alias("crawl_delay")
        )
    )


def url_path(url: Column | str) -> Column:
    """Path component of a URL ('/' when absent) — the robots.txt
    match subject."""
    p = F.regexp_extract(
        _c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_filter(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop URLs the wildcard-agent REP rules disallow for their
    registered domain, with RFC 9309 precedence: among the rules
    whose pattern matches the URL path, the most specific (longest
    raw value) wins, and on a specificity tie ALLOW wins; a URL with
    no matching rule is kept.

    Shape: the rule table is aggregated to ONE array-of-structs row
    per domain and broadcast, so the join is a broadcast LEFT OUTER
    equi-join on the domain — the 100 TB URL side never shuffles and
    never multiplies (one output row per URL). Match + precedence run
    scan-side as higher-order functions (filter + array_max over
    (spec, is_allow) structs — struct ordering IS the precedence
    rule). URLs with no parseable domain or no rule row are KEPT
    (same NULL contract as blocklist_filter).

    Accepts a legacy (domain, prefix) rule table too: plain prefixes
    are translated to anchored literal patterns as disallow rules."""
    if "pattern" not in rules.columns:
        p = F.regexp_replace(F.col("prefix"), r"([.\\+?(){}\[\]|^$*])", r"\\$1")
        rules = rules.select(
            "domain",
            F.lit("disallow").alias("rule"),
            "prefix",
            F.concat(F.lit("^"), p).alias("pattern"),
            F.length("prefix").cast("int").alias("spec"),
        )
    agg = rules.groupBy("domain").agg(
        F.collect_list(
            F.struct(
                F.col("spec").alias("spec"),
                (F.col("rule") == "allow").alias("is_allow"),
                F.col("pattern").alias("pattern"),
            )
        ).alias("_rules")
    )
    u = urls.withColumn("_dom", registered_domain(F.col(url_col))).withColumn(
        "_path", url_path(F.col(url_col))
    )
    j = u.join(
        F.broadcast(agg.select(F.col("domain").alias("_rdom"), "_rules")),
        F.col("_dom") == F.col("_rdom"),
        "left",
    )
    matches = F.filter(
        F.col("_rules"), lambda r: F.regexp_like(F.col("_path"), r["pattern"])
    )
    winner = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                r["spec"].alias("spec"), r["is_allow"].alias("is_allow")
            ),
        )
    )
    keep = (
        F.col("_rules").isNull()
        | (F.size(matches) == 0)
        | winner["is_allow"]
    )
    return j.filter(keep).drop("_dom", "_path", "_rdom", "_rules")


def html_title(html: Column | str) -> Column:
    """<title> text (first occurrence), entities decoded, whitespace
    collapsed — NULL-free: pages without a title yield ''."""
    t = F.regexp_extract(
        _strip_scaffolding(html), r"(?is)<title\b[^>]*>(.*?)</title>", 1
    )
    return _block_plain_text(t)


def html_meta(
    df: DataFrame, html_col: str = "html", keep: list[str] | None = None
) -> DataFrame:
    """Page-level metadata columns every corpus keeps alongside the
    text (C4/Dolma provenance fields): ``title``, ``meta_description``
    (name= or property=og:description, first hit wins per attribute
    order), ``canonical_url`` (<link rel=canonical>), and ``lang``
    (the <html lang=...> attribute, lowercased) — appended to ``df``
    as pure codegen regexp extraction, zero shuffle. Attribute-order
    variants are matched for the common layouts (name before content
    and content before name); exotic orderings degrade to '' rather
    than mis-extracting. ``keep`` restricts which of the four columns
    are added (all by default) — unreferenced extractions are pruned
    by Catalyst anyway; the knob just keeps schemas tidy."""
    h = _strip_scaffolding(F.col(html_col))
    cols = {
        "title": html_title(F.col(html_col)),
        "meta_description": F.coalesce(
            F.nullif(
                _block_plain_text(
                    F.regexp_extract(
                        h,
                        r"(?is)<meta\b[^>]*name\s*=\s*[\"']description[\"'][^>]*"
                        r"content\s*=\s*[\"']([^\"']*)[\"']",
                        1,
                    )
                ),
                F.lit(""),
            ),
            F.nullif(
                _block_plain_text(
                    F.regexp_extract(
                        h,
                        r"(?is)<meta\b[^>]*content\s*=\s*[\"']([^\"']*)[\"'][^>]*"
                        r"name\s*=\s*[\"']description[\"']",
                        1,
                    )
                ),
                F.lit(""),
            ),
            # og:description fallback (r12 advice: the docstring
            # promised it but both regexes matched name=description
            # only — og:description-only pages returned '') — same
            # two attribute-order variants.
            F.nullif(
                _block_plain_text(
                    F.regexp_extract(
                        h,
                        r"(?is)<meta\b[^>]*property\s*=\s*[\"']og:description[\"'][^>]*"
                        r"content\s*=\s*[\"']([^\"']*)[\"']",
                        1,
                    )
                ),
                F.lit(""),
            ),
            F.nullif(
                _block_plain_text(
                    F.regexp_extract(
                        h,
                        r"(?is)<meta\b[^>]*content\s*=\s*[\"']([^\"']*)[\"'][^>]*"
                        r"property\s*=\s*[\"']og:description[\"']",
                        1,
                    )
                ),
                F.lit(""),
            ),
            F.lit(""),
        ),
        "canonical_url": F.regexp_extract(
            h,
            r"(?is)<link\b[^>]*rel\s*=\s*[\"']canonical[\"'][^>]*"
            r"href\s*=\s*[\"']([^\"']*)[\"']",
            1,
        ),
        "lang": F.lower(
            F.regexp_extract(h, r"(?is)<html\b[^>]*\blang\s*=\s*[\"']([^\"']*)[\"']", 1)
        ),
    }
    out = df
    for name in (list(cols) if keep is None else keep):
        out = out.withColumn(name, cols[name])
    return out
