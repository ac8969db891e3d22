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

# Multi-label public suffixes recognized by registered_domain. A real
# deployment swaps in the full Mozilla Public Suffix List (a data
# file, not a code change); the operator's shape — longest-suffix
# match, then one extra label — is the PSL algorithm.
MULTI_SUFFIX_RE = r"\.(co|com|org|net|ac|gov|edu)\.(uk|au|jp|br|in|cn|nz|za)$"

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
    suffix plus one label. Suffix set: all two-label combinations in
    MULTI_SUFFIX_RE take three labels, everything else two. IP-hosted
    URLs (dotted-quad IPv4, or IPv6 — any host containing ':' after
    bracket strip) have no label structure to cut: the full host IS
    the registered domain (r12 advice fix — previously
    ``https://1.2.3.4/`` bucketed as the pseudo-domain ``3.4``)."""
    host = F.regexp_replace(url_host(_c(url)), r"^www\.", "")
    return F.when(
        host.rlike(IPV4_HOST_RE) | host.contains(":"), host
    ).when(
        host.rlike(MULTI_SUFFIX_RE),
        F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1),
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


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
    """Parse per-domain robots.txt content into (domain, prefix)
    disallow rules for the wildcard agent — the crawl-politeness
    filter every responsible corpus applies before fetching (and
    re-applies when re-filtering an existing crawl).

    SIMPLIFIED CONTRACT (documented, shared with the SQL oracle):
    a ``Disallow:`` line belongs to the most recent ``User-agent:``
    line above it (consecutive user-agent lines are NOT grouped — the
    second overrides), and only sections for agent ``*`` emit rules;
    prefixes are literal (no ``*``/``$`` wildcard extensions);
    ``Disallow:`` with an empty value allows everything (emits no
    rule). Comments (``#…``) and surrounding whitespace are stripped.

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
        dis.alias("_dis"),
        F.col("_line").rlike(r"(?i)^disallow:").alias("_is_dis"),
    )
    return (
        tagged.filter((F.col("_ua") == "*") & F.col("_is_dis") & (F.col("_dis") != ""))
        .select("domain", F.col("_dis").alias("prefix"))
        .distinct()
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
    """Drop URLs whose path starts with a disallowed prefix for their
    registered domain. ONE broadcast left-anti join keyed on the
    domain with a startswith residual — the rule table is per-domain
    KBs, so filtering 100 TB of URLs never shuffles the URL side.
    URLs with no parseable domain are KEPT (same NULL contract as
    blocklist_filter)."""
    u = urls.withColumn("_dom", registered_domain(F.col(url_col))).withColumn(
        "_path", url_path(F.col(url_col))
    )
    r = F.broadcast(rules.select(F.col("domain").alias("_rdom"), "prefix"))
    out = u.join(
        r,
        (F.col("_dom") == F.col("_rdom")) & F.col("_path").startswith(F.col("prefix")),
        "left_anti",
    )
    return out.drop("_dom", "_path")


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
