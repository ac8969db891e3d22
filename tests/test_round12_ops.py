"""Round-12 operator tests: boilerplate-removing HTML main-content
extraction, versioned corpus snapshots."""

from pyspark.sql import functions as F

from bigdata_foundation_spark.operators import web as W


# ---------------------- html_main_content -----------------------------

_PAGE = """<html><head><title>T</title><style>p{}</style>
<script>var x = 1 < 2 && 3 > 0;</script></head><body>
<div class="nav"><a href="/">Home</a> <a href="/news">News</a>
  <a href="/about">About</a> <a href="/contact">Contact us</a></div>
<div id="cookie">We use cookies on this site. <a href="#">Accept</a>
  <a href="#">Decline</a></div>
<h1>Big Headline</h1>
<p>This is the first real paragraph of the article with plenty of
words to clear the threshold easily.</p>
<p>The second paragraph also carries genuine content and even has one
<a href="/x">inline link</a> inside a sea of words, which is fine.</p>
<ul><li><a href="/r1">Related story one</a></li>
<li><a href="/r2">Related story two</a></li></ul>
<div class="footer">Copyright Example Corp. <a href="/privacy">Privacy
policy</a> <a href="/terms">Terms of use</a> <a href="/c">Contact</a></div>
</body></html>"""


def _extract(spark, page, **kw):
    df = spark.createDataFrame([(page,)], ["html"])
    return df.select(W.html_main_content("html", **kw).alias("t")).first()["t"]


def test_main_content_boilerplate_recall(spark):
    """The planted nav bar, cookie banner, headline, related-links
    list, and footer must ALL drop; both genuine paragraphs must
    survive — including the one carrying an inline link."""
    out = _extract(spark, _PAGE)
    lines = out.split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("This is the first real paragraph")
    assert "inline link inside a sea of words" in lines[1]
    for boiler in ("Home", "cookies", "Headline", "Related story",
                   "Copyright", "Privacy"):
        assert boiler not in out, boiler


def test_main_content_thresholds(spark):
    # min_words boundary: a 7-word block drops at the default 8,
    # survives at min_words=7
    page = "<p>seven words are not quite enough here</p>"
    assert _extract(spark, page) == ""
    assert (
        _extract(spark, page, min_words=7)
        == "seven words are not quite enough here"
    )
    # link-density boundary: a long but almost-all-anchor block drops
    # even past the word threshold
    linky = (
        "<p><a href='/a'>one two three four five six seven eight nine"
        " ten eleven twelve</a> tail</p>"
    )
    assert _extract(spark, linky) == ""
    # ...and survives when the density ceiling is lifted
    assert "tail" in _extract(spark, linky, max_link_density=1.0)


def test_main_content_edge_pages(spark):
    # empty / tag-only / script-only pages extract to the empty string
    for page in ("", "<div></div>", "<script>var a = 1;</script>"):
        assert _extract(spark, page) == ""
    # entities decode inside kept blocks ('&amp;' last)
    page = (
        "<p>salt &amp; pepper &lt;tag&gt; &quot;quoted&quot; words"
        " keep this block over the minimum</p>"
    )
    out = _extract(spark, page)
    assert 'salt & pepper <tag> "quoted"' in out


def test_main_content_multi_block_order(spark):
    """Kept blocks reassemble in document order."""
    paras = [
        f"<p>paragraph number {i} with enough words to clear the"
        " minimum word threshold comfortably</p>"
        for i in range(5)
    ]
    out = _extract(spark, "".join(paras))
    nums = [int(line.split()[2]) for line in out.split("\n")]
    assert nums == [0, 1, 2, 3, 4]
