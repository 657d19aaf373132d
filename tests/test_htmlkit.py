"""DOM kit behaviour tests (bs4-html.parser semantics the kernel relies on)."""

import re

from crawler_engine_spark.htmlkit import dom

HTML = """<html lang="en"><head><title> T </title>
<meta name="a" content="1"><meta property="og:x" content="2">
<script>var s=1;</script></head>
<body>
<div id="main" class="content box">Hello <b>world</b>!</div>
<ul class="list"><li>a<ul><li>nested</li></ul></li><li>b</li></ul>
<a href="/x" rel="nofollow author">lnk</a>
<div class="ad-banner">ad</div>
<!-- a comment -->
<p class="Header-item">hdr</p>
</body></html>"""


def test_get_text_separator_strip():
    root = dom.parse("<div> a </div><div>b<i>c</i></div>")
    assert root.get_text(separator=" ", strip=True) == "a b c"
    assert root.get_text() == " a bc"


def test_comments_excluded_from_text():
    root = dom.parse("<p>x<!-- hidden -->y</p>")
    assert root.get_text() == "xy"


def test_script_text_included_in_raw_get_text():
    root = dom.parse(HTML)
    assert "var s=1;" in root.get_text()


def test_select_class_and_id_and_attr():
    root = dom.parse(HTML)
    assert len(root.select(".content")) == 1
    assert root.select_one("#main").attrs["id"] == "main"
    assert root.select_one('meta[name="a"]').attrs["content"] == "1"
    # raw-substring semantics: matches "ad-banner" AND "Header-item" (he-AD-er)
    assert len(root.select('[class*="ad"]')) == 2
    assert root.select_one("a[href]").attrs["href"] == "/x"
    assert len(root.select("ul li")) == 3  # descendant combinator


def test_find_all_class_regex_substring():
    root = dom.parse(HTML)
    # bs4 class_ regex: substring search per token, case-insensitive here —
    # "Header-item" contains "ad"? no; contains "header" yes.
    rx = re.compile("header", re.IGNORECASE)
    assert [n.name for n in root.find_all(class_=rx)] == ["p"]
    rx_ad = re.compile("ad", re.IGNORECASE)
    names = {n.attrs.get("class") for n in root.find_all(class_=rx_ad)}
    assert "ad-banner" in names
    assert "Header-item" in names  # "heADer" contains "ad"


def test_multivalued_attrs():
    root = dom.parse(HTML)
    a = root.find("a")
    assert a.get("rel") == ["nofollow", "author"]
    assert root.select_one("#main").get("class") == ["content", "box"]


def test_recursive_false_li():
    root = dom.parse(HTML)
    ul = root.find("ul")
    assert len(ul.find_all("li", recursive=False)) == 2
    assert len(ul.find_all("li")) == 3


def test_decompose():
    root = dom.parse("<div><span>x</span>y</div>")
    root.find("span").decompose()
    assert root.get_text() == "y"


def test_entity_unescape():
    root = dom.parse("<p>a &amp; b &#8212; c</p>")
    assert root.get_text() == "a & b — c"


def test_malformed_html_no_crash():
    root = dom.parse("<div><p>unclosed<table><tr><td>x")
    assert "unclosed" in root.get_text()
    assert "x" in root.get_text()


def test_void_elements():
    root = dom.parse("<p>a<br>b<img src='s'>c</p>")
    assert root.get_text() == "abc"
    assert root.find("img").attrs["src"] == "s"


def test_inner_text_skips_hidden_and_script():
    html = (
        "<body><p>shown</p><script>hidden()</script>"
        "<div style='display: none'>gone</div><span>tail</span></body>"
    )
    txt = dom.inner_text(dom.parse(html))
    assert "shown" in txt and "tail" in txt
    assert "hidden" not in txt and "gone" not in txt
