"""Golden parity tests for the fused extraction kernel.

Two layers:
1. Hand-derived exact assertions on tiny fixtures — these validate the
   *specification* (the deterministic reference semantics, file:line cites in
   kernels/extract.py).
2. Frozen goldens over the synthetic corpus (tests/goldens/extraction.json):
   byte-identical `content` per (url, mode) across engine changes — the
   per-row invariant from BASELINE.json. Regenerate with
   ``python tests/make_goldens.py`` only when a spec change is intended.
"""

import json
import pathlib

import pytest

from crawler_engine_spark.data import gen
from crawler_engine_spark.kernels.extract import (
    DEFAULT_OPTIONS,
    ExtractOptions,
    extract_out_links,
    extract_page,
    extract_rule_based,
    extract_semantic,
    extract_structured,
)

GOLDEN_PATH = pathlib.Path(__file__).parent / "goldens" / "extraction.json"


# ---------------------------------------------------------------- layer 1

ARTICLE = (
    '<html lang="en"><head><title> Spark Crawl </title>'
    '<meta name="description" content="desc here">'
    '<meta name="author" content="Ada">'
    '<meta name="keywords" content="k1, k2">'
    '<meta property="article:published_time" content="2024-03-04T05:06:07">'
    "</head><body>"
    "<nav>navtext</nav><header>headtext</header>"
    "<article><p>Spark crawl content sentence one. More body text follows here.</p></article>"
    '<div class="ad-x">admsg</div>'
    "<footer>foottext</footer>"
    '<a href="/next">n</a>'
    "</body></html>"
)


def test_semantic_exact():
    res = extract_semantic("https://h/x", "spark crawl", ARTICLE, DEFAULT_OPTIONS)
    # nav/header/footer and the [class*=ad] div are pruned; single chunk,
    # relevance 1.0 (both query words present) ≥ 0.6.
    assert res["content"] == (
        "Spark Crawl Spark crawl content sentence one. More body text follows here. n"
    )
    assert res["confidence_score"] == 1.0
    md = res["metadata"]
    assert md["title"] == "Spark Crawl"
    assert md["author"] == "Ada"
    assert md["content_type"] == "desc here"
    assert md["language"] == "en"
    assert md["publish_date"].startswith("2024-03-04T05:06:07")
    assert md["tags"] == ["k1", "k2"]


def test_semantic_no_query_empty_content():
    """Deterministic path: no query → relevance 0.5 < 0.6 → empty content
    (semantic_strategy.py:287,349-356)."""
    res = extract_semantic("https://h/x", None, ARTICLE, DEFAULT_OPTIONS)
    assert res["content"] == ""
    assert res["confidence_score"] == 0.0


TABLE_PAGE = (
    "<html><body>"
    "<table><caption>Cap</caption>"
    "<thead><tr><th>A</th><th>B</th></tr></thead>"
    "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody>"
    "</table>"
    "<ul><li>u1</li><li>u2</li></ul>"
    '<a href="/l1">L1</a>'
    "</body></html>"
)


def test_structured_exact():
    res = extract_structured("https://h/x", None, TABLE_PAGE, DEFAULT_OPTIONS)
    sd = res["structured_data"]
    assert sd["tables"] == [
        {
            "headers": ["A", "B"],
            "rows": [["1", "2"], ["3", "4"]],
            "row_count": 2,
            "column_count": 2,
            "caption": "Cap",
        }
    ]
    assert sd["lists"] == [
        {"type": "ul", "items": ["u1", "u2"], "item_count": 2, "id": "", "class": []}
    ]
    assert [l["href"] for l in sd["links"]] == ["/l1"]
    # combine: text + table/list/link summaries joined with '\n'
    assert res["content"] == (
        "Cap A B 1 2 3 4 u1 u2 L1"
        "\n\n\nTables found: 1\nTable 1: Cap\n\nLists found: 1\n\nLinks found: 1"
    )
    # confidence: 0.5 + 0.2(tables) + 0.1(lists) + 0.05(links) = 0.85
    assert res["confidence_score"] == pytest.approx(0.85)


def test_structured_header_fallback_no_thead():
    html = "<table><tr><td>h1</td><td>h2</td></tr><tr><td>a</td><td>b</td></tr></table>"
    res = extract_structured("u", None, html, DEFAULT_OPTIONS)
    t = res["structured_data"]["tables"][0]
    assert t["headers"] == ["h1", "h2"]
    assert t["rows"] == [["a", "b"]]


def test_structured_thead_no_tbody_duplicates_header_row():
    """Reference: body = tbody or table → find_all('tr') re-includes the
    thead row (structured_strategy.py:250-255). Faithful quirk."""
    html = (
        "<table><thead><tr><th>H</th></tr></thead>"
        "<tr><td>x</td></tr></table>"
    )
    t = extract_structured("u", None, html, DEFAULT_OPTIONS)["structured_data"]["tables"][0]
    assert t["headers"] == ["H"]
    assert t["rows"] == [["H"], ["x"]]


def test_structured_selector_double_count():
    """A <table class="table"> matches both 'table' and '.table' selectors —
    appended twice (structured_strategy.py:224-231). Faithful quirk."""
    html = '<table class="table"><tr><td>x</td></tr></table>'
    res = extract_structured("u", None, html, DEFAULT_OPTIONS)
    assert len(res["structured_data"]["tables"]) == 3  # table, .table, [class*=table]


MAIN_PAGE = (
    "<html><body><header>hdr</header>"
    "<main>" + "Main content words here repeated to pass fifty chars easily. " * 3 + "</main>"
    "<p>" + "Paragraph text that is long enough to be included too. " * 2 + "</p>"
    "</body></html>"
)


def test_rule_based_early_stop():
    res = extract_rule_based("https://h/x", None, MAIN_PAGE, DEFAULT_OPTIONS)
    # main_content rule matches <main> (len > 50) → content > 100 chars → stop;
    # the <p> rule never runs.
    assert "Paragraph text" not in res["content"]
    assert res["content"].startswith("Main content words here")
    # rule-based collapses all whitespace at the end — no newlines.
    assert "\n" not in res["content"]


def test_rule_based_header_class_removed_by_ad_pattern():
    """Faithful quirk: remove_classes 'ad' regex-substring-matches 'header'
    (he-AD-er), so class="header" elements are decomposed
    (rule_based_strategy.py:336-338)."""
    html = (
        "<body><div class='header'>" + "H" * 60 + "</div>"
        "<main>" + "Real main content that is definitely long enough to count. " * 3
        + "</main></body>"
    )
    res = extract_rule_based("u", None, html, DEFAULT_OPTIONS)
    assert "HHH" not in res["content"]


def test_adaptive_composite_format():
    res = extract_page("https://h.example/p", ARTICLE, None, "adaptive")
    c = res["content"]
    assert c.startswith("\nPAGE METADATA:\nTitle: Spark Crawl\nURL: https://h.example/p\n")
    assert "\n\nHEADINGS STRUCTURE:\n" in c
    assert "\n\nFULL TEXT CONTENT:\n" in c
    assert "\n\nLINKS FOUND:\n" in c
    assert "- n: https://h.example/next" in c
    assert c.endswith("\n")
    assert res["confidence_score"] == 0.95
    assert res["relevance_score"] == 1.0


def test_hybrid_text_heavy_picks_longer():
    # ARTICLE has a high text/element ratio → text_heavy → the longer of the
    # two results wins outright (hybrid_strategy.py:325-330).
    res = extract_page("https://h/x", ARTICLE, "spark crawl", "hybrid")
    assert "--- Structured Data ---" not in res["content"]
    assert res["content"].startswith("Spark Crawl Spark crawl content")


def test_hybrid_mixed_combines():
    # Many empty elements → tiny text ratio, no tables/forms → "mixed" →
    # semantic and structured results joined by the marker
    # (hybrid_strategy.py:337-347).
    html = "<html><body><p>spark crawl.</p>" + "<b></b>" * 100 + "</body></html>"
    res = extract_page("https://h/x", html, "spark crawl", "hybrid")
    assert "--- Structured Data ---" in res["content"]


def test_final_metrics_pass():
    res = extract_page("https://h/x", ARTICLE, "spark crawl", "semantic")
    wc = len(res["content"].split())
    assert res["metadata"]["word_count"] == wc
    assert res["metadata"]["character_count"] == len(res["content"])
    assert res["metadata"]["reading_time_minutes"] == wc / 200
    assert res["completeness_score"] == min(len(res["content"]) / 1000, 1.0)
    assert res["accuracy_score"] == res["confidence_score"]


def test_out_links():
    html = (
        '<a href="https://a/1">x</a><a href="rel.html">y</a>'
        '<a href="javascript:f()">z</a><a href="mailto:m@x">m</a><a>no-href</a>'
    )
    assert extract_out_links(html, "https://base.example/dir/page") == [
        "https://a/1",
        "https://base.example/dir/rel.html",
    ]


def test_mode_dispatch_default_adaptive():
    res = extract_page("https://h/x", ARTICLE, None, None)
    assert res["mode"] == "adaptive"
    assert res["strategy_name"] == "AdaptiveExtractionStrategy"
    res2 = extract_page("https://h/x", ARTICLE, None, "bogus-mode")
    assert res2["mode"] == "adaptive"


def test_hidden_content_flag_controls_iframe_removal():
    html = "<body><p>keep</p><iframe>frame text</iframe></body>"
    on = extract_semantic("u", "keep frame", html, DEFAULT_OPTIONS)
    off = extract_semantic(
        "u", "keep frame", html, ExtractOptions(enable_hidden_content_handling=False)
    )
    assert "frame text" in on["content"]
    assert "frame text" not in off["content"]


# ---------------------------------------------------------------- layer 2


def test_frozen_goldens():
    if not GOLDEN_PATH.exists():
        pytest.skip("goldens not generated yet (run tests/make_goldens.py)")
    goldens = json.loads(GOLDEN_PATH.read_text())
    n_docs = goldens["n_docs"]
    for entry in goldens["cases"]:
        doc_id, mode, query = entry["doc_id"], entry["mode"], entry["query"]
        html = gen.html_of(doc_id, n_docs)
        res = extract_page(gen.url_of(doc_id), html, query, mode)
        assert res["content"] == entry["content"], (
            f"byte-parity regression: doc {doc_id} mode {mode}"
        )
        assert res["confidence_score"] == entry["confidence_score"]
        assert res["out_links"] == entry["out_links"]
