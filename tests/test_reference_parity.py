"""EXECUTABLE reference parity: run the reference's own strategy code.

The container has no bs4/playwright, so the reference normally cannot run
here.  ``tests/ref_compat/bs4.py`` maps the bs4 API onto our stdlib DOM kit
and playwright is stubbed (never exercised: the four strategies under test
take ``html_content`` directly).  The reference's AI call sites receive a
client whose methods raise — exactly the production behavior (SURVEY §0:
``generate_response`` does not exist on AIClient), which forces every
deterministic fallback branch.

The assertion is the north-rule invariant itself: for each (page, mode,
query), the reference strategy's ``content`` equals our kernel's output
byte-for-byte (plus confidence equality as a bonus check).

Modes covered: semantic, structured, rule_based, hybrid.  Adaptive is
excluded — its composite is produced by JavaScript inside a live browser
(adaptive_strategy.py:535-620), which no pure-Python run of the reference
can execute either; its deterministic spec is locked by goldens instead.
"""

import asyncio
import sys
import types
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.is_dir(), reason="reference checkout not present"
)


def _install_stubs():
    """Stub playwright (imported by the package's __init__ chain) and make
    the bs4 facade + reference package importable."""
    if "playwright.async_api" not in sys.modules:
        pw = types.ModuleType("playwright")
        api = types.ModuleType("playwright.async_api")
        for name in ("async_playwright", "Browser", "BrowserContext", "Page"):
            setattr(api, name, object)
        api.TimeoutError = type("TimeoutError", (Exception,), {})
        pw.async_api = api
        sys.modules["playwright"] = pw
        sys.modules["playwright.async_api"] = api
    for p in (str(REPO / "tests" / "ref_compat"), str(REF_SRC)):
        if p not in sys.path:
            sys.path.insert(0, p)


class _FailingAIClient:
    """Every AI entry point raises -> the reference's deterministic
    fallbacks run, same as production (SURVEY §0)."""

    def __getattr__(self, name):
        async def _fail(*a, **k):
            raise RuntimeError("no AI in parity harness")

        return _fail


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    from intelligent_web_extractor.models.config import ExtractorConfig
    from intelligent_web_extractor.strategies.hybrid_strategy import (
        HybridExtractionStrategy,
    )
    from intelligent_web_extractor.strategies.rule_based_strategy import (
        RuleBasedExtractionStrategy,
    )
    from intelligent_web_extractor.strategies.semantic_strategy import (
        SemanticExtractionStrategy,
    )
    from intelligent_web_extractor.strategies.structured_strategy import (
        StructuredExtractionStrategy,
    )

    config = ExtractorConfig()
    ai = _FailingAIClient()
    return {
        "semantic": SemanticExtractionStrategy(ai, config),
        "structured": StructuredExtractionStrategy(config),
        "rule_based": RuleBasedExtractionStrategy(config),
        "hybrid": HybridExtractionStrategy(ai, config),
        "fresh_rule_based": lambda: RuleBasedExtractionStrategy(config),
    }


def _ref_extract(strategy, url, query, html):
    return asyncio.get_event_loop().run_until_complete(
        strategy.extract(url, query, html)
    )


def _corpus():
    from crawler_engine_spark.data import gen

    cases = []
    for doc_id in range(0, 300, 11):  # 28 docs spanning every template family
        cases.append((gen.url_of(doc_id), gen.html_of(doc_id, 300)))
    return cases


QUERIES = [None, "spark crawl data", "politeness budget"]


@pytest.mark.parametrize("mode", ["semantic", "structured", "rule_based", "hybrid"])
def test_reference_content_byte_parity(ref, mode):
    sys.path.insert(0, str(REPO))
    from crawler_engine_spark.kernels.extract import DEFAULT_OPTIONS, extract_page

    mismatches = []
    for i, (url, html) in enumerate(_corpus()):
        query = QUERIES[i % len(QUERIES)]
        theirs = _ref_extract(ref[mode], url, query, html)
        ours = extract_page(url, html, query, mode, DEFAULT_OPTIONS)
        ref_content = theirs.get("content", "")
        if ours["content"] != ref_content:
            mismatches.append((url, query, ref_content, ours["content"]))
    if mismatches:
        url, query, want, got = mismatches[0]
        i = next(
            (j for j, (a, b) in enumerate(zip(got, want)) if a != b),
            min(len(got), len(want)),
        )
        raise AssertionError(
            f"{mode}: {len(mismatches)}/{len(_corpus())} pages differ; first at "
            f"{url} q={query!r} offset {i}:\n ref: {want[max(0,i-60):i+60]!r}\n"
            f" ours: {got[max(0,i-60):i+60]!r}"
        )


@pytest.fixture(scope="module")
def ref_web_utils(ref):
    """web_utils is pure stdlib (bs4 lazily imported inside extract_links →
    resolves to the facade)."""
    from intelligent_web_extractor.utils import web_utils

    return web_utils


def test_reference_url_kernel_parity(ref_web_utils):
    """sanitize/normalize/is_valid vs kernels.urls on a corpus of tricky
    URLs + hypothesis fuzzing (P1/P2/P3 executable parity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_engine_spark.kernels import urls as ours

    corpus = [
        "https://Host.Example/Path/x?a=1&b=2#frag",
        "  http://h.example/p  ",
        "example.com/path",
        "HTTPS://UPPER.CASE/PATH",
        "https://h.example",
        "https://h.example/",
        "ftp://files.example/x",
        "https://h.example:8080/p?q",
        "//protocol.relative/x",
        "https://h.example/a/b/../c",
        "javascript:void(0)",
        "",
        "https://h.example/p#only-frag",
        "https://user:pw@h.example/p",
    ]
    for u in corpus:
        assert ours.sanitize_url(u) == ref_web_utils.sanitize_url(u), u
        assert ours.normalize_url(u) == ref_web_utils.normalize_url(u), u
        assert ours.is_valid_url(u) == ref_web_utils.is_valid_url(u), u

    def outcome(f, u):
        # parity includes raising the same exception type (e.g. urlparse's
        # "Invalid IPv6 URL" ValueError on "[" — both engines propagate it)
        try:
            return ("ok", f(u))
        except Exception as e:
            return ("err", type(e).__name__)

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=60))
    def fuzz(u):
        assert outcome(ours.sanitize_url, u) == outcome(ref_web_utils.sanitize_url, u)
        assert outcome(ours.is_valid_url, u) == outcome(ref_web_utils.is_valid_url, u)

    fuzz()


def test_reference_clean_text_parity(ref_web_utils):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_engine_spark.kernels import textops

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=200))
    def fuzz(t):
        assert textops.clean_text(t) == ref_web_utils.clean_text(t)

    fuzz()


def test_reference_link_extraction_parity(ref_web_utils):
    """extract_links (P5) vs our kernel's out-link extraction over the
    synthetic corpus — same skip rules, same urljoin resolution."""
    from crawler_engine_spark.kernels.extract import extract_out_links

    for doc_id in range(0, 300, 17):
        from crawler_engine_spark.data import gen

        url, html = gen.url_of(doc_id), gen.html_of(doc_id, 300)
        theirs = ref_web_utils.extract_links(html, url)
        ours = extract_out_links(html, url)
        assert ours == theirs, (doc_id, ours[:5], theirs[:5])


def test_reference_extract_metadata_parity(ref_web_utils):
    """web_utils.extract_metadata (title + name/property meta map + og pass)
    vs our scrape kernel's equivalent view (S7)."""
    from crawler_engine_spark.data import gen
    from crawler_engine_spark.kernels.scrape import scrape_page_metadata

    for doc_id in range(0, 300, 13):
        html = gen.html_of(doc_id, 300)
        theirs = ref_web_utils.extract_metadata(html)
        s = scrape_page_metadata(html)
        ours = dict(s["meta_tags"])
        if s["title"]:
            ours["title"] = s["title"]
        assert ours == theirs, (doc_id, ours, theirs)


def test_reference_custom_extractor_parity(ref):
    """The CustomExtractor facade (user-defined selector rules,
    core/custom_extractor.py) run on both sides: same add_rule/add_selector
    registry, byte-identical content and equal confidence per page (fresh
    reference instance per page — the stateless-kernel deviation)."""
    from intelligent_web_extractor.core.custom_extractor import (
        CustomExtractor as RefCustomExtractor,
    )
    from intelligent_web_extractor.models.config import ExtractorConfig

    from crawler_engine_spark.data import gen
    from crawler_engine_spark.kernels.extract import extract_page
    from crawler_engine_spark.operators.custom import CustomExtractor

    ours = (
        CustomExtractor()
        .add_rule("grab_divs", "div", priority=1)
        .add_rule("late_rule", "ul", priority=99)
        .add_selector("article")
    )
    opts = ours.options()

    for doc_id in range(0, 300, 23):
        url, html = gen.url_of(doc_id), gen.html_of(doc_id, 300)
        theirs_ex = RefCustomExtractor(ExtractorConfig())
        theirs_ex.add_rule("grab_divs", "div", priority=1)
        theirs_ex.add_rule("late_rule", "ul", priority=99)
        theirs_ex.add_selector("article")
        theirs = asyncio.get_event_loop().run_until_complete(
            theirs_ex.extract(url, None, html)
        )
        mine = extract_page(url, html, None, "rule_based", opts)
        assert mine["content"] == theirs.content, (doc_id, url)
        assert abs(mine["confidence_score"] - theirs.metrics.confidence_score) < 1e-9


def test_reference_batch_ordering_parity(ref, monkeypatch):
    """Drive the reference's REAL BatchProcessor loop (batch_processor.py:
    103-142) with a recording extractor whose per-URL latencies are
    deliberately scrambled: results must come back in input order, groups of
    ``max_workers`` must be strictly sequential, and in-group concurrency is
    capped by the semaphore — the exact semantics our frontier encodes as
    priority (round, seed_rank) (W6/J4)."""
    import random

    from intelligent_web_extractor.core import batch_processor as bp
    from intelligent_web_extractor.models.config import ExtractorConfig

    events = []

    class RecorderExtractor:
        def __init__(self, config):
            self._rng = random.Random(7)

        async def __aenter__(self):
            return self

        async def __aexit__(self, *a):
            return False

        async def extract_content(self, url, user_query=None, **kw):
            events.append(("start", url))
            await asyncio.sleep(self._rng.random() * 0.02)  # scramble finishes
            events.append(("end", url))
            return types.SimpleNamespace(url=url, success=True, user_query=user_query)

    monkeypatch.setattr(bp, "AdaptiveContentExtractor", RecorderExtractor)

    config = ExtractorConfig()
    config.performance.max_workers = 4
    config.performance.max_concurrent_requests = 2
    urls = [f"https://h{i % 3}.example/p{i}" for i in range(11)]

    proc = bp.BatchProcessor(config)
    results = asyncio.get_event_loop().run_until_complete(proc.process_urls(urls))

    # 1. results in input order despite scrambled completion order
    assert [r.url for r in results] == urls
    # 2. groups of max_workers are strictly sequential: no URL of group g
    #    starts before every earlier group has fully completed
    group_of = {u: i // 4 for i, u in enumerate(urls)}
    group_size = {}
    for u in urls:
        group_size[group_of[u]] = group_size.get(group_of[u], 0) + 1
    ends = {}
    completed = set()
    for kind, url in events:
        g = group_of[url]
        if kind == "start":
            assert set(range(g)) <= completed, (url, g, completed)
        else:
            ends[g] = ends.get(g, 0) + 1
            if ends[g] == group_size[g]:
                completed.add(g)
    # 3. in-group concurrency never exceeds the semaphore cap
    active, peak = 0, 0
    for kind, _url in events:
        active += 1 if kind == "start" else -1
        peak = max(peak, active)
    assert peak <= config.performance.max_concurrent_requests


@pytest.mark.parametrize("mode", ["semantic", "structured", "rule_based", "hybrid"])
def test_reference_metrics_and_metadata_parity(ref, mode):
    """Reference ExtractionMetrics.confidence_score and metadata title must
    match our kernel exactly (both sides pre-date the orchestrator's final
    pass, which never changes confidence or title).

    rule_based gets a FRESH strategy instance per page: its confidence folds
    in cumulative per-process rule success counters
    (rule_based_strategy.py:540-546), which are order-dependent across pages
    — our kernel is deliberately stateless per row (documented deviation),
    equivalent to the reference's first-page-of-a-fresh-process behavior.
    """
    sys.path.insert(0, str(REPO))
    from crawler_engine_spark.kernels.extract import DEFAULT_OPTIONS, extract_page

    for i, (url, html) in enumerate(_corpus()):
        query = QUERIES[i % len(QUERIES)]
        strategy = ref["fresh_rule_based"]() if mode == "rule_based" else ref[mode]
        theirs = _ref_extract(strategy, url, query, html)
        ours = extract_page(url, html, query, mode, DEFAULT_OPTIONS)
        ref_conf = theirs["metrics"].confidence_score
        assert abs(ours["confidence_score"] - ref_conf) < 1e-9, (
            mode, url, query, ours["confidence_score"], ref_conf,
        )
        ref_title = getattr(theirs["metadata"], "title", None)
        assert (ours["metadata"]["title"] or None) == (ref_title or None), (
            mode, url, ours["metadata"]["title"], ref_title,
        )


def test_reference_adaptive_assembly_parity():
    """VERDICT r04 #5: execute the reference's OWN adaptive assembly.

    ``AdaptiveExtractionStrategy._extract_absolutely_everything`` is two
    spans: (a) an in-browser ``page.evaluate`` JS block
    (adaptive_strategy.py:542-592) that no pure-Python run can execute —
    that span stays FIXTURE-DEFINED here, recomputed with our DOM kit
    (exactly the documented kernel deviation #3: innerText approximated
    block-aware); and (b) the pure-Python composite assembly at :594-608
    (the PAGE METADATA / HEADINGS STRUCTURE / FULL TEXT CONTENT / LINKS
    FOUND f-string, chr(10) joins, .get() defaults, trailing newline) —
    that span RUNS below and must byte-match our ``extract_adaptive``
    composite for the same page.  The exception fallback at :615-620
    (re-evaluate body innerText) is executed too."""
    from urllib.parse import urljoin

    _install_stubs()
    from intelligent_web_extractor.models.config import ExtractorConfig
    from intelligent_web_extractor.strategies.adaptive_strategy import (
        AdaptiveExtractionStrategy,
    )

    sys.path.insert(0, str(REPO))
    from crawler_engine_spark.data import gen
    from crawler_engine_spark.htmlkit import dom
    from crawler_engine_spark.kernels.extract import (
        _WS_RE,
        DEFAULT_OPTIONS,
        extract_adaptive,
    )

    strategy = AdaptiveExtractionStrategy(
        _FailingAIClient(), ExtractorConfig(), browser_manager=object()
    )

    cases = [(gen.url_of(i), gen.html_of(i, 300)) for i in (0, 11, 77)]
    # degenerate shapes: no title, no headings, no links; link text with
    # colons/dashes; heading with embedded whitespace
    cases.append((
        "https://edge.example/p",
        "<html><head></head><body><p>only a paragraph</p></body></html>",
    ))
    cases.append((
        "https://edge.example/q",
        "<html><head><title>T: x - y</title></head><body>"
        "<h2>A  spaced   heading</h2>"
        '<a href="/rel">text: with - punct</a>'
        '<a href="https://abs.example/z"></a></body></html>',
    ))

    for url, html in cases:
        root = dom.parse(html)
        title_el = root.find("title")
        body = root.find("body")
        body_text = dom.inner_text(body) if body is not None else ""
        all_texts = [
            t for el in root.iter_elements() for t in [el.get_text().strip()] if t
        ]
        combined = _WS_RE.sub(" ", " ".join([body_text] + all_texts)).strip()
        payload = {
            "fullText": combined,
            "metadata": {
                "title": title_el.get_text().strip() if title_el is not None else "",
                "url": url,
                "headings": [
                    {"level": h.name.upper(), "text": h.get_text()}
                    for h in root.find_all(["h1", "h2", "h3", "h4", "h5", "h6"])
                ],
                "links": [
                    {
                        "text": a.get_text(),
                        "href": urljoin(url, a.attrs.get("href", ""))
                        if a.attrs.get("href", "")
                        else url,
                    }
                    for a in root.select("a[href]")[:50]
                ],
            },
        }

        class _Page:
            def __init__(self, p):
                self._p = p

            async def evaluate(self, js):
                return self._p

        theirs = asyncio.get_event_loop().run_until_complete(
            strategy._extract_absolutely_everything(_Page(payload))
        )
        ours = extract_adaptive(url, None, html, DEFAULT_OPTIONS)["content"]
        assert theirs == ours, (url, theirs[:200], ours[:200])

    # the exception fallback (:615-620): first evaluate raises, the
    # reference re-evaluates body innerText and returns it verbatim
    class _BrokenPage:
        def __init__(self):
            self.calls = 0

        async def evaluate(self, js):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("browser gone")
            return "fallback body text"

    page = _BrokenPage()
    got = asyncio.get_event_loop().run_until_complete(
        strategy._extract_absolutely_everything(page)
    )
    assert got == "fallback body text" and page.calls == 2
