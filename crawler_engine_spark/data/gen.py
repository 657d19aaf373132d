"""Deterministic synthetic Common-Crawl-style world generator.

Produces the ``pages`` table of exactly the shape required by
BASELINE.json's input_hint — ``(url string, warc_ts timestamp, html binary,
text string, lang string)`` — plus ``seeds`` and ``robots_rules``
(FIXTURES.md tables 1-3).  Everything is a pure function of ``doc_id`` and
``n_docs`` (seeded hashing, no wall clock, no RNG state), so any scale can be
regenerated identically and the Spark generation path (mapInPandas over
``spark.range``) is embarrassingly parallel.

Host distribution is Zipf-skewed (a few hot hosts own a large share of URLs)
to exercise skew-aware politeness salting.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Iterator, List

import pandas as pd

N_HOSTS = 20
SECTIONS = ["news", "blog", "docs", "shop", "wiki"]
BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

_WORDS = (
    "data spark crawl frontier parquet shuffle partition politeness robots "
    "bloom filter hash join window budget host page article content text "
    "extraction semantic structured hybrid adaptive kernel vector arrow "
    "pipeline checkpoint resume lineage metric throughput scale executor"
).split()

_DE_WORDS = "der die das und seite inhalt daten netz maschine verteilt".split()
_FR_WORDS = "le la les et page contenu données réseau machine distribué".split()


def _h(doc_id: int, salt: str) -> int:
    """Deterministic 64-bit hash of (doc_id, salt)."""
    d = hashlib.md5(f"{salt}:{doc_id}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def host_of(doc_id: int) -> int:
    """Zipf-ish host assignment: host 0 gets ~33%, host 1 ~17%, tail uniform."""
    r = _h(doc_id, "host") % 100
    if r < 33:
        return 0
    if r < 50:
        return 1
    if r < 60:
        return 2
    return 3 + (_h(doc_id, "host2") % (N_HOSTS - 3))


def url_of(doc_id: int) -> str:
    h = host_of(doc_id)
    section = SECTIONS[_h(doc_id, "sec") % len(SECTIONS)]
    return f"https://host{h}.example/{section}/doc{doc_id}"


def lang_of(doc_id: int) -> str:
    r = _h(doc_id, "lang") % 100
    if r < 90:
        return "en"
    return "de" if r < 95 else "fr"


def template_of(doc_id: int) -> int:
    """1 article / 2 table page / 3 link hub / 4 iframe / 5 main-content / 6 edge."""
    r = _h(doc_id, "tmpl") % 100
    if r < 40:
        return 1
    if r < 55:
        return 2
    if r < 70:
        return 3
    if r < 80:
        return 4
    if r < 92:
        return 5
    return 6


def _words(doc_id: int, salt: str, n: int, lang: str = "en") -> str:
    vocab = {"en": _WORDS, "de": _DE_WORDS, "fr": _FR_WORDS}[lang]
    out = []
    for i in range(n):
        out.append(vocab[_h(doc_id, f"{salt}:{i}") % len(vocab)])
        if i % 12 == 11:
            out[-1] += "."
    return " ".join(out)


def out_link_ids(doc_id: int, n_docs: int) -> List[int]:
    """Deterministic link targets: 3-12 other docs (document order matters
    for crawl-ordering parity — link_position is positional)."""
    k = 3 + _h(doc_id, "nlinks") % 10
    ids = []
    for i in range(k):
        t = _h(doc_id, f"link:{i}") % max(n_docs, 1)
        if t != doc_id:
            ids.append(t)
    return ids


def _link_markup(doc_id: int, n_docs: int) -> str:
    """Anchor soup: absolute, relative, query-string, fragment, dup, and
    skip-scheme links — exercises canonicalization + the frontier feed."""
    parts = []
    for pos, target in enumerate(out_link_ids(doc_id, n_docs)):
        target_url = url_of(target)
        style = _h(doc_id, f"lstyle:{pos}") % 5
        if style == 0:
            href = target_url
        elif style == 1:  # relative path (resolves against this page's URL)
            tail = target_url.rsplit("/", 2)
            href = f"../{tail[-2]}/{tail[-1]}"
        elif style == 2:  # query string to strip
            href = target_url + f"?utm=abc&ref={pos}"
        elif style == 3:  # fragment to strip
            href = target_url + "#section-2"
        else:  # duplicate of position 0, exercises dedup
            first = out_link_ids(doc_id, n_docs)[0]
            href = url_of(first)
        parts.append(f'<a href="{href}">link {pos}</a>')
    parts.append('<a href="javascript:void(0)">js-link</a>')
    parts.append('<a href="mailto:admin@example.org">mail</a>')
    parts.append('<a href="tel:+1234567890">call</a>')
    return "\n".join(parts)


def body_text_of(doc_id: int, lang: str) -> str:
    n = 150 + _h(doc_id, "blen") % 500
    return _words(doc_id, "body", n, lang)


def html_of(doc_id: int, n_docs: int) -> str:
    lang = lang_of(doc_id)
    tmpl = template_of(doc_id)
    title = f"Document {doc_id} — {_words(doc_id, 'title', 3)}"
    body = body_text_of(doc_id, lang)
    links = _link_markup(doc_id, n_docs)
    author = f"Author {_h(doc_id, 'author') % 50}"
    pub = (BASE_TS + timedelta(seconds=doc_id)).strftime("%Y-%m-%dT%H:%M:%S+00:00")

    head = (
        f"<head><title>{title}</title>"
        f'<meta name="description" content="Synthetic page {doc_id}">'
        f'<meta name="author" content="{author}">'
        f'<meta name="keywords" content="crawl, spark, doc{doc_id % 7}">'
        f'<meta property="article:published_time" content="{pub}">'
        "<script>var x = 1;</script><style>.a{color:red}</style></head>"
    )
    nav = '<nav><a href="/home">Home</a> <a href="/about">About</a></nav>'
    footer = "<footer>Footer boilerplate text</footer>"
    ad = '<div class="ad-banner">Sponsored content block</div>'

    if tmpl == 1:  # article
        paras = "".join(
            f"<p>{_words(doc_id, f'p{i}', 120, lang)}</p>" for i in range(4)
        )
        main = f"<article><h1>{title}</h1>{paras}</article>"
    elif tmpl == 2:  # tables/lists/forms
        rows = "".join(
            f"<tr><td>item {i}</td><td>{_h(doc_id, f'val{i}') % 1000}</td></tr>"
            for i in range(5)
        )
        thead = "<thead><tr><th>name</th><th>value</th></tr></thead>" if doc_id % 2 == 0 else ""
        lis = "".join(f"<li>entry {i}</li>" for i in range(4))
        main = (
            f"<h1>{title}</h1>"
            f"<table><caption>Table for doc {doc_id}</caption>{thead}<tbody>{rows}</tbody></table>"
            f"<ul id='l{doc_id}'>{lis}</ul><ol>{lis}</ol>"
            f"<form action='/search' method='get'><input type='text' name='q' placeholder='query'>"
            f"<select name='s'><option value='1'>one</option><option value='2' selected>two</option></select>"
            f"</form><p>{body[:400]}</p>"
        )
    elif tmpl == 3:  # link hub
        main = f"<h1>{title}</h1><div class='hub'>{links}</div><p>{body[:300]}</p>"
    elif tmpl == 4:  # iframe page (pre-merged marker, hidden_content.py:25)
        main = (
            f"<h1>{title}</h1><p>{body[:600]}</p>"
            "\n<!--iframe-content-->\n"
            f"<div class='iframe-body'><p>{_words(doc_id, 'iframe', 80, lang)}</p></div>"
        )
    elif tmpl == 5:  # main-content page
        main = (
            f"<main><h1>{title}</h1><p>{body}</p></main>"
            f"<div class='other'>{_words(doc_id, 'off', 60, lang)}</div>"
        )
    else:  # edge cases
        edge = _h(doc_id, "edge") % 4
        if edge == 0:
            main = ""
        elif edge == 1:
            main = "<script>only_script();</script>"
        elif edge == 2:
            main = f"<p>Entities &amp; more &#8212; café 中文 \U0001f680</p><p>{body[:200]}</p>"
        else:
            main = f"<p>{'x' * 3000}</p>"

    return (
        f'<!DOCTYPE html><html lang="{lang}">{head}<body>{nav}<header>Site '
        f"header</header>{main}{ad}<div class='links'>{links}</div>{footer}</body></html>"
    )


def page_record(doc_id: int, n_docs: int) -> dict:
    lang = lang_of(doc_id)
    return {
        "url": url_of(doc_id),
        "warc_ts": BASE_TS + timedelta(seconds=doc_id),
        "html": html_of(doc_id, n_docs).encode("utf-8"),
        "text": body_text_of(doc_id, lang),
        "lang": lang,
    }


# --------------------------------------------------------------------------
# Spark generation (scales to arbitrary n_docs; partition-parallel)
# --------------------------------------------------------------------------

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def gen_pages_df(spark, n_docs: int, partitions: int = 32):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([page_record(int(i), n_docs) for i in pdf["id"]])

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def gen_seeds(n_docs: int, n_seeds: int = 10) -> List[dict]:
    """Seed list: first URLs of distinct docs plus one 404 (absent from pages).
    ``seed_rank`` = input order (crawl-ordering anchor)."""
    seeds = []
    seen = set()
    i = 0
    doc = 0
    while len(seeds) < n_seeds - 1 and doc < n_docs:
        u = url_of(doc)
        if u not in seen:
            seen.add(u)
            seeds.append({"url": u, "seed_rank": i, "query": None})
            i += 1
        doc += 7  # stride for host diversity
    seeds.append(
        {"url": f"https://host0.example/news/doc{n_docs + 999}", "seed_rank": i, "query": None}
    )
    return seeds


def gen_robots(crawl_delay_default: float = 0.5) -> List[dict]:
    """One rule row per host; hot hosts disallow a prefix, some are slower.
    Defaults mirror the reference budget (models/config.py:159-161)."""
    rules = []
    for h in range(N_HOSTS):
        disallow = ["/private/"]
        if h == 0:
            disallow.append("/shop/")  # hot host disallows a whole section
        rules.append(
            {
                "host": f"host{h}.example",
                "disallow_prefixes": disallow,
                "crawl_delay_s": 2.0 if h == 1 else crawl_delay_default,
            }
        )
    return rules
