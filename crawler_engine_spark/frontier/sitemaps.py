"""Sitemap ingestion: seed-frontier expansion from sitemap XML.

The reference engine starts from operator-supplied URL lists
(core/extractor.py batch entry points); a web-scale frontier additionally
bootstraps from the hosts' own sitemaps (robots.txt ``Sitemap:`` lines →
sitemap / sitemap-index XML → ``<loc>`` entries).  Everything here is pure
JVM column expressions — ``regexp_extract_all`` for the ``<loc>`` scan and
chained ``replace`` for the five XML entities — so sitemap expansion fuses
into the scan under whole-stage codegen; no Python UDF, no shuffle until
the final distinct.

Scale shape: one row in = one sitemap document (≤ 50k locs by spec);
explode fans out map-side; the only shuffle is the seed-dedup distinct on
the canonical URL.  ``seed_rank`` is the xxhash64 of the canonical URL —
deterministic and computable map-side, avoiding the single-partition
global-ordering window a rank-by-sort would need at 10^8 seeds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.urlops import canonical_url_col, host_col, url_hash_col

_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"


def _xml_unescape(s: Column) -> Column:
    """The five predefined XML entities.  ``&amp;`` must decode LAST:
    ``&amp;lt;`` is the literal text ``&lt;``, not ``<``."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'")):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.replace(s, F.lit("&amp;"), F.lit("&"))


def robots_sitemap_urls_col(robots_txt: Column) -> Column:
    """``array<string>`` of ``Sitemap:`` directive URLs from a robots.txt
    body.  The directive is agent-independent (it may appear outside any
    ``User-agent`` group), case-insensitive, one per line — a pure
    line-anchored regexp scan, no stateful parse needed."""
    return F.regexp_extract_all(
        robots_txt, F.lit(r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"), F.lit(1)
    )


def sitemap_urls_from_robots(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(host, sitemap_url)`` from the page store's ``/robots.txt`` rows —
    the discovery step feeding :func:`seeds_from_sitemaps` (fetch the
    returned URLs, then parse their XML).  The binary body is taken as
    UTF-8; the robots spec is ASCII-oriented, and a malformed byte can at
    worst corrupt one directive line."""
    robots = pages.where(F.col(url_col).endswith("/robots.txt"))
    return robots.select(
        host_col(F.col(url_col)).alias("host"),
        F.explode(
            robots_sitemap_urls_col(F.col(html_col).cast("string"))
        ).alias("sitemap_url"),
    ).distinct()


def sitemap_locs_col(xml: Column) -> Column:
    """``array<string>`` of trimmed, entity-decoded ``<loc>`` values —
    works for both ``<urlset>`` leaves and ``<sitemapindex>`` indexes
    (both wrap children's URLs in ``<loc>``)."""
    return F.transform(
        F.regexp_extract_all(xml, F.lit(_LOC_RE), F.lit(1)),
        _xml_unescape,
    )


def is_sitemap_index_col(xml: Column) -> Column:
    """True for a ``<sitemapindex>`` document (its locs are further
    sitemap URLs to fetch, not page seeds)."""
    return xml.contains("<sitemapindex")


def expand_sitemaps(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """One row per ``<loc>``: input columns (minus the XML payload) pass
    through, plus ``loc`` and ``is_index``."""
    keep = [c for c in df.columns if c != xml_col]
    return df.select(
        *keep,
        is_sitemap_index_col(F.col(xml_col)).alias("is_index"),
        F.explode(sitemap_locs_col(F.col(xml_col))).alias("loc"),
    )


def discover_seeds_from_page_store(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    query: str | None = None,
    max_index_depth: int = 2,
) -> DataFrame:
    """Full sitemap bootstrap against a fetch-simulated page store:
    ``/robots.txt`` rows → ``Sitemap:`` directives → fetch-simulate each
    sitemap URL (join against the page store, the engine's ``page.goto``
    analog) → expand ``<sitemapindex>`` documents up to ``max_index_depth``
    levels → :func:`seeds_from_sitemaps` over all leaf ``<urlset>`` XML.

    Returns ``(url, seed_rank, query)`` ready for
    ``CrawlEngine.init_from_seeds``.  Sitemap URLs missing from the page
    store simply join to nothing (a real fetch 404), and the index-expansion
    loop is bounded — index cycles cannot hang the bootstrap.  Each level is
    one broadcast-able join of a (tiny) sitemap-URL set against the page
    store; no Python UDF anywhere."""
    body = F.col(html_col).cast("string")
    sm_urls = sitemap_urls_from_robots(pages, url_col, html_col).select(
        "sitemap_url"
    )
    xml_all = None
    for _ in range(max_index_depth + 1):
        xml = (
            sm_urls.join(pages, sm_urls.sitemap_url == F.col(url_col))
            .select(body.alias("xml"))
        )
        xml_all = xml if xml_all is None else xml_all.unionByName(xml)
        sm_urls = (
            expand_sitemaps(xml)
            .where("is_index")
            .select(F.col("loc").alias("sitemap_url"))
            .distinct()
        )
    return seeds_from_sitemaps(xml_all, query=query)


def seeds_from_sitemaps(
    df: DataFrame, xml_col: str = "xml", query: str | None = None
) -> DataFrame:
    """Sitemap documents → ``CrawlEngine.init_from_seeds`` input
    ``(url, seed_rank, query)``: leaf locs only (index locs are sitemap
    fetches, not seeds), canonicalized, deduplicated across sitemaps.
    ``seed_rank = xxhash64(canonical_url) mod 2^31`` — a deterministic
    crawl order computable map-side, needing no global sort, inside the
    frontier's int-typed rank (ties are harmless: rank is a priority, and
    the engine's ordering remains total via the URL hash)."""
    locs = expand_sitemaps(df, xml_col).where(~F.col("is_index"))
    canon = locs.select(
        canonical_url_col(F.col("loc")).alias("url")
    ).where(F.col("url") != "").distinct()
    return canon.select(
        "url",
        F.pmod(url_hash_col(F.col("url")), F.lit(1 << 31)).cast("int").alias(
            "seed_rank"
        ),
        F.lit(query).cast("string").alias("query"),
    )
