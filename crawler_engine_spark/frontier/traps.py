"""Crawl-trap detection: URL-pattern explosion profiling + frontier pruning.

Crawler traps (calendars, session-id links, faceted search, infinite
pagination) show up in a frontier as one URL *template* expanding into an
unbounded set of concrete URLs on a single host.  The reference engine never
meets this failure mode — it crawls operator-supplied URL lists
(core/extractor.py batch entry points) — but a 10^10-URL frontier dies on it,
so the frontier tier grows an explicit guard:

* :func:`url_pattern_col` — collapse every digit run (and long hex runs,
  which catch session ids / content hashes) to a placeholder, turning each
  concrete URL into its template.
* :func:`url_pattern_profile` — one map-side-combined aggregation over
  ``(host, pattern)`` counting distinct URLs; patterns above ``threshold``
  are flagged ``trap_suspect``.
* :func:`prune_traps` — drop frontier rows whose ``(host, pattern)`` is
  flagged, keeping up to ``keep_per_pattern`` lowest-hash survivors per
  flagged pattern so a legitimately-large section is sampled, not erased.

Scale shape: the profile is a single hash aggregation on ``(host,
pattern)`` — partial aggregation map-side, one shuffle of
pattern-cardinality rows (≪ URL cardinality).  The flagged-pattern set is
pattern-cardinality too, so ``prune_traps`` broadcasts it; the per-pattern
survivor window only runs on rows already inside flagged patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.urlops import host_col, url_hash_col

#: flag a (host, pattern) once it has this many distinct URLs
DEFAULT_TRAP_THRESHOLD = 10_000


#: digit-run sentinel used INSIDE the rule chain: a control char that never
#: survives URL canonicalization, so the B rule can tell a collapsed digit
#: run apart from a literal letter N (ADVICE r03: with a literal N
#: placeholder, digit-free words like /CNN/ or /ANNUAL/ collapsed to B and
#: merged unrelated URL families into one trap group).  Mapped to the
#: visible 'N' by the final rule.
_DIGIT_SENTINEL = "\x01"

#: the template rules, in application order.  All RE2-compatible (no
#: lookaheads, no backslashes) so the DuckDB correctness oracle can replay
#: them verbatim — the raw \x01 byte embeds in SQL string literals as-is.
PATTERN_RULES = (
    # dashed UUIDs first — the hex rule would shred them into H-xxxx-… chunks
    (
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "U",
    ),
    # %-encoded runs (percent-encoded session payloads, calendar params)
    (r"(?:%[0-9a-fA-F]{2})+", "P"),
    # 8+-char hex runs, case-insensitive via the class (RE2-safe), BEFORE the
    # digit rule so mixed digit/letter hex ids collapse wholesale instead of
    # fragmenting around their digit runs
    (r"[0-9a-fA-F]{8,}", "H"),
    # remaining digit runs → sentinel (becomes 'N' in the last rule)
    ("[0-9]+", _DIGIT_SENTINEL),
    # mixed alphanumeric tokens: a letter run interleaved with ≥2 collapsed
    # digit runs — catches base32/base64-ish session ids that aren't pure
    # hex; scoping the rule to the sentinel means tokens must have actually
    # contained digits, so pure words (CNN, ANNUAL) are never touched and
    # single-digit-run tokens (host0, v2) keep their letter identity
    (f"[A-Za-z]*(?:{_DIGIT_SENTINEL}[A-Za-z]*){{2,}}", "B"),
    # surviving sentinels become the visible digit placeholder
    (_DIGIT_SENTINEL, "N"),
)


def url_pattern_col(url: Column) -> Column:
    """URL → template via :data:`PATTERN_RULES`: dashed UUIDs → ``U``,
    %-encoded runs → ``P``, 8+-char hex runs (any case, digits included) →
    ``H``, digit runs → ``N``, and letter runs interleaved with ≥2 collapsed
    digit runs (base64-ish ids) → ``B``.  Rule order matters and is part of
    the template contract — the DuckDB oracle replays the same chain."""
    out = url
    for pat, repl in PATTERN_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def url_pattern_profile(
    frontier: DataFrame,
    url_col: str = "canonical_url",
    threshold: int = DEFAULT_TRAP_THRESHOLD,
) -> DataFrame:
    """``(host, url_pattern, n_urls, trap_suspect)`` — one row per URL
    template per host.  One shuffle (hash agg with map-side combine)."""
    return (
        frontier.select(
            host_col(F.col(url_col)).alias("host"),
            url_pattern_col(F.col(url_col)).alias("url_pattern"),
            F.col(url_col).alias("_url"),
        )
        .groupBy("host", "url_pattern")
        .agg(F.countDistinct("_url").alias("n_urls"))
        .withColumn("trap_suspect", F.col("n_urls") >= F.lit(threshold))
    )


def prune_traps(
    frontier: DataFrame,
    url_col: str = "canonical_url",
    threshold: int = DEFAULT_TRAP_THRESHOLD,
    keep_per_pattern: int = 100,
    suspects: DataFrame | None = None,
) -> DataFrame:
    """Frontier minus trap-pattern URLs, sampling ``keep_per_pattern``
    lowest-``xxhash64`` URLs from each flagged pattern (deterministic, no
    ordering dependence).  Columns of ``frontier`` pass through unchanged.

    The flagged set is (host, pattern)-cardinality — broadcast it; the
    top-k window runs only over rows that joined a flagged pattern.

    ``suspects`` lets a caller that already profiled the frontier (e.g.
    ``CrawlEngine.run_round``, which also counts the flagged templates for
    its commit record) pass the flagged ``(host, url_pattern)`` set in
    instead of paying a second profiling pass."""
    if suspects is None:
        suspects = (
            url_pattern_profile(frontier, url_col, threshold)
            .where("trap_suspect")
            .select("host", "url_pattern")
        )
    else:
        suspects = suspects.select("host", "url_pattern")
    keyed = frontier.withColumn(
        "_host", host_col(F.col(url_col))
    ).withColumn("_pat", url_pattern_col(F.col(url_col)))
    flagged = keyed.join(
        F.broadcast(suspects),
        (keyed["_host"] == suspects["host"])
        & (keyed["_pat"] == suspects["url_pattern"]),
        "left_semi",
    )
    clean = keyed.join(
        F.broadcast(suspects),
        (keyed["_host"] == suspects["host"])
        & (keyed["_pat"] == suspects["url_pattern"]),
        "left_anti",
    )
    w = Window.partitionBy("_host", "_pat").orderBy(
        url_hash_col(F.col(url_col)), F.col(url_col)
    )
    sampled = (
        flagged.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= keep_per_pattern)
        .drop("_rk")
    )
    out_cols = frontier.columns
    return clean.select(*out_cols).unionByName(sampled.select(*out_cols))
