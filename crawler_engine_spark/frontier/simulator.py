"""Single-threaded oracle crawl simulator.

Encodes the engine's deterministic crawl semantics (priority FIFO batches
under a per-host politeness budget — the distributed analog of the
reference's ordering, core/batch_processor.py:103-142) in ~100 lines of pure
Python.  Frontier tests assert the Spark engine reproduces this oracle's
per-round fetch sequences and final URL-seen set exactly.

Shares the exact same kernels as the engine (canonicalize_url,
extract_out_links), so any divergence is in the *distributed machinery*, which
is precisely what the tests must catch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..kernels import urls as urlkit
from ..kernels.extract import extract_out_links

DEFAULT_CRAWL_DELAY_S = 0.5


@dataclass
class SimRobots:
    disallow_prefixes: Dict[str, List[str]] = field(default_factory=dict)
    crawl_delay_s: Dict[str, float] = field(default_factory=dict)

    def blocked(self, host: str, path: str) -> bool:
        return any(path.startswith(p) for p in self.disallow_prefixes.get(host, []))

    def delay(self, host: str) -> float:
        return self.crawl_delay_s.get(host, DEFAULT_CRAWL_DELAY_S)


Priority = Tuple[int, int, int]  # (depth, parent_seq, link_position)


@dataclass
class SimFetch:
    round: int
    fetch_seq: int
    url: str
    host: str
    status: str
    depth: int


def _path_of(url: str) -> str:
    from urllib.parse import urlparse

    return urlparse(url).path


def simulate_crawl(
    seeds: List[dict],
    pages: Dict[str, bytes],
    robots: SimRobots,
    round_seconds: float = 10.0,
    max_rounds: int = 100,
    burst_rounds: int = 1,
) -> Tuple[List[SimFetch], set]:
    """Run the oracle crawl.  ``seeds``: [{url, seed_rank, query}];
    ``pages``: canonical_url → html bytes.
    Returns (ordered fetch log, final seen set)."""
    frontier: Dict[str, Priority] = {}
    seen: set = set()
    log: List[SimFetch] = []
    total_fetched = 0
    tokens: Dict[str, float] = {}  # token-bucket state (eligible hosts only)

    for s in seeds:
        c = urlkit.canonicalize_url(s["url"])
        if not urlkit.is_valid_url(c):
            continue
        pri = (0, -1, int(s["seed_rank"]))
        if c not in frontier or pri < frontier[c]:
            frontier[c] = pri

    for rnd in range(1, max_rounds + 1):
        if not frontier:
            break
        # robots gate
        blocked_now = []
        for url in list(frontier):
            host = urlkit.url_host(url)
            if robots.blocked(host, _path_of(url)):
                blocked_now.append(url)
                del frontier[url]
        seen.update(blocked_now)

        # per-host budgeted selection by priority (token bucket: available =
        # min(burst·refill, carried + refill); budget = max(1, ⌊available⌋))
        by_host: Dict[str, List[str]] = {}
        for url in frontier:
            by_host.setdefault(urlkit.url_host(url), []).append(url)
        selected: List[str] = []
        available_by_host: Dict[str, float] = {}
        used_by_host: Dict[str, int] = {}
        for host, urls in by_host.items():
            refill = round_seconds / max(robots.delay(host), 1e-9)
            available = min(burst_rounds * refill, tokens.get(host, 0.0) + refill)
            available_by_host[host] = available
            budget = max(1, int(available))
            urls.sort(key=lambda u: frontier[u])
            take = urls[:budget]
            used_by_host[host] = len(take)
            selected.extend(take)
        tokens = {
            h: available_by_host[h] - used_by_host[h] for h in by_host
        }
        if not selected and not blocked_now:
            break
        # global deterministic fetch order
        selected.sort(key=lambda u: frontier[u])

        # fetch-simulate + link discovery
        candidates: Dict[str, Priority] = {}
        for i, url in enumerate(selected):
            fetch_seq = total_fetched + i
            html = pages.get(url)
            status = "ok" if html is not None else "miss"
            log.append(
                SimFetch(rnd, fetch_seq, url, urlkit.url_host(url),
                         status, frontier[url][0])
            )
            if html is None:
                continue
            depth = frontier[url][0]
            out = extract_out_links(
                html.decode("utf-8", errors="replace"), url
            )
            for pos, raw in enumerate(out):
                c = urlkit.canonicalize_url(raw)
                if not urlkit.is_valid_url(c) or not c.startswith(("http://", "https://")):
                    continue
                pri = (depth + 1, fetch_seq, pos)
                if c not in candidates or pri < candidates[c]:
                    candidates[c] = pri

        total_fetched += len(selected)
        for url in selected:
            seen.add(url)
            del frontier[url]

        # novelty: drop anything seen or already waiting in the frontier
        for c, pri in candidates.items():
            if c in seen or c in frontier:
                continue
            frontier[c] = pri

    return log, seen
