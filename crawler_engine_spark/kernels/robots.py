"""robots.txt parsing kernel.

The reference has no robots handling (its politeness is global rate limits,
models/config.py:158-161); the north rule requires a robots.txt cache.  This
kernel parses raw robots.txt bodies into the engine's rules shape
``(disallow_prefixes, crawl_delay_s)`` with standard semantics:

* user-agent groups; rules taken from the most specific matching group
  (exact agent match beats ``*``), consistent with RFC 9309 group selection.
* ``Disallow:`` path prefixes (empty disallow = allow everything).
* ``Crawl-delay:`` seconds (non-standard but widely used).
* comments (#) and blank lines ignored; unknown directives skipped.

The engine's prefix matcher intentionally implements plain prefix semantics
(no ``*``/``$`` wildcards) — wildcard rules are conservatively reduced to
their literal prefix before the first ``*``.
"""

from __future__ import annotations

from typing import Dict, List, Optional


def parse_robots_txt(
    body: str,
    agent: str = "crawler-engine-spark",
    default_crawl_delay: float = 0.5,
) -> Dict[str, object]:
    """Parse one robots.txt body → {disallow_prefixes: [...], crawl_delay_s: f}."""
    groups: List[dict] = []
    current: Optional[dict] = None
    last_was_agent = False

    for raw_line in (body or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            last_was_agent = last_was_agent and not line
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()

        if key == "user-agent":
            if current is None or not last_was_agent:
                current = {"agents": [], "disallow": [], "delay": None}
                groups.append(current)
            current["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if current is None:
            continue
        if key == "disallow":
            if value:
                prefix = value.split("*", 1)[0].rstrip("$")
                if prefix:
                    current["disallow"].append(prefix)
        elif key == "allow":
            pass  # prefix-only model: Allow overrides are not supported
        elif key == "crawl-delay":
            try:
                current["delay"] = float(value)
            except ValueError:
                pass

    agent_l = agent.lower()
    chosen = None
    best_spec = -1
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                spec = 0
            elif a in agent_l or agent_l in a:
                spec = len(a)
            else:
                continue
            if spec > best_spec:
                best_spec = spec
                chosen = g
    if chosen is None:
        return {"disallow_prefixes": [], "crawl_delay_s": default_crawl_delay}
    delay = chosen["delay"] if chosen["delay"] is not None else default_crawl_delay
    return {"disallow_prefixes": list(chosen["disallow"]), "crawl_delay_s": delay}


def robots_txt_of(host_rules: dict) -> str:
    """Render a rules row back to robots.txt text (fixture generation)."""
    lines = ["User-agent: *"]
    for p in host_rules.get("disallow_prefixes", []):
        lines.append(f"Disallow: {p}")
    d = host_rules.get("crawl_delay_s")
    if d is not None:
        lines.append(f"Crawl-delay: {d}")
    return "\n".join(lines) + "\n"
