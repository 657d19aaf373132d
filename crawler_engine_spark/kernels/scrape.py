"""Page-metadata scrape kernel (S7).

Reimplements the reference's in-browser metadata scrape
(utils/browser_manager.py:414-474) as a pure function over stored HTML:
* meta-tag map — name-or-property → content, later keys overwrite earlier
  (dict semantics, browser_manager.py:420-433)
* ld+json blocks — raw JSON strings from <script type="application/ld+json">
  (browser_manager.py:436-449)
* page stats — char/word/link/image/script counts (browser_manager.py:451-466)
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

from ..htmlkit import dom


def scrape_page_metadata(html: str) -> Dict[str, Any]:
    root = dom.parse(html or "")

    meta_tags: Dict[str, str] = {}
    for m in root.find_all("meta"):
        name = m.attrs.get("name") or m.attrs.get("property") or ""
        content = m.attrs.get("content", "")
        if name and content:
            meta_tags[name] = content  # later keys overwrite (dict semantics)

    ld_json: List[str] = []
    for s in root.find_all("script"):
        if (s.attrs.get("type") or "").lower() == "application/ld+json":
            raw = s.get_text()
            if raw.strip():
                ld_json.append(raw)

    title_el = root.find("title")
    body = root.find("body")
    body_text = body.get_text(separator=" ", strip=True) if body is not None else ""
    stats = {
        "char_count": len(body_text),
        "word_count": len(re.findall(r"\S+", body_text)),
        "link_count": len([a for a in root.find_all("a") if "href" in a.attrs]),
        "image_count": len(root.find_all("img")),
        "script_count": len(root.find_all("script")),
    }
    return {
        "title": title_el.get_text().strip() if title_el is not None else "",
        "meta_tags": meta_tags,
        "ld_json": ld_json,
        **stats,
    }
