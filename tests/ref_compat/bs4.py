"""Minimal BeautifulSoup-compatible facade over ``crawler_engine_spark.htmlkit.dom``.

Purpose: let the *reference's own strategy code* (which imports ``bs4``)
execute inside this container — where BeautifulSoup is deliberately absent —
so the byte-parity tests can run the reference extraction path directly
against our kernel instead of trusting hand-derived goldens.

Only the API surface the reference strategies actually touch is provided:
``BeautifulSoup(html, 'html.parser')``, ``Tag``, and on nodes:
find / find_all (incl. ``string=`` text search) / select / select_one /
get_text / decompose / extract / get / attrs / name — all of which
``htmlkit.dom.Node`` already implements with bs4-html.parser semantics.

This file lives under tests/ (not the package): it is test scaffolding, not
an engine component, and must never shadow a real bs4 installation.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from crawler_engine_spark.htmlkit import dom

Tag = dom.Node


class NavigableString(str):
    """Stand-in so ``isinstance(text, str)`` checks behave as with bs4."""


def BeautifulSoup(markup="", features=None, **kwargs):  # noqa: N802 (bs4 API)
    return dom.parse(markup or "")
