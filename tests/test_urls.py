"""URL kernel parity tests (reference: utils/web_utils.py:16-45, 243-278)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_engine_spark.kernels import urls as urlkit


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("", ""),
        ("  https://Example.COM/Path ", "https://example.com/Path"),
        ("example.com/x", "https://example.com/x"),
        ("http://a.b/c?q=1#f", "http://a.b/c?q=1#f"),
        # Reference quirk: the scheme check is case-sensitive, so an
        # uppercase scheme gets https:// prepended (web_utils.py:33).
        ("HTTP://HostA.Example/a", "https://http://HostA.Example/a"),
    ],
)
def test_sanitize_url(raw, expected):
    assert urlkit.sanitize_url(raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("https://a.b/c/d?q=1#f", "https://a.b/c/d"),
        ("https://a.b/c/d;params", "https://a.b/c/d"),
        ("https://a.b", "https://a.b"),
        ("https://a.b/", "https://a.b/"),
    ],
)
def test_normalize_url(raw, expected):
    assert urlkit.normalize_url(raw) == expected


def test_is_valid_url():
    assert urlkit.is_valid_url("https://a.b/c")
    assert not urlkit.is_valid_url("not a url")
    assert not urlkit.is_valid_url("/relative/only")


def test_resolve_href_skips_and_joins():
    base = "https://h.example/a/b"
    assert urlkit.resolve_href("javascript:void(0)", base) is None
    assert urlkit.resolve_href("mailto:x@y", base) is None
    assert urlkit.resolve_href("tel:+123", base) is None
    assert urlkit.resolve_href("c.html", base) == "https://h.example/a/c.html"
    assert urlkit.resolve_href("/root.html", base) == "https://h.example/root.html"
    assert urlkit.resolve_href("https://other/x", base) == "https://other/x"


def test_url_host():
    assert urlkit.url_host("https://User@Host9.Example:8080/x") == "host9.example"
    assert urlkit.url_host("https://host1.example/a") == "host1.example"


_url_alphabet = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~/?#&=%",
    min_size=0,
    max_size=60,
)


@given(_url_alphabet)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(tail):
    """normalize(sanitize(·)) is idempotent — the frontier key is stable."""
    url = "https://h.example/" + tail
    once = urlkit.canonicalize_url(url)
    assert urlkit.canonicalize_url(once) == once
