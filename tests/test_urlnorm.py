"""Golden-vector + property tests for F1 is_valid / F2 canonicalize
(SURVEY.md §5.1–5.2)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spacetime_crawler_spark.functions.urlnorm import (
    canonicalize_url,
    get_host,
    is_valid,
    resolve_and_canonicalize,
)

CANON_CASES = [
    # fragments
    ("http://a.com/p#frag", "http://a.com/p"),
    ("http://a.com/#", "http://a.com"),
    # trailing slash (reference normalize)
    ("http://a.com/p/", "http://a.com/p"),
    ("http://a.com/", "http://a.com"),
    ("http://a.com", "http://a.com"),
    # default / explicit ports
    ("http://a.com:80/p", "http://a.com/p"),
    ("https://a.com:443/p", "https://a.com/p"),
    ("http://a.com:8080/p", "http://a.com:8080/p"),
    ("https://a.com:80/p", "https://a.com:80/p"),  # 80 is not https default
    ("http://a.com:/p", "http://a.com/p"),
    # case
    ("HTTP://A.com/P", "http://a.com/P"),
    ("http://WWW.Example.COM/Path", "http://www.example.com/Path"),
    # duplicate slashes + dot segments
    ("http://a.com//x///y", "http://a.com/x/y"),
    ("http://a.com/x/./y", "http://a.com/x/y"),
    ("http://a.com/x/../y", "http://a.com/y"),
    ("http://a.com/x/y/..", "http://a.com/x"),
    ("http://a.com/../x", "http://a.com/x"),
    # query preserved, fragment after query dropped
    ("http://a.com/p?q=1&r=2#sec", "http://a.com/p?q=1&r=2"),
    ("http://a.com/p?", "http://a.com/p"),
    # percent-encoding left untouched
    ("http://a.com/a%20b", "http://a.com/a%20b"),
    # whitespace
    ("  http://a.com/p  ", "http://a.com/p"),
    # userinfo preserved
    ("http://u:p@a.com/x", "http://u:p@a.com/x"),
    # non-http scheme: defragment only
    ("mailto:x@y.com", "mailto:x@y.com"),
    ("ftp://a.com/x#f", "ftp://a.com/x"),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize_golden(raw, expected):
    assert canonicalize_url(raw) == expected


RESOLVE_CASES = [
    ("http://a.com/dir/page", "other", "http://a.com/dir/other"),
    ("http://a.com/dir/page", "/root", "http://a.com/root"),
    ("http://a.com/dir/page", "../up", "http://a.com/up"),
    ("http://a.com/dir/page", "#frag", "http://a.com/dir/page"),
    ("http://a.com/dir/page", "http://b.com/x/", "http://b.com/x"),
    ("http://a.com/dir/page", "//c.com/y", "http://c.com/y"),
    ("http://a.com/dir/page", "?q=2", "http://a.com/dir/page?q=2"),
]


@pytest.mark.parametrize("base,href,expected", RESOLVE_CASES)
def test_resolve_golden(base, href, expected):
    assert resolve_and_canonicalize(base, href) == expected


VALID_CASES = [
    ("http://a.com/page", True),
    ("https://a.com/page.html", True),
    ("http://a.com/file.PDF", False),  # lowercased path check
    ("http://a.com/file.pdf", False),
    ("http://a.com/archive.tar", False),
    ("http://a.com/x.tgz", False),
    ("http://a.com/x.jpeg", False),
    ("http://a.com/x.jpg", False),
    ("http://a.com/x.tif", False),
    ("http://a.com/x.tiff", False),
    ("http://a.com/style.css", False),
    ("http://a.com/app.js?v=2", False),  # extension test is on PATH (query ignored)
    ("http://a.com/data.csv", False),
    ("http://a.com/x.zip", False),
    ("ftp://a.com/page", False),
    ("mailto:x@y.com", False),
    ("javascript:void(0)", False),
    ("http:///nopath", False),  # no netloc
    ("http://a.com/notanextension.html", True),
    ("http://a.com/pdf", True),  # no dot
]


@pytest.mark.parametrize("url,expected", VALID_CASES)
def test_is_valid_golden(url, expected):
    assert is_valid(url) == expected


def test_is_valid_domain_allowlist():
    assert is_valid("http://x.ics.uci.edu/p", ("ics.uci.edu",))
    assert is_valid("http://ics.uci.edu/p", ("ics.uci.edu",))
    assert not is_valid("http://evil-ics.uci.edu.com/p", ("ics.uci.edu",))
    assert not is_valid("http://b.com/p", ("ics.uci.edu",))


def test_get_host():
    assert get_host("http://A.com:8080/x") == "a.com"
    assert get_host("https://u:p@B.org/x") == "b.org"
    assert get_host("notaurl") == ""


_url_strategy = st.builds(
    lambda scheme, host, path, frag: f"{scheme}://{host}{path}{frag}",
    st.sampled_from(["http", "https", "HTTP"]),
    st.from_regex(r"[a-zA-Z][a-zA-Z0-9.-]{0,20}\.[a-z]{2,5}", fullmatch=True),
    st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,5}/?", fullmatch=True),
    st.sampled_from(["", "#f", "#"]),
)


@settings(max_examples=300, deadline=None)
@given(_url_strategy)
def test_canonicalize_idempotent(url):
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@settings(max_examples=300, deadline=None)
@given(_url_strategy)
def test_canonicalize_drops_fragment_and_is_lower_host(url):
    c = canonicalize_url(url)
    assert "#" not in c
    assert get_host(c) == get_host(c).lower()
