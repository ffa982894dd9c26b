"""Golden vectors for the pinned F8/F9 extraction spec (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from spacetime_crawler_spark.functions.textextract import extract_links, extract_text

TEXT_CASES = [
    (b"<html><body><p>hello</p></body></html>", "hello"),
    (b"<html><body><p>a</p><p>b</p></body></html>", "a\nb"),
    # script/style stripped
    (
        b"<html><head><script>var x=1;</script><style>p{}</style>"
        b"<title>T</title></head><body>B</body></html>",
        "T\nB",
    ),
    # nested tags flatten in document order
    (b"<div>x <b>y</b> z</div>", "x\ny\nz"),
    # entities decoded
    (b"<p>a &amp; b &lt;c&gt;</p>", "a & b <c>"),
    # empty body
    (b"<html><body></body></html>", ""),
    (b"", ""),
    (None, ""),
    # whitespace-only nodes dropped
    (b"<p>  </p><p>x</p>", "x"),
    # non-utf8 bytes replaced, not fatal
    ("caf\xe9".encode("latin-1"), "caf�"),
    # unclosed script never unskips mid-document
    (b"<script>x</script>after", "after"),
]


@pytest.mark.parametrize("html,expected", TEXT_CASES)
def test_extract_text_golden(html, expected):
    assert extract_text(html) == expected


def test_extract_text_deterministic_bytes():
    html = "<p>über</p>".encode()
    assert extract_text(html).encode() == "über".encode()


def test_extract_links_document_order_and_resolution():
    html = b"""
    <html><body>
      <a href="b.html">one</a>
      <a href="/abs">two</a>
      <a href="http://other.com/x#frag">three</a>
      <a href="c.html">dup</a>
      <a href="c.html">dup-again</a>
      <a name="anchor-without-href">skip</a>
      <a href="x.pdf">blacklisted-but-extracted</a>
    </body></html>
    """
    links = extract_links(html, "http://a.com/dir/page.html")
    assert links == [
        "http://a.com/dir/b.html",
        "http://a.com/abs",
        "http://other.com/x",
        "http://a.com/dir/c.html",
        "http://a.com/dir/c.html",
        "http://a.com/dir/x.pdf",
    ]


def test_extract_links_empty():
    assert extract_links(b"<p>no links</p>", "http://a.com") == []
    assert extract_links(None, "http://a.com") == []
