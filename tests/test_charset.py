"""Charset detection: pinned-spec goldens, decode totality, the Spark
operator's differential against the pure functions, and the single-Arrow-
crossing plan shape."""

from __future__ import annotations

import contextlib
import io as _io
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spacetime_crawler_spark.functions.charset import decode_html, detect_charset
from spacetime_crawler_spark.operators import cleaning


# --- pure-function goldens ----------------------------------------------------

def test_bom_wins():
    assert detect_charset(b"\xef\xbb\xbfhello") == "utf-8"
    assert detect_charset("hé".encode("utf-16-le")) != "utf-16-le"  # no BOM
    assert detect_charset(b"\xff\xfe" + "hé".encode("utf-16-le")) == "utf-16-le"
    assert detect_charset(b"\xfe\xff" + "hé".encode("utf-16-be")) == "utf-16-be"
    # BOM outranks a (wrong) declaration
    page = b"\xef\xbb\xbf<meta charset='shift_jis'>"
    assert detect_charset(page) == "utf-8"


def test_meta_declarations():
    assert detect_charset(b"<meta charset=utf-8><p>\xff") == "utf-8"
    assert (
        detect_charset(b'<meta charset="ISO-8859-1">caf\xe9')
        == "windows-1252"
    )
    assert (
        detect_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1251">'
        )
        == "windows-1251"
    )
    assert detect_charset(b"<META CHARSET='Shift_JIS'>") == "shift_jis"
    # WHATWG: a META-declared UTF-16 label means UTF-8 — the declaration
    # being ASCII-readable proves the page isn't UTF-16 (mislabeling seen
    # in real Common Crawl); honoring it literally yields CJK mojibake
    assert detect_charset(b"<meta charset=utf-16>hello world") == "utf-8"
    text, cs = decode_html(b"<html><meta charset=utf-16><p>hello</p></html>")
    assert cs == "utf-8" and "hello" in text
    # unknown label is ignored -> falls through to UTF-8 validity
    assert detect_charset(b"<meta charset='klingon'>ok") == "utf-8"
    # declaration outside the first 1024 bytes is not consulted
    far = b"x" * 1024 + b"<meta charset='koi8-r'>"
    assert detect_charset(far) == "utf-8"


def test_sniff_fallbacks():
    assert detect_charset(b"plain ascii") == "utf-8"
    assert detect_charset("snowman ☃".encode()) == "utf-8"
    assert detect_charset(b"caf\xe9 invalid utf8") == "windows-1252"
    assert detect_charset(b"") == "utf-8"
    assert detect_charset(None) == "utf-8"


def test_decode_semantics():
    # cp1252: 0x93/0x94 are curly quotes; the five holes become C1 controls
    text, cs = decode_html(b"\x93quoted\x94 caf\xe9 \x81")
    assert (text, cs) == ("“quoted” caf\xe9 \x81", "windows-1252")
    # declared shift_jis decodes katakana
    sjis = "<meta charset=shift_jis>カタカナ".encode("shift_jis")
    text, cs = decode_html(sjis)
    assert cs == "shift_jis" and "カタカナ" in text
    # BOM is stripped from the decoded text
    text, cs = decode_html(b"\xef\xbb\xbfhi")
    assert (text, cs) == ("hi", "utf-8")
    text, cs = decode_html(b"\xff\xfe" + "hé".encode("utf-16-le"))
    assert (text, cs) == ("hé", "utf-16-le")
    # a declared charset that mislabels the bytes still decodes totally
    text, cs = decode_html(b"<meta charset=utf-8>caf\xe9")
    assert cs == "utf-8" and "�" in text


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_decode_is_total(data):
    text, cs = decode_html(data)
    assert isinstance(text, str) and isinstance(cs, str)
    detect_charset(data)  # never raises either


# --- Spark operator -----------------------------------------------------------

_PAGES = [
    (0, "plain ascii page".encode()),
    (1, b"<meta charset='iso-8859-1'>caf\xe9"),
    (2, b"\xef\xbb\xbfbom page"),
    (3, "<meta charset=shift_jis>カタカナ".encode("shift_jis")),
    (4, b"raw latin \xe9 bytes, no declaration"),
    (5, None),
]


def _pages_df(spark):
    return spark.createDataFrame(_PAGES, "doc_id bigint, html binary")


def test_annotate_charset_matches_pure(spark):
    got = {
        r["doc_id"]: (r["charset"], r["text_decoded"])
        for r in cleaning.annotate_charset(_pages_df(spark)).collect()
    }
    for doc_id, html in _PAGES:
        text, cs = decode_html(html)
        assert got[doc_id] == (cs, text)


def test_annotate_charset_single_crossing_under_filter(spark):
    out = cleaning.annotate_charset(_pages_df(spark)).filter(
        F.col("charset") == "windows-1252"
    )
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    p = buf.getvalue()
    n_arrow = len(re.findall(r"\(\d+\) ArrowEvalPython", p))
    assert n_arrow == 1, p[:2000]  # the pushdown barrier held
    assert "Exchange" not in p, p[:2000]  # map-only


def test_warc_ingest_charset_sniff(spark, tmp_path):
    """charset_sniff=True: a cp1252 page keeps its accents; the default
    UTF-8-replace path mangles them (that's the column's reason to exist)."""
    import datetime as dt

    from spacetime_crawler_spark.sources import warc
    from tests.test_warc import _warc_bytes

    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    html_1252 = b"<html><meta charset='iso-8859-1'><p>caf\xe9 cr\xe8me</p></html>"
    html_utf8 = "<html><p>naïve ☃</p></html>".encode()
    path = str(tmp_path / "cs.warc")
    with open(path, "wb") as f:
        f.write(_warc_bytes([
            ("http://a.example.com/legacy", ts, html_1252),
            ("http://a.example.com/modern", ts, html_utf8),
        ]))

    sniffed = warc.read_warc_pages(
        spark, path, extract_text=True, charset_sniff=True
    )
    rows = {r["url"]: r for r in sniffed.collect()}
    legacy = rows["http://a.example.com/legacy"]
    assert legacy["charset"] == "windows-1252"
    assert "café crème" in legacy["text"]
    assert rows["http://a.example.com/modern"]["charset"] == "utf-8"
    assert "naïve ☃" in rows["http://a.example.com/modern"]["text"]

    plain = warc.read_warc_pages(spark, path, extract_text=True)
    mangled = {r["url"]: r["text"] for r in plain.collect()}
    assert "café" not in mangled["http://a.example.com/legacy"]
    assert "charset" not in plain.columns

    import pytest as _pytest

    with _pytest.raises(ValueError, match="extract_text"):
        warc.read_warc_pages(spark, path, charset_sniff=True)
