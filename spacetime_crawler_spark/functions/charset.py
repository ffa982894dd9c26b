"""Charset detection for crawled/ingested HTML bytes — the WHATWG-encoding-
sniffing-flavored pinned spec a Common-Crawl pipeline needs before any text
op (real web pages are ~5% declared-or-actual legacy encodings; decoding
everything as UTF-8-replace silently mangles them).

This is deliberately a SEPARATE surface from F9's pinned extractor, whose
"UTF-8, errors → U+FFFD" decode is a frozen byte-identity contract the
differential crawl suite pins.  Pipelines that want charset-aware text call
annotate_charset / decode_html explicitly.

Pinned detection order (first hit wins — a simplification of the WHATWG
sniff, each step standard practice):
1. BOM: UTF-8 / UTF-16 LE / UTF-16 BE (BOM outranks any declaration).
2. A charset declaration in the first 1024 bytes, scanned ASCII-wise:
   <meta charset=X> or <meta http-equiv=content-type content="...charset=X">
   (the regexes run on a latin-1 view, so declaration scanning never
   depends on the answer).  Labels are normalized per WHATWG: latin-1 /
   iso-8859-1 / ascii map to windows-1252, and the UTF-16 family maps to
   utf-8 (an ASCII-readable declaration proves the bytes aren't UTF-16;
   real UTF-16 is caught by its BOM in step 1); unknown labels are
   IGNORED and sniffing continues.
3. Strict UTF-8 validation of the whole payload -> utf-8.
4. Fallback: windows-1252 (the WHATWG default for the no-information case).

decode_html() decodes per that verdict with errors="replace" (a DECLARED
charset can still mislabel actual bytes) after stripping the BOM, except
that windows-1252's five unmapped bytes fall back byte-transparently via
latin-1 — so decoding never raises and never loses length determinism.
"""

from __future__ import annotations

import re

_DECL_WINDOW = 1024

# WHATWG label -> python codec for the labels that matter in practice.
# Unknown labels fall through to UTF-8 validation (step 3).
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252", "latin-1": "windows-1252",
    "latin1": "windows-1252", "l1": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "iso-8859-2": "iso-8859-2", "iso-8859-15": "iso-8859-15",
    "windows-1250": "windows-1250", "windows-1251": "windows-1251",
    "cp1251": "windows-1251", "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "euc-jp": "euc-jp", "euc-kr": "euc-kr",
    "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5",
    # WHATWG maps a META-declared UTF-16 family to UTF-8: the declaration
    # was readable by an ASCII-wise scan, so the bytes are by definition
    # not UTF-16 — honoring the label literally turns the whole page into
    # CJK mojibake.  Real UTF-16 is caught earlier by its BOM.
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}

_META_CHARSET = re.compile(
    rb"""<meta[^>]*?\bcharset\s*=\s*["']?\s*([a-zA-Z0-9._\-]+)""",
    re.IGNORECASE,
)


def _declared_label(head: bytes) -> str | None:
    """First recognized charset label declared in `head` (covers both the
    <meta charset=...> and http-equiv content="...; charset=..." forms —
    the charset= attribute/parameter is the common token)."""
    for m in _META_CHARSET.finditer(head):
        label = m.group(1).decode("ascii", "replace").lower()
        codec = _LABELS.get(label)
        if codec is not None:
            return codec
    return None


def detect_charset(data: bytes | None) -> str:
    """Pinned sniff (module docstring).  Always returns a decodable python
    codec name; empty/None input is utf-8."""
    if not data:
        return "utf-8"
    b = bytes(data)
    if b.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if b.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if b.startswith(b"\xfe\xff"):
        return "utf-16-be"
    declared = _declared_label(b[:_DECL_WINDOW])
    if declared is not None:
        return declared
    try:
        b.decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_html(data: bytes | None) -> tuple[str, str]:
    """(text, charset): decode per detect_charset with errors='replace',
    BOM stripped.  windows-1252's five holes (0x81 8D 8F 90 9D) fall back
    byte-for-byte via latin-1 so decoding is total."""
    charset = detect_charset(data)
    if not data:
        return "", charset
    b = bytes(data)
    if charset == "utf-8" and b.startswith(b"\xef\xbb\xbf"):
        b = b[3:]
    elif charset == "utf-16-le" and b.startswith(b"\xff\xfe"):
        b = b[2:]
    elif charset == "utf-16-be" and b.startswith(b"\xfe\xff"):
        b = b[2:]
    if charset == "windows-1252":
        # latin-1 is byte-transparent; remapping 0x80-0x9F through the
        # cp1252 table (holes keep their C1 control, per WHATWG) makes the
        # decode total without a python-level per-char loop
        return b.decode("latin-1").translate(_CP1252_HIGH), charset
    return b.decode(charset, errors="replace"), charset


def _cp1252_high() -> dict[int, str]:
    out = {}
    for i in range(0x80, 0xA0):
        try:
            out[i] = bytes([i]).decode("windows-1252")
        except UnicodeDecodeError:
            out[i] = chr(i)  # the five holes: C1 controls, WHATWG-style
    return out


_CP1252_HIGH = str.maketrans(_cp1252_high())
