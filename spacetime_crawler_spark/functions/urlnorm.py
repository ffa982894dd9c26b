"""URL canonicalization + validity predicate (SURVEY.md §2 rows F1/F2).

Reference behavior being re-expressed (reference repo family, UNVERIFIED —
see SURVEY.md §0): ``utils/__init__.py :: normalize`` (strip trailing slash
before hashing) and ``scraper.py :: is_valid`` (scheme whitelist + extension
blacklist regex).  Our canonical form is a superset of the reference's
``normalize``: it also lowercases scheme/host, strips fragments and default
ports, removes dot-segments and collapses duplicate slashes, so that every
noise variant of a page in the synthetic world maps to one canonical URL.

These are PURE functions: the engine wraps them in Arrow-batched pandas UDFs
(operators/udfs.py); the single-node oracle (tests/reference_impl.py) calls
them directly.  No per-row Python ever runs inside a Spark task except via
the vectorized wrappers (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

# Extension blacklist — the exact set from the reference's scraper.py::is_valid
# (SURVEY.md §2 F1), applied to the lowercased path.
BLACKLIST_EXTENSIONS = (
    r"css|js|bmp|gif|jpe?g|ico|png|tiff?|mid|mp2|mp3|mp4"
    r"|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf"
    r"|ps|eps|tex|ppt|pptx|doc|docx|xls|xlsx|names"
    r"|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso"
    r"|epub|dll|cnf|tgz|sha1|thmx|mso|arff|rtf|jar|csv"
    r"|rm|smil|wmv|swf|wma|zip|rar|gz"
)
_BLACKLIST_RE = re.compile(r".*\.(" + BLACKLIST_EXTENSIONS + r")$")

# Same regex in Spark-SQL RLIKE form, so F1 can stay a native (pushable)
# column expression — kept in one place so the UDF-free predicate and this
# pure function can never drift apart.
BLACKLIST_RLIKE = r"\.(" + BLACKLIST_EXTENSIONS + r")$"

_ALLOWED_SCHEMES = ("http", "https")
_DEFAULT_PORTS = {"http": "80", "https": "443"}
_MULTI_SLASH_RE = re.compile(r"/{2,}")


def _normalize_netloc(scheme: str, netloc: str) -> str:
    """Lowercase host; strip the scheme's default port; keep userinfo as-is."""
    userinfo, sep, hostport = netloc.rpartition("@")
    host, colon, port = hostport.partition(":")
    host = host.lower()
    if colon and (port == _DEFAULT_PORTS.get(scheme) or port == ""):
        hostport = host
    elif colon:
        hostport = f"{host}:{port}"
    else:
        hostport = host
    return f"{userinfo}{sep}{hostport}" if sep else hostport


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal (pure, allocation-light)."""
    if "." not in path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
        else:
            output.append(seg)
    out = "/".join(output)
    if path.startswith("/") and not out.startswith("/"):
        out = "/" + out
    if path.endswith(("/.", "/..")) and not out.endswith("/"):
        out += "/"
    return out


def canonicalize_url(url: str) -> str:
    """Canonical form used for hashing / dedup / the seen-set.

    Rules (SURVEY.md §1.2 / §2 F2): lowercase scheme + host, strip
    ``#fragment``, strip default port, remove dot-segments, collapse
    duplicate slashes in the path, strip the trailing ``/`` (the reference's
    ``normalize``).  Query string is preserved verbatim.  Non-http(s) or
    unparseable inputs are returned stripped-but-unmapped (is_valid rejects
    them downstream).
    """
    if url is None:
        return ""
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    if scheme not in _ALLOWED_SCHEMES:
        # Still defragment so the seen-set key is stable for rejects.
        return url.split("#", 1)[0]
    netloc = _normalize_netloc(scheme, parts.netloc)
    path = _MULTI_SLASH_RE.sub("/", _remove_dot_segments(parts.path))
    path = path.rstrip("/")
    out = f"{scheme}://{netloc}{path}"
    if parts.query:
        out += f"?{parts.query}"
    return out


def resolve_and_canonicalize(base_url: str, href: str) -> str:
    """Resolve a (possibly relative) href against its page URL, then
    canonicalize — the F8→F2 composition applied to every extracted link."""
    try:
        absolute = urljoin(base_url, href)
    except ValueError:
        absolute = href
    return canonicalize_url(absolute)


def get_host(url: str) -> str:
    """Lowercased host (no port) — the politeness/partitioning key."""
    try:
        host = urlsplit(url).hostname
    except ValueError:
        return ""
    return host or ""


def is_valid(url: str, allowed_host_suffixes: tuple[str, ...] | None = None) -> bool:
    """Crawlability predicate (reference scraper.py::is_valid semantics):
    scheme ∈ {http, https}, lowercased path does not end in a blacklisted
    extension, and (optionally) host ends with one of the allowed suffixes
    (the course config restricted to ``*.ics.uci.edu``-style domains)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return False
    if parts.scheme.lower() not in _ALLOWED_SCHEMES:
        return False
    if not parts.netloc:
        return False
    if _BLACKLIST_RE.match(parts.path.lower()):
        return False
    if allowed_host_suffixes:
        host = (parts.hostname or "").lower()
        if not any(host == s or host.endswith("." + s) for s in allowed_host_suffixes):
            return False
    return True
