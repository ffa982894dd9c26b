"""Pinned robots.txt parsing + matching (SURVEY.md §2 row F6).

The reference delegated robots enforcement to the course cache server
(server-side, UNVERIFIED/MED — SURVEY.md §2 F6); this engine must enforce it
itself, so the semantics are pinned here and shared by the Spark-side pandas
UDF and the single-node oracle:

- Only the ``User-agent: *`` group is honored (the synthetic world issues no
  per-UA groups).
- ``Allow``/``Disallow`` are prefix rules; the LONGEST matching prefix wins;
  on equal length Allow wins (Google/RFC 9309 discipline).
- An empty ``Disallow:`` value matches nothing (classic robots.txt meaning).
- ``Crawl-delay`` (seconds, float) is honored if present; else the caller's
  default (the reference's POLITENESS = 0.5 s).
"""

from __future__ import annotations

DEFAULT_CRAWL_DELAY = 0.5  # reference config.ini :: POLITENESS (UNVERIFIED/HIGH)


def parse_robots(body: bytes | str | None) -> tuple[float | None, list[tuple[bool, str]]]:
    """robots.txt body → (crawl_delay | None, [(allow, path_prefix), ...]).

    Rules are returned in file order for the ``User-agent: *`` group(s) only.
    """
    if body is None:
        return None, []
    if isinstance(body, (bytes, bytearray, memoryview)):
        body = bytes(body).decode("utf-8", errors="replace")
    crawl_delay: float | None = None
    rules: list[tuple[bool, str]] = []
    in_star_group = False
    group_has_rules = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if group_has_rules:
                # A new group starts after rules have been seen.
                in_star_group = value == "*"
                group_has_rules = False
            else:
                # Consecutive user-agent lines extend the same group.
                in_star_group = in_star_group or value == "*"
        elif field in ("allow", "disallow"):
            group_has_rules = True
            if in_star_group and value:
                rules.append((field == "allow", value))
        elif field == "crawl-delay":
            group_has_rules = True
            if in_star_group:
                try:
                    crawl_delay = float(value)
                except ValueError:
                    pass
    return crawl_delay, rules


def robots_allowed(path: str, rules: list[tuple[bool, str]] | None) -> bool:
    """Longest-prefix-match; ties favor Allow; no match → allowed."""
    if not rules:
        return True
    if not path:
        path = "/"
    best_len = -1
    best_allow = True
    for allow, prefix in rules:
        if path.startswith(prefix) and (
            len(prefix) > best_len or (len(prefix) == best_len and allow)
        ):
            best_len = len(prefix)
            best_allow = allow
    return best_allow
