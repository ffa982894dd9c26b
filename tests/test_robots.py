from __future__ import annotations

from spacetime_crawler_spark.functions.robots import parse_robots, robots_allowed


def test_parse_basic():
    delay, rules = parse_robots(
        b"User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 2\n"
    )
    assert delay == 2.0
    assert rules == [(False, "/private"), (True, "/private/ok")]


def test_only_star_group_honored():
    delay, rules = parse_robots(
        "User-agent: googlebot\nDisallow: /\n\nUser-agent: *\nDisallow: /x\n"
    )
    assert rules == [(False, "/x")]
    assert delay is None


def test_empty_disallow_matches_nothing():
    _, rules = parse_robots("User-agent: *\nDisallow:\n")
    assert rules == []
    assert robots_allowed("/anything", rules)


def test_longest_prefix_wins_and_tie_favors_allow():
    rules = [(False, "/a"), (True, "/a/b")]
    assert not robots_allowed("/a/x", rules)
    assert robots_allowed("/a/b/c", rules)
    assert robots_allowed("/a/x", [(False, "/a/x"), (True, "/a/x")])


def test_disallow_all_and_default():
    _, rules = parse_robots("User-agent: *\nDisallow: /\n")
    assert not robots_allowed("/", rules)
    assert not robots_allowed("/x", rules)
    assert robots_allowed("/x", [])  # no robots → allow
    assert robots_allowed("/x", None)


def test_comments_and_junk():
    delay, rules = parse_robots(
        "# header\nUser-agent: * # star\nDisallow: /p # comment\nnonsense line\n"
        "Crawl-delay: notanumber\n"
    )
    assert rules == [(False, "/p")]
    assert delay is None
