"""robots.txt semantics + delay law (SURVEY.md F2 / W4)."""

import pytest

from webcrawler_spark.functions.robots import (
    clamp_delay,
    parse_robots,
    robots_allowed,
)

BODY = """
# comment line
User-agent: googlebot
Disallow: /g/

User-agent: *
Disallow: /private/
Allow: /private/open/
Disallow: /*.json$
Crawl-delay: 2.5
"""


def test_group_selection_star_fallback():
    rules = parse_robots(BODY, agent="*")
    assert rules.crawl_delay == 2.5
    assert rules.allowed("/g/x")  # googlebot group not ours
    assert not rules.allowed("/private/x")


def test_longest_match_allow_wins():
    rules = parse_robots(BODY)
    assert not rules.allowed("/private/closed")
    assert rules.allowed("/private/open/doc")  # longer Allow wins


def test_wildcard_and_anchor():
    rules = parse_robots(BODY)
    assert not rules.allowed("/api/data.json")
    assert rules.allowed("/api/data.jsonl")  # $ anchor


def test_default_allow():
    assert parse_robots("").allowed("/anything")
    assert parse_robots(None).allowed("/x")


def test_robots_allowed_scalar():
    assert not robots_allowed("https://h.io/private/a", BODY)
    assert robots_allowed("https://h.io/ok", BODY)
    # unreachable robots ⇒ allow-all (Host.py:86-87)
    assert robots_allowed("https://h.io/private/a", None)
    assert robots_allowed("https://h.io/private/a", BODY, robots_ok=False)


@pytest.mark.parametrize(
    "delay,ok,expected",
    [
        (None, True, 0.1),  # no directive → floor (Host.py:104-105)
        (None, False, 0.1),  # robots unreachable → floor (Host.py:99-100)
        (5.0, True, 3.0),  # clamp ceiling (Host.py:111-112)
        (0.5, True, 0.5),  # verbatim
        (0.05, True, 0.05),  # BELOW 0.1 honored as-is (FIXTURES.md fast.example)
        (3.0, True, 3.0),
    ],
)
def test_delay_law(delay, ok, expected):
    assert clamp_delay(delay, ok) == expected
