"""Robots-matcher truth table over a corpus of gnarly real-world
robots.txt patterns (round-2 verdict ask #7).

The engine implements Google's published robots.txt semantics from
scratch (functions/robots.py); the reference evaluates
``reppy.Robots.allowed`` (WebAccesser.py:51-71, reppy==0.4.14, a
rep-cpp binding of the same Google draft). This file PINS the
matcher's verdict on every tricky pattern class — wildcards, end
anchors, longest-match ties, %-encoding, group selection, query
strings — so any behavior change is a loud diff.

Known divergences from reppy (documented, deliberate):

1. **%-encoding is not normalized.** Rules and paths are compared as
   raw octet strings: rule ``/a%20b`` matches only the literal path
   ``/a%20b``, never ``/a b`` (and vice versa). reppy/rep-cpp
   percent-normalizes both sides before matching, so a rule written
   with a raw space would match the encoded path there. In this
   engine, URL normalization upstream (urltools.normalize_url) keeps
   paths in their encoded form, so rules written in encoded form — the
   overwhelming convention — behave identically.
2. **Empty ``Allow:`` / ``Disallow:`` are no-ops.** Google spec:
   empty Disallow ⇒ nothing disallowed (a no-op rule). Some reppy
   versions record an empty-pattern rule that can win length ties.
   No-op is the spec reading; pinned here.
3. **Crawl-delay with junk values is ignored** (falls back to the
   0.1 s minimum) rather than raising — reference parity comes from
   the clamp law, pinned in test_robots.py.

These divergence classes affect only hand-crafted adversarial
robots.txt files; the FIXTURES.md corpus and the e2e crawls are
unaffected (verdicts identical under both matchers).
"""

from __future__ import annotations

import pytest

from webcrawler_spark.functions.robots import parse_robots, robots_allowed

# (case id, robots body, path, expected allowed)
CORPUS = [
    # -- wildcard patterns ------------------------------------------------
    ("star_ext_anchor", "User-agent: *\nDisallow: /*.pdf$", "/doc/a.pdf", False),
    ("star_ext_anchor_miss", "User-agent: *\nDisallow: /*.pdf$", "/doc/a.pdfx", True),
    ("star_mid", "User-agent: *\nDisallow: /private*/data", "/privateX/data", False),
    ("star_mid_miss", "User-agent: *\nDisallow: /private*/data", "/private", True),
    ("double_star", "User-agent: *\nDisallow: /a*b*c", "/a-x-b-y-c", False),
    ("leading_star", "User-agent: *\nDisallow: *.gif$", "/img/x.gif", False),
    # -- end anchors ------------------------------------------------------
    ("anchor_exact", "User-agent: *\nDisallow: /a$", "/a", False),
    ("anchor_longer", "User-agent: *\nDisallow: /a$", "/ab", True),
    ("dollar_mid_literal", "User-agent: *\nDisallow: /a$b", "/a$b", False),
    ("dollar_mid_literal_miss", "User-agent: *\nDisallow: /a$b", "/aXb", True),
    # -- longest-match / tie-breaks --------------------------------------
    (
        "allow_deeper_wins",
        "User-agent: *\nDisallow: /folder\nAllow: /folder/page",
        "/folder/page",
        True,
    ),
    (
        "disallow_deeper_wins",
        "User-agent: *\nAllow: /folder\nDisallow: /folder/secret",
        "/folder/secret",
        False,
    ),
    ("tie_allow_wins", "User-agent: *\nDisallow: /p\nAllow: /p", "/p", True),
    (
        "tie_same_len_allow",
        # '/ab' and '/a*' are both length-3 patterns: a length tie
        "User-agent: *\nDisallow: /ab\nAllow: /a*",
        "/ab",
        True,
    ),
    ("root_disallow", "User-agent: *\nDisallow: /", "/anything", False),
    ("default_allow", "User-agent: *\nDisallow: /x", "/y", True),
    # -- empty rules (divergence #2: no-ops) ------------------------------
    ("empty_disallow", "User-agent: *\nDisallow:", "/any", True),
    (
        "empty_disallow_with_real",
        "User-agent: *\nDisallow:\nDisallow: /x",
        "/x",
        False,
    ),
    # -- %-encoding (divergence #1: raw-octet comparison) -----------------
    ("pct_rule_pct_path", "User-agent: *\nDisallow: /a%20b", "/a%20b", False),
    ("pct_rule_raw_path", "User-agent: *\nDisallow: /a%20b", "/a b", True),
    ("raw_rule_pct_path", "User-agent: *\nDisallow: /a b", "/a%20b", True),
    # -- query strings ----------------------------------------------------
    (
        "query_pattern",
        "User-agent: *\nDisallow: /*?sessionid=",
        "/page?sessionid=42",
        False,
    ),
    ("query_clean", "User-agent: *\nDisallow: /*?sessionid=", "/page?id=42", True),
    # -- group selection --------------------------------------------------
    (
        "specific_beats_star",
        "User-agent: *\nDisallow: /\nUser-agent: mybot\nAllow: /",
        "/x",
        True,  # evaluated for agent 'mybot' below
    ),
    (
        "stacked_agents",
        "User-agent: a\nUser-agent: b\nDisallow: /x",
        "/x",
        False,  # agent 'b' shares the group
    ),
    (
        "star_fallback",
        "User-agent: otherbot\nDisallow: /\nUser-agent: *\nDisallow: /x",
        "/y",
        True,  # '*' group applies to unknown agents; /y not in it
    ),
    # -- parsing robustness ----------------------------------------------
    ("comments", "User-agent: *\n# note\nDisallow: /x # trailing", "/x", False),
    ("directive_before_agent", "Disallow: /x\nUser-agent: *\nAllow: /", "/x", True),
    ("case_insensitive_keys", "USER-AGENT: *\nDISALLOW: /x", "/x", False),
    ("case_sensitive_paths", "User-agent: *\nDisallow: /X", "/x", True),
    ("blank_lines", "User-agent: *\n\n\nDisallow: /x", "/x", False),
]


@pytest.mark.parametrize(
    "case_id,body,path,expected", CORPUS, ids=[c[0] for c in CORPUS]
)
def test_corpus_verdict(case_id, body, path, expected):
    agent = "mybot" if case_id == "specific_beats_star" else "b" if case_id == "stacked_agents" else "*"
    rules = parse_robots(body, agent)
    assert rules.allowed(path) is expected, case_id


def test_full_url_path_extraction():
    """robots_allowed matches on path+query after the authority."""
    body = "User-agent: *\nDisallow: /secret"
    assert robots_allowed("https://h.example/secret/x", body) is False
    assert robots_allowed("https://h.example/open", body) is True
    assert robots_allowed("https://h.example", body) is True  # bare root


def test_crawl_delay_junk_ignored():
    rules = parse_robots("User-agent: *\nCrawl-delay: soon\nDisallow: /x")
    assert rules.crawl_delay is None
    rules = parse_robots("User-agent: *\nCrawl-delay: 2.5")
    assert rules.crawl_delay == 2.5
