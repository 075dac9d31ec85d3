"""robots.txt parsing + politeness law (SURVEY.md §2.3 F2, §2.6 W4).

The reference consults robots via ``reppy`` (Host.py:83-93: agent '*';
Host.py:95-114: Crawl-delay clamp). reppy implements Google's
robots.txt semantics: rule groups per user-agent, longest-path-match
wins, Allow wins ties, ``*`` wildcard and ``$`` end-anchor supported.
This module is a from-scratch pure-Python implementation of those
public semantics (no reppy available, none needed).

Delay law (Host.py:96-114, pinned by FIXTURES.md host `fast.example`):
    robots unreachable        → 0.1 s
    no Crawl-delay directive  → 0.1 s
    Crawl-delay > 3           → 3.0 s
    otherwise                 → verbatim (0.05 stays 0.05!)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BooleanType, StringType

MIN_DELAY_SECONDS = 0.1  # Host.py:96
MAX_DELAY_SECONDS = 3.0  # Host.py:97


@dataclass
class RobotsRules:
    """Parsed rules for one user-agent group."""

    # list of (is_allow, original_pattern, compiled_regex)
    rules: list[tuple[bool, str, re.Pattern]] = field(default_factory=list)
    crawl_delay: float | None = None

    def allowed(self, path: str) -> bool:
        """Longest-match wins; Allow wins length ties; default allow."""
        best_len = -1
        best_allow = True
        for is_allow, pattern, rx in self.rules:
            if rx.match(path):
                plen = len(pattern)
                if plen > best_len or (plen == best_len and is_allow and not best_allow):
                    best_len = plen
                    best_allow = is_allow
        return best_allow


def _compile_rule(pattern: str) -> re.Pattern:
    """Translate a robots path pattern ('*' wildcard, '$' anchor)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = ".*".join(parts)
    if anchored:
        rx += "$"
    return re.compile(rx)


def parse_robots(body: str | None, agent: str = "*") -> RobotsRules:
    """Parse a robots.txt body for one agent ('*' per Host.py:9).

    Group selection: the group whose user-agent token is the longest
    prefix of `agent` wins; '*' is the fallback group (Google spec).
    """
    rules = RobotsRules()
    if body is None:
        return rules

    groups: list[tuple[list[str], RobotsRules]] = []
    cur_agents: list[str] = []
    cur: RobotsRules | None = None
    last_was_agent = False

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur = RobotsRules()
                cur_agents = []
                groups.append((cur_agents, cur))
            cur_agents.append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:  # directives before any user-agent line: ignore
            continue
        if key in ("allow", "disallow"):
            if val == "":
                # empty Disallow ⇒ allow-all marker (match nothing);
                # empty Allow is meaningless — both are no-ops here
                continue
            cur.rules.append((key == "allow", val, _compile_rule(val)))
        elif key == "crawl-delay":
            try:
                cur.crawl_delay = float(val)
            except ValueError:
                pass

    agent_l = agent.lower()
    best: RobotsRules | None = None
    best_len = -1
    fallback: RobotsRules | None = None
    for agents, grp in groups:
        for a in agents:
            if a == "*":
                if fallback is None:
                    fallback = grp
            elif agent_l.startswith(a) and len(a) > best_len:
                best = grp
                best_len = len(a)
    return best if best is not None else (fallback if fallback is not None else rules)


def clamp_delay(crawl_delay: float | None, robots_ok: bool) -> float:
    """The W4 delay law (Host.py:96-114)."""
    if not robots_ok or crawl_delay is None:
        return MIN_DELAY_SECONDS
    if crawl_delay > MAX_DELAY_SECONDS:
        return MAX_DELAY_SECONDS
    return crawl_delay


def robots_allowed(url: str, body: str | None, robots_ok: bool = True) -> bool:
    """F2 scalar: Host.py:83-93 — unreachable/missing robots ⇒ allow."""
    if not robots_ok or body is None:
        return True
    # match on everything after the authority (path+query), Google-style
    parts = url.split("/")
    path = "/" + "/".join(parts[3:]) if len(parts) > 3 else "/"
    return parse_robots(body).allowed(path)


@pandas_udf(BooleanType())
def robots_allowed_udf(urls: pd.Series, bodies: pd.Series) -> pd.Series:
    """F2 vectorized: evaluate each url against its host's robots body.

    The body arrives via the broadcast host_policy join (J2); parsing is
    memoized per distinct body within the Arrow batch, so the per-row
    cost is one regex scan, not one parse.
    """
    cache: dict[str, RobotsRules] = {}

    def one(url: str, body: str | None) -> bool:
        if body is None:
            return True
        rules = cache.get(body)
        if rules is None:
            rules = cache[body] = parse_robots(body)
        parts = url.split("/")
        path = "/" + "/".join(parts[3:]) if len(parts) > 3 else "/"
        return rules.allowed(path)

    return pd.Series([one(u, b) for u, b in zip(urls, bodies)])
