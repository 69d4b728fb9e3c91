"""robots.txt parser + matcher (pure Python, from the public REP —
RFC 9309 plus the de-facto ``*``/``$`` wildcard and ``Crawl-delay``
extensions) — the politeness gate of a web-crawl ingestion pipeline.

``parse_robots`` groups ``User-agent`` lines (consecutive agent lines
share one group) with their ``Allow``/``Disallow`` rules and optional
``Crawl-delay``; ``Sitemap`` lines are global.  Unknown directives and
comments are skipped; byte-order marks and case-insensitive directive
names handled.  ``is_allowed`` implements the standard evaluation:
pick the most-specific matching group (longest agent substring match,
``*`` as fallback), then the longest-match rule wins with Allow
winning exact ties; no matching rule ⇒ allowed.  Patterns support
``*`` (any run) and a terminal ``$`` anchor.

Parsing never raises on text content (robots.txt in the wild is
messy by spec); only non-UTF-8 input raises ValueError.

Reference comparison: the reference pipeline ingests only netCDF
scenes (``asip_v2/archive.py``); §2.11 web-crawl surface.
"""

from __future__ import annotations


def parse_robots(data: bytes | str) -> dict:
    """Returns ``{"groups": [{"agents": [...], "rules":
    [(kind, pattern), ...], "crawl_delay": float | None}],
    "sitemaps": [...]}``."""
    if isinstance(data, (bytes, bytearray)):
        try:
            data = bytes(data).decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"robots: invalid UTF-8: {e}") from None
    if data.startswith("﻿"):
        data = data[1:]
    groups: list[dict] = []
    sitemaps: list[str] = []
    cur: dict | None = None
    agents_open = False  # consecutive User-agent lines share a group
    for raw in data.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
                agents_open = True
            cur["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            agents_open = False
            if cur is None:  # rules before any user-agent: ignored
                continue
            if value == "" and field == "disallow":
                continue  # empty Disallow = allow all (no rule)
            cur["rules"].append((field, value))
        elif field == "crawl-delay":
            agents_open = False
            if cur is not None:
                try:
                    cur["crawl_delay"] = float(value)
                except ValueError:
                    pass
        elif field == "sitemap":
            if value:
                sitemaps.append(value)
            agents_open = False
        else:
            agents_open = False
    return {"groups": groups, "sitemaps": sitemaps}


def _pattern_matches(pattern: str, path: str) -> int:
    """Longest-match length if ``pattern`` matches a prefix of
    ``path`` (with ``*`` / terminal ``$``), else -1.  Specificity is
    the pattern length, per the de-facto rule."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    parts = core.split("*")
    pos = 0
    for i, part in enumerate(parts):
        if i == 0:
            if not path.startswith(part):
                return -1
            pos = len(part)
        else:
            at = path.find(part, pos)
            if at < 0:
                return -1
            pos = at + len(part)
    if anchored:
        if parts[-1] == "":  # a trailing '*' absorbs the remainder
            pos = len(path)
        if pos != len(path):
            return -1
    return len(pattern)


def _group_for(groups: list[dict], agent: str) -> dict | None:
    agent = agent.lower()
    best = None
    best_len = -1
    star = None
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                if star is None:
                    star = g
            elif a and a in agent and len(a) > best_len:
                best, best_len = g, len(a)
    return best if best is not None else star


def is_allowed(parsed: dict, agent: str, path: str) -> bool:
    """RFC 9309 evaluation: longest-match rule in the most-specific
    matching group; Allow wins ties; no rule ⇒ allowed."""
    g = _group_for(parsed["groups"], agent)
    if g is None:
        return True
    best_len = -1
    best_kind = "allow"
    for kind, pattern in g["rules"]:
        m = _pattern_matches(pattern, path)
        if m < 0:
            continue
        if m > best_len or (m == best_len and kind == "allow"):
            best_len, best_kind = m, kind
    return best_kind == "allow"


def crawl_delay(parsed: dict, agent: str) -> float | None:
    g = _group_for(parsed["groups"], agent)
    return g["crawl_delay"] if g else None
