"""robots.txt: RFC 9309 evaluation semantics (group selection,
longest-match, Allow tie-wins, wildcards/anchors, empty Disallow),
messy-input tolerance, and the never-raises-on-text contract."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.robots import (
    crawl_delay,
    is_allowed,
    parse_robots,
)

_SAMPLE = b"""# comment line
User-agent: googlebot
User-agent: bingbot
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2.5

User-agent: *
Disallow: /*.json$
Disallow: /tmp
Allow: /tmp/shared

Sitemap: https://x.org/sm.xml
Sitemap: https://x.org/sm2.xml
"""


def test_grouping_and_sitemaps():
    r = parse_robots(_SAMPLE)
    assert len(r["groups"]) == 2
    assert r["groups"][0]["agents"] == ["googlebot", "bingbot"]
    assert r["sitemaps"] == ["https://x.org/sm.xml", "https://x.org/sm2.xml"]
    assert crawl_delay(r, "BingBot/2.0") == 2.5
    assert crawl_delay(r, "other") is None


def test_evaluation_semantics():
    r = parse_robots(_SAMPLE)
    # specific group beats *
    assert not is_allowed(r, "googlebot", "/private/a")
    assert is_allowed(r, "googlebot", "/private/ok/b")  # longest match
    assert is_allowed(r, "googlebot", "/tmp/x")  # * rules don't apply
    # * group: wildcard + anchor
    assert not is_allowed(r, "other", "/data/f.json")
    assert is_allowed(r, "other", "/data/f.json5")
    assert not is_allowed(r, "other", "/tmp/private")
    assert is_allowed(r, "other", "/tmp/shared/x")  # allow longest-match
    assert is_allowed(r, "other", "/")  # no rule -> allowed


def test_allow_wins_exact_ties():
    r = parse_robots(b"User-agent: *\nDisallow: /p\nAllow: /p\n")
    assert is_allowed(r, "x", "/p/a")


def test_empty_disallow_and_no_groups():
    r = parse_robots(b"User-agent: *\nDisallow:\n")
    assert is_allowed(r, "x", "/anything")
    r2 = parse_robots(b"")
    assert is_allowed(r2, "x", "/anything")


def test_messy_input_tolerated():
    r = parse_robots(
        "﻿USER-AGENT: Foo\r\nDISALLOW: /a # trailing comment\r\n"
        "garbage line without colon is skipped? no - has none\n"
        "Unknown-directive: whatever\n".encode()
    )
    assert not is_allowed(r, "foo", "/a/b")
    with pytest.raises(ValueError):
        parse_robots(b"\xff\xfe\x00bad")


def test_never_raises_fuzz():
    rng = np.random.default_rng(83)
    base = bytearray(_SAMPLE)
    for _ in range(300):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 5))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] = int(rng.integers(32, 127))
        r = parse_robots(bytes(mutated))
        is_allowed(r, "anybot", "/x/y")
        crawl_delay(r, "anybot")
