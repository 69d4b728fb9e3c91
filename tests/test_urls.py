"""URL canonicalization (§2.11 crawl-frontier dedup) — edge cases of
the native-expression ladder, incl. the disclosed non-goals."""

from __future__ import annotations

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.functions.urls import canonical_url


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"]
        for r in df.select(
            canonical_url(F.col("url")).alias("c")
        ).collect()
    ]


def test_canonical_url_ladder(spark):
    cases = {
        # scheme/host case, default port, fragment, query sort
        "HTTP://WWW.Ex.COM:80/a/b?z=1&a=2#frag":
            "http://www.ex.com/a/b?a=2&z=1",
        "https://Host.org:443/p": "https://host.org/p",
        # non-default ports survive
        "http://h.io:8080/x": "http://h.io:8080/x",
        "https://h.io:80/x": "https://h.io:80/x",
        # empty path -> "/"
        "http://h.io": "http://h.io/",
        "http://h.io?a=1": "http://h.io/?a=1",
        # path case is PRESERVED (paths are case-sensitive by spec)
        "http://h.io/CaseSensitive/Path": "http://h.io/CaseSensitive/Path",
        # query-less, fragment-only
        "http://h.io/p#x": "http://h.io/p",
        # other schemes keep their port
        "ftp://H.io:80/f": "ftp://h.io:80/f",
        # single param, already canonical
        "http://h.io/p?k=v": "http://h.io/p?k=v",
        # empty query after '?' stays empty (no param to sort)
        "http://h.io/p?": "http://h.io/p",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_canonical_url_merges_variants(spark):
    variants = [
        "HTTP://WWW.Site3.COM:80/src/9?b=55&a=en#frag",
        "http://www.site3.com/src/9?a=en&b=55",
        "http://www.site3.com:80/src/9/../9?a=en&b=55",  # dot segments
    ]
    got = _canon(spark, variants)
    # the first two merge; dot-segment resolution is a disclosed
    # non-goal, so the third stays distinct (under-merge, never corrupt)
    assert got[0] == got[1] == "http://www.site3.com/src/9?a=en&b=55"
    assert got[2] != got[0]
