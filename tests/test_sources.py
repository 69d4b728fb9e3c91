"""Source/sink coverage: S2 listing, S4 ledger commit cycle, S8
reconstruction sink, S9 JSON ledger compatibility."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.sources.ledger import (
    commit,
    list_files,
    read_json_ledger,
    read_ledger,
    unprocessed,
    write_reconstruction,
)


def test_list_files_glob(spark, tmp_path):
    for n in ("a.nc", "b.nc", "c.txt"):
        (tmp_path / n).write_bytes(b"x")
    names = sorted(r["name"] for r in list_files(spark, str(tmp_path)).collect())
    assert names == ["a.nc", "b.nc"]


def test_ledger_commit_cycle(spark, tmp_path):
    led_path = str(tmp_path / "ledger")
    files = spark.createDataFrame([("a.nc",), ("b.nc",), ("c.nc",)], "name string")

    led = read_ledger(spark, led_path)  # absent -> empty
    todo = unprocessed(files, led)
    assert todo.count() == 3

    commit(todo.limit(2), led_path)
    led2 = read_ledger(spark, led_path)
    todo2 = unprocessed(files, led2)
    assert todo2.count() == 1


def test_json_ledger_compat(spark, tmp_path):
    """The reference's processed_files.json is a bare JSON array
    (archive.py:202-203)."""
    p = tmp_path / "processed_files.json"
    p.write_text(json.dumps(["a.nc", "b.nc"]))
    got = sorted(r["name"] for r in read_json_ledger(spark, str(p)).collect())
    assert got == ["a.nc", "b.nc"]


def test_reconstruction_sink(spark, tmp_path):
    rows = [("s1", 0, 0, 1.0), ("s1", 0, 1, 2.0), ("s2", 0, 0, 3.0)]
    df = spark.createDataFrame(rows, "scene string, line int, sample int, value double")
    out = str(tmp_path / "recon")
    write_reconstruction(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert back.filter(F.col("scene") == "s1").count() == 2


def test_sitemap_extraction_strictness(spark):
    """Sitemap urlset parsing: entity unescape, typed priority, loud
    failure on a loc-less url or a non-urlset root."""
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        extract_sitemap_urls,
    )

    good = (
        b'<?xml version="1.0"?><urlset xmlns="ns">'
        b"<url><loc>https://x/a?b=1&amp;c=2</loc>"
        b"<lastmod>2026-01-02</lastmod><changefreq>daily</changefreq>"
        b"<priority>0.7</priority></url>"
        b"<url><loc>https://x/b</loc></url></urlset>"
    )
    rows = extract_sitemap_urls(
        spark.createDataFrame(
            [(1, good)], "media_id long, payload binary"
        )
    ).collect()
    assert [(r.uno, r.loc, r.lastmod, r.changefreq, r.priority) for r in rows] == [
        (0, "https://x/a?b=1&c=2", "2026-01-02", "daily", 0.7),
        (1, "https://x/b", None, None, None),
    ]
    import pytest as _pytest

    for bad in (
        b"<urlset><url></url></urlset>",  # url without loc
        b"<sitemapindex></sitemapindex>",  # wrong root
        b"not xml at all",
    ):
        df = extract_sitemap_urls(
            spark.createDataFrame(
                [(1, bad)], "media_id long, payload binary"
            )
        )
        with _pytest.raises(Exception):
            df.collect()
