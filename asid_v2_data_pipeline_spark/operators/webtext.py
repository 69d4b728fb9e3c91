"""Web-crawl text extraction operators (SURVEY.md §2.11).

The ingestion front of an LLM training-data pipeline: WARC payloads
(one ``binary`` column cell = one ``.warc.gz`` object, the Common Crawl
layout) are split into records, HTTP responses parsed, bodies decoded
per their declared charset/content-coding, and HTML reduced to title +
content text — after which the existing text operators (quality rules,
dedup families, decontamination, curation) apply unchanged.

Execution shape: a zero-shuffle Arrow ``mapInPandas`` kernel over the
payload column — per-payload work is independent, so the operator
scales linearly with executors and the only exchange is whatever
partitioning the caller already has (the media fixture path byte-bounds
its Arrow batches upstream, ``queries/_shared.py:_bounded_media_read``).

Fail-fast by default; ``extract_warc_text_admitting`` is the
quarantining production twin (SCALE.md round 10): one corrupt object
becomes reject ROWS, never a failed 100 TB pass.

The reference pipeline has no web surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_TEXT_SCHEMA = (
    "media_id long, url string, status int, content_language string, "
    "title string, text string, n_records int"
)

WARC_TEXT_ADMITTING_SCHEMA = WARC_TEXT_SCHEMA + ", error string"


def _payload_rows(
    media_id: int, payload: bytes, drop_boilerplate: bool
) -> list[tuple]:
    from ..functions.html import html_to_text
    from ..functions.warc import (
        decode_body,
        iter_warc_records,
        parse_http_response,
    )

    records = iter_warc_records(bytes(payload))
    n = len(records)
    rows = []
    for headers, block in records:
        if headers.get("warc-type") != "response":
            continue
        status, hh, body = parse_http_response(block)
        title, text = html_to_text(
            decode_body(hh, body), drop_boilerplate=drop_boilerplate
        )
        rows.append(
            (
                media_id,
                headers.get("warc-target-uri"),
                status,
                hh.get("content-language"),
                title,
                text,
                n,
            )
        )
    return rows


def extract_warc_text(
    media: DataFrame, drop_boilerplate: bool = True
) -> DataFrame:
    """WARC payloads → one row per HTTP *response* record:
    ``(media_id, url, status, content_language, title, text,
    n_records)``.  warcinfo/request/metadata records are counted but
    yield no rows.  Fail-fast: a malformed payload raises (use the
    admitting twin for crawl-scale corpora)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rows.extend(
                    _payload_rows(int(mid), payload, drop_boilerplate)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "url",
                    "status",
                    "content_language",
                    "title",
                    "text",
                    "n_records",
                ],
            )

    return media.mapInPandas(kernel, WARC_TEXT_SCHEMA)


WARC_LINK_SCHEMA = "media_id long, url string, link string"


def extract_warc_links(media: DataFrame) -> DataFrame:
    """WARC payloads → one row per out-link of every response page
    (``functions/html.extract_links`` — the crawl-frontier view: nav/
    footer links count).  This is the edge-extraction stage of a
    link-graph build: compose with ``operators/graph.pagerank`` for
    the document-quality prior of web-corpus curation.  Zero-shuffle
    Arrow kernel, one row per (page, link)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.html import extract_links
        from ..functions.warc import (
            decode_body,
            iter_warc_records,
            parse_http_response,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for headers, block in iter_warc_records(bytes(payload)):
                    if headers.get("warc-type") != "response":
                        continue
                    _status, hh, body = parse_http_response(block)
                    for link in extract_links(decode_body(hh, body)):
                        rows.append(
                            (int(mid), headers.get("warc-target-uri"), link)
                        )
            yield pd.DataFrame(
                rows, columns=["media_id", "url", "link"]
            )

    return media.mapInPandas(kernel, WARC_LINK_SCHEMA)


def extract_warc_text_admitting(
    media: DataFrame, drop_boilerplate: bool = True
) -> DataFrame:
    """Quarantining twin: a payload whose parse raises ``ValueError``
    (or ``NotImplementedError`` — disclosed format boundaries) becomes
    ONE reject row ``(media_id, nulls…, error=<exception class>)``;
    admitted payloads carry ``error`` NULL.  The error is classed, not
    free-text, so downstream ledgers can aggregate reject reasons."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                mid = int(mid)
                try:
                    good = _payload_rows(mid, payload, drop_boilerplate)
                except (ValueError, NotImplementedError) as e:
                    rows.append(
                        (mid, None, None, None, None, None, None,
                         type(e).__name__)
                    )
                    continue
                rows.extend([g + (None,) for g in good])
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "url",
                    "status",
                    "content_language",
                    "title",
                    "text",
                    "n_records",
                    "error",
                ],
            )

    return media.mapInPandas(kernel, WARC_TEXT_ADMITTING_SCHEMA)
