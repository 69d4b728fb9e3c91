"""Streaming WEB-CRAWL ingestion: the WARC → HTML → text funnel
(``queries/webshards.py:tx_warc_extract`` / ``cur_warc_pipeline``) as a
continuous ingest loop — the web-text sibling of ``media_stream``.

WARC objects arrive continuously (a crawler drops ``.warc.gz`` files
into object storage); each micro-batch is extracted (gzip member split
→ WARC records → HTTP parse → charset decode → HTML text,
``operators/webtext.extract_warc_text_admitting``), gated on status +
length, deduplicated (a) against the persisted text-fingerprint index
(everything ever admitted) and (b) within itself, and admitted
documents land in the corpus sink while their fingerprints extend the
index — the NEXT batch sees them as history.  A corrupt object becomes
QUARANTINE rows (media_id + error class), never a stuck stream: at
crawl scale a truncated gzip member is a statistical certainty and a
streaming query restart-loops on a poison message forever.

Spark shapes (per micro-batch, via ``foreachBatch``):
- extraction: zero-shuffle Arrow ``mapInPandas`` over the payloads;
- vs-index: broadcast the batch's fingerprints against the index scan
  (at 100 TB the index is bucketed by ``fp`` so the scan prunes);
- within-batch: min media_id per fingerprint survives;
- the dedup exchange moves one fingerprint row per page — payload
  bytes never shuffle.

Delivery semantics are inherited verbatim from ``dedup_stream``:
``foreachBatch`` is at-least-once, every sink (corpus, index,
quarantine) is idempotent per ``batch_id`` (``_bid=<batch_id>``
partitions written with overwrite), and the index read keeps
STRICTLY-EARLIER partitions only, so a replay sees exactly the history
it saw the first time — exactly-once results on top of at-least-once
execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from .admission import (
    admission_stream,
    dedup_by_fingerprint,
    process_admission_batch,
)


def admit_warc_batch(
    batch: DataFrame,
    index_rows: DataFrame | None,
    min_chars: int = 1,
    max_chars: int = 1 << 20,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingestion step: extract → gates → dedup.  Returns
    ``(admitted_docs, their_fp_rows, quarantined)``.  Pure DataFrame
    logic (no side effects) so batch and streaming paths share it and
    tests can check it directly."""
    from ..operators.webtext import extract_warc_text_admitting

    rows = extract_warc_text_admitting(batch)
    quarantined = rows.filter(F.col("error").isNotNull()).select(
        "media_id", "error"
    )
    gated = (
        rows.filter(F.col("error").isNull())
        .filter(
            (F.col("status") == 200)
            & F.length("text").between(min_chars, max_chars)
        )
        .select(
            "media_id",
            "url",
            "content_language",
            "title",
            "text",
            F.length("text").alias("n_chars"),
            tx.char_poly_hash(F.col("text")).alias("fp"),
        )
    )
    # vs-index + within-batch dedup: the shared harness tail
    admitted = dedup_by_fingerprint(gated, index_rows, keys=("media_id",))
    return admitted, admitted.select("fp", "media_id"), quarantined


def process_warc_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    quarantine_dir: str,
    **gates,
) -> None:
    """The idempotent micro-batch step (public so retry semantics are
    directly testable): admit vs strictly-earlier index partitions +
    within batch, then overwrite this batch's ``_bid`` partitions in
    all three sinks.  Running it twice with the same ``batch_id``
    yields identical persisted state."""
    process_admission_batch(
        batch,
        batch_id,
        lambda b, idx: admit_warc_batch(b, idx, **gates),
        corpus_dir,
        index_dir,
        quarantine_dir,
    )


def warc_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    index_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    **gates,
):
    """Run the streaming web-crawl ingestion loop (``availableNow``
    drain) over a parquet directory of ``(media_id long, payload
    binary)`` rows.  Returns the StreamingQuery."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        process_warc_batch(
            batch, batch_id, corpus_dir, index_dir, quarantine_dir,
            **gates,
        )

    return admission_stream(
        spark, input_dir, _step, checkpoint_dir, max_files_per_trigger
    )
