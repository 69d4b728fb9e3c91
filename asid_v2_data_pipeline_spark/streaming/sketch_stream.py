"""Continuously-maintained Count-Min Sketch over a stream.

A CMS is an ADDITIVE aggregate over a bounded (depth×width) key space,
so streaming maintenance is exactly the rollup discipline: each
micro-batch is sketched (one bounded groupBy) and the delta folds into
the persisted sketch table through ``merge_aggregate`` — touched-bucket
IO only, batch-id stamped, so foreachBatch replays are no-ops and the
table state is exactly-once.  Query the live sketch any time with
``read_aggregate`` + ``operators.sketches.cms_estimate``: heavy-hitter
frequencies over an unbounded stream in O(depth·width) state, no raw
event retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketches import cms_build
from .rollup import maintain_rollup


def maintain_cms(
    events: DataFrame,
    target_dir: str,
    hash_col: str,
    checkpoint_dir: str,
    width: int = 1024,
    depth: int = 4,
    n_buckets: int = 16,
    trigger_once: bool = True,
):
    """Start (and return) the sketch-maintenance query over a streaming
    DataFrame carrying ``hash_col`` (one row per item occurrence)."""
    return maintain_rollup(
        events,
        target_dir,
        lambda b: cms_build(b, hash_col, width, depth),
        key_cols=["_d", "_bucket"],
        sum_cols=["cnt"],
        checkpoint_dir=checkpoint_dir,
        n_buckets=n_buckets,
        trigger_once=trigger_once,
    )
