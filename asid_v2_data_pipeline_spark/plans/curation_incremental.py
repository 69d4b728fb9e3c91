"""Incremental end-to-end curation: admit new document batches against
persisted corpus state (the production twin of ``plans/curation.py``).

A 100 TB corpus is not re-curated per ingest; a new batch is admitted
against what history already decided:

    quality filter
      → exact dedup vs stored fingerprints (and within the batch)
      → MinHash-LSH near-dup vs the persisted signature index (and
        within the batch)
      → benchmark decontamination
      → append to corpus state

State layout under ``state_dir`` (all parquet, one ``_bid=<batch_id>``
partition per admitted batch — the same idempotent-sink discipline as
``streaming/dedup_stream.py``):

- ``seen/``   — ``(doc_id, _fp)`` of every exact-UNIQUE quality-passing
  document ever seen (including near-dup losers and contaminated docs);
- ``index/``  — ``(_id, _band, _bucket)`` LSH band rows of those same
  documents;
- ``corpus/`` — the fully admitted (clean) documents;
- ``meta/``   — one ``max_id`` row per batch, used to warn when a batch
  arrives out of ascending-id order (see ``validate_order``).

``seen``/``index`` deliberately cover more than ``corpus``: the lazy
``curate`` drops a document that collides with ANY earlier exact-unique
document, admitted or not (its loser set is computed over ``uniq``,
before decontam/quota) — indexing only admitted docs would let a
near-dup of a dropped near-dup slip in, diverging from the batch plan.

Equivalence contract (pinned in tests/test_curation_incremental.py):
with batches arriving in ascending-id order — so first-arrival and
min-id agree, the same tie the lazy plan breaks by id —
``curated_view`` over the accumulated state equals ``curate`` on the
union of all batches, row for row, epochs included.  Per-source quota
and the language mixture are applied by the VIEW over the accumulated
corpus, not at admission: greedy per-batch quota would be
arrival-order-biased (an early mediocre doc beats a later better-hashed
one, unlike the batch plan's global seeded rank), and retraction-free
streaming quota cannot be made equivalent.  The view's window costs are
bounded by the admitted corpus — already a fraction of raw — and its
seeded-hash ranks are stable as batches accumulate.

Retry idempotency: every write overwrites its own ``_bid`` partition
and every state read keeps only partitions with ``_bid`` STRICTLY
BELOW the current batch's id — a replayed batch sees exactly the
history it saw originally, even if later batches have landed since, so
a crashed-then-retried ``admit_increment`` (foreachBatch is
at-least-once) converges to the identical persisted state.  Batch ids
must be monotone in arrival order (the structured-streaming contract).

Scale shapes: history is never shuffled — the fingerprint probe
broadcasts the batch's fingerprints against a column-pruned scan of
``seen``; the index probe is ``dedup.index_candidates`` (batch side
broadcast); only the small batch ever shuffles (its intra-batch LSH
groupBy).
"""

from __future__ import annotations

import warnings

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators.decontam import contamination
from ..operators.dedup import (
    exact_dedup,
    index_candidates,
    minhash_band_rows,
    minhash_lsh_pairs,
)
from ..operators.sampling import quota_per_group, weighted_repeat


def _read_state(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        spark.catalog.refreshByPath(path)
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def admit_increment(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    decontam_n: int = 8,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    return_stats: bool = True,
    validate_order: bool = True,
    clf_weights: list[float] | None = None,
    clf_bias: float = 0.0,
    clf_min: float = 0.5,
) -> dict:
    """Admit one batch against the persisted state; returns admission
    stats (``return_stats=False`` skips the three counting jobs —
    streaming callers that discard them shouldn't pay a re-scan of the
    micro-batch input per trigger).  Idempotent per ``batch_id`` (see
    module docstring).

    ``validate_order=True`` (default) records ``max(id)`` per admitted
    batch in a metadata-sized ``meta/`` state table and WARNS when this
    batch's min id is below a strictly-earlier batch's max — the
    ascending-id contract the batch-equivalence proof needs (module
    docstring).  Violation does not abort admission: semantics merely
    degrade from min-id tie-break to first-arrival-wins on cross-batch
    exact/near-dup ties."""
    sp = batch.sparkSession

    # optional learned-gate tier (curate_v2's classifier): scoring is a
    # PURE per-document map, so it composes with the incremental
    # equivalence proof unchanged — a doc's admission never depends on
    # other documents through this stage.  (Span removal does depend on
    # the whole corpus and stays batch-only — module docstring.)
    if clf_weights is not None:
        from ..functions.classifier import score_documents

        batch = (
            score_documents(batch, text_col, clf_weights, clf_bias)
            .filter(F.col("clf_score") >= clf_min)
            .drop("clf_score")
        )

    q = batch.filter(
        tx.quality_score(F.col(text_col)) >= quality_min
    ).withColumn("_fp", tx.fingerprint(F.col(text_col)))
    b_uniq = exact_dedup(q, ["_fp"], id_col)

    seen = _read_state(sp, f"{state_dir}/seen")
    if seen is not None:
        # STRICTLY-BEFORE filter, not merely != : a replayed batch must
        # see exactly the history it saw the first time.  `!=` would let
        # a replay see LATER batches' rows and drop documents that
        # collide with docs that arrived after it — non-idempotent.
        # Batch ids are monotone (the structured-streaming contract).
        seen = seen.filter(F.col("_bid") < F.lit(batch_id))
        # history side scans map-side (column-pruned to _fp) against the
        # broadcast batch fingerprints; hits are small by construction
        hits = (
            seen.join(
                F.broadcast(b_uniq.select("_fp").distinct()), "_fp", "left_semi"
            )
            .select("_fp")
            .distinct()
        )
        new_u = b_uniq.join(F.broadcast(hits), "_fp", "left_anti")
    else:
        new_u = b_uniq
    # new_u feeds band rows, intra-batch pairs, the seen/index writes and
    # the admission anti-join — derive the quality+fingerprint chain once
    new_u = new_u.localCheckpoint()

    band = minhash_band_rows(new_u, id_col, text_col, num_perm, bands, shingle_n)
    index_rows = _read_state(sp, f"{state_dir}/index")
    drops = minhash_lsh_pairs(
        new_u, id_col, text_col, num_perm, bands, shingle_n
    ).select(F.col("id_b").alias(id_col))
    if index_rows is not None:
        dup_ids = index_candidates(
            band, index_rows.filter(F.col("_bid") < F.lit(batch_id))
        ).select(F.col("id_new").alias(id_col))
        drops = drops.unionByName(dup_ids)
    near_ok = new_u.join(F.broadcast(drops.distinct()), id_col, "left_anti")

    contaminated = contamination(
        near_ok, benchmark, id_col, text_col, n=decontam_n
    ).select(id_col)
    clean_b = near_ok.join(F.broadcast(contaminated), id_col, "left_anti").drop(
        "_fp"
    )

    if validate_order:
        bounds = q.agg(
            F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
        ).first()
        if bounds["lo"] is not None:
            prior = _read_state(sp, f"{state_dir}/meta")
            if prior is not None:
                prior_max = (
                    prior.filter(F.col("_bid") < F.lit(batch_id))
                    .agg(F.max("max_id"))
                    .first()[0]
                )
                if prior_max is not None and bounds["lo"] < prior_max:
                    warnings.warn(
                        f"admit_increment batch {batch_id}: min {id_col} "
                        f"{bounds['lo']} is below an earlier batch's max "
                        f"{prior_max}; cross-batch dup ties degrade to "
                        "first-arrival-wins (batch-plan equivalence needs "
                        "ascending-id arrival)",
                        stacklevel=2,
                    )
            sp.createDataFrame(
                [(int(bounds["hi"]),)], "max_id long"
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{state_dir}/meta/_bid={batch_id}"
            )

    new_u.select(F.col(id_col), "_fp").write.mode("overwrite").parquet(
        f"{state_dir}/seen/_bid={batch_id}"
    )
    band.write.mode("overwrite").parquet(f"{state_dir}/index/_bid={batch_id}")
    clean_b.write.mode("overwrite").parquet(
        f"{state_dir}/corpus/_bid={batch_id}"
    )
    from ..session import release_checkpoint

    if not return_stats:
        # seen/index/corpus state all written — the batch checkpoint is
        # spent (r13 opt, guide §5)
        release_checkpoint(new_u)
        return {"batch_id": batch_id}
    n_admitted = (
        _read_state(sp, f"{state_dir}/corpus/_bid={batch_id}").count()
    )
    out = {
        "batch_id": batch_id,
        "batch_rows": batch.count(),
        "exact_new": new_u.count(),  # checkpointed — no recompute
        "admitted": n_admitted,
    }
    release_checkpoint(new_u)
    return out


def curate_document_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    state_dir: str,
    benchmark: DataFrame,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    decontam_n: int = 8,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_files_per_trigger: int = 1,
    clf_weights: list[float] | None = None,
    clf_bias: float = 0.0,
    clf_min: float = 0.5,
):
    """The streaming form of the admission loop: each micro-batch runs
    ``admit_increment`` against the persisted state (``availableNow``
    drain; same checkpoint/restart contract as
    ``streaming/dedup_stream.py``).  foreachBatch is at-least-once;
    ``admit_increment`` is idempotent per batch_id, so persisted state is
    exactly-once.  The LSH parameters MUST match whatever earlier
    batches were admitted with — band rows with different banding are
    silently incomparable.  Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )

    def _step(batch: DataFrame, batch_id: int) -> None:
        admit_increment(
            batch,
            batch_id,
            state_dir,
            benchmark,
            id_col=id_col,
            text_col=text_col,
            quality_min=quality_min,
            decontam_n=decontam_n,
            num_perm=num_perm,
            bands=bands,
            shingle_n=shingle_n,
            return_stats=False,
            clf_weights=clf_weights,
            clf_bias=clf_bias,
            clf_min=clf_min,
        )

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def admit_from_cdc(
    spark: SparkSession,
    src_table: str,
    state_dir: str,
    benchmark: DataFrame,
    cursor_path: str | None = None,
    **admit_kwargs,
) -> int | None:
    """Drive the admission loop from a VERSIONED TABLE's change feed
    (VERDICT r6 task 7 — the composition of ``sources/versioned.py``
    CDC with this module): read the rows appended to ``src_table``
    since the cursor (``sync_changes`` → ``read_changes`` file-set
    diff, zero scans of pre-existing data), admit them as ONE batch
    keyed by the ``until`` version, then advance the cursor.

    Exactly-once end-to-end over at-least-once delivery, from both
    sides: ``sync_changes`` advances the cursor only AFTER the apply
    returns, so a crash mid-admission re-delivers the change set — and
    ``admit_increment`` is idempotent per batch id (every state write
    overwrites its own ``_bid`` partition; state reads see only
    ``_bid`` strictly below), so the replay converges to the identical
    persisted state.  Batch ids are table versions, which are monotone
    — the ascending-batch-id contract the incremental equivalence
    proof needs.  Returns the new cursor version, or None when there
    was nothing to admit."""
    from ..sources.versioned import sync_changes

    if cursor_path is None:
        cursor_path = f"{state_dir.rstrip('/')}/cdc_cursor.json"

    def apply_fn(df: DataFrame, since: int, until: int) -> None:
        admit_increment(
            df, until, state_dir, benchmark,
            return_stats=False, **admit_kwargs,
        )

    return sync_changes(spark, src_table, cursor_path, apply_fn)


def curated_corpus(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated clean corpus (decontaminated near-dup survivors),
    before quota/mixture."""
    corpus = _read_state(spark, f"{state_dir}/corpus")
    if corpus is None:
        raise ValueError(f"no admitted batches under {state_dir}")
    return corpus.drop("_bid")


def curated_view(
    spark: SparkSession,
    state_dir: str,
    weights: dict[str, float],
    quota: int = 30,
    quota_col: str = "source",
    mix_col: str = "lang",
    id_col: str = "doc_id",
    quota_seed: int = 17,
    mix_seed: int = 29,
) -> DataFrame:
    """Per-source quota + language mixture over the accumulated corpus —
    the final training mix, identical to ``curate`` on the union of all
    admitted batches (see module docstring for why quota lives here)."""
    capped = quota_per_group(
        curated_corpus(spark, state_dir), [quota_col], quota, id_col,
        seed=quota_seed,
    )
    return weighted_repeat(capped, mix_col, weights, id_col, seed=mix_seed)
