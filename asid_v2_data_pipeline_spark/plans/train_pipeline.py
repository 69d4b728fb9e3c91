"""Train-path pipeline (SURVEY.md §3.2) — the Spark shape of
/root/reference/asip_v2/train_model.py:24-57:

    patch corpus -> F6 day-of-year selection -> O2 seeded shuffle ->
    O3 exact-count train/val split -> B1/B2 Arrow batch assembly

The reference's Keras fit loop consumes the resulting Arrow batches; the
engine's job ends at the tensor feed (the reference ships no trained
weights either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.strings import scene_timestamp
from ..operators.batching import assemble_batches, pivot_patches
from ..operators.filters import day_of_year_filter
from ..operators.split import fraction_split


def select_training_patches(
    patch_px: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """F6/C9/C10 — keep patches whose scene date's 0-based day-of-year is
    in [beginning, ending] (train_model.py:69-81, off-by-one pinned)."""
    ts = scene_timestamp(F.concat(F.col("scene"), F.lit("_")))
    return patch_px.filter(
        day_of_year_filter(ts, cfg.beginning_day_of_year, cfg.ending_day_of_year)
    )


def train_val_feeds(
    patch_px: DataFrame,
    cfg: PipelineConfig,
    variables: list[str],
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """O2+O3+B1+B2 — shuffled exact-count split of patch keys, then batch
    tensors per partition (B3: same params, two partitions)."""
    selected = select_training_patches(patch_px, cfg)
    keys = selected.select("scene", "i", "j").distinct()
    train_keys, val_keys = fraction_split(keys, cfg.percentage, seed)

    def feed(keys_df: DataFrame) -> DataFrame:
        px = selected.join(keys_df, ["scene", "i", "j"], "left_semi")
        piv = pivot_patches(px, variables, cfg.window_sar)
        return assemble_batches(piv, variables, cfg.window_sar, cfg.batch_size)

    return feed(train_keys), feed(val_keys)
