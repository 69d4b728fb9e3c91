"""Old-API mask-based build path (SURVEY.md §2 'old API': F4/F5/W6/W7).

The reference's older generation computes one explicit boolean mask and
applies it to every variable, instead of the per-patch NaN skip.
Composition order pinned at
/root/reference/asip_v2/tests/test_archive.py:397-414 (``calculate_mask``):

    sar_mask    = OR(sar vars NULL, icechart NULL, distance < t)   [F4/F5]
    amsr_up     = amsr2 mask upsampled by aspect_ratio             [kron]
    padded      = pad sar_mask to amsr_up's size, constant True    [W7]
    full_mask   = padded OR amsr_up                                [mask_or]
    amsr_mask   = any-pool downsample of full_mask                 [W6]

Also the old per-variable decode ``encode_icechart`` (pinned at
tests/test_archive.py:145-159): polygon id -> the raw attribute value of
one variable (CT, CA, ...), not the one-hot vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.masks import sar_size_mask, upsample_mask
from ..operators.resize import any_pool_mask, centered_pads


def decode_icechart_raw(
    icechart_px: DataFrame, codes: DataFrame, attr: str
) -> DataFrame:
    """Old-API J1 variant — map polygon id to the raw value of one
    attribute column (encode_icechart, pinned tests/test_archive.py:145-159:
    element 0 -> CT, 1 -> CA, ...).  Broadcast join; unmatched ids NULL."""
    build = codes.select("scene", "id", F.col(attr).alias("_v"))
    return icechart_px.join(
        F.broadcast(build),
        (icechart_px.scene == build.scene) & (icechart_px.polygon_id == build.id),
        "left",
    ).select(icechart_px.scene, "line", "sample", F.col("_v").alias(attr))


def compute_masks(
    sar_px: DataFrame,
    icechart_px: DataFrame,
    amsr2_mask: DataFrame,
    sar_cols: list[str],
    distance_threshold: int,
    aspect_ratio: int,
    sar_h: int,
    sar_w: int,
) -> tuple[DataFrame, DataFrame]:
    """calculate_mask -> (full_mask at amsr-upsampled size, amsr2-sized
    mask).  ``amsr2_mask``: (scene, line, sample, mask) on the coarse grid
    of size (sar_h/aspect, sar_w/aspect) … all column ops + one groupBy."""
    amsr_h = (sar_h // aspect_ratio) * aspect_ratio
    amsr_w = (sar_w // aspect_ratio) * aspect_ratio

    # F4/F5 union on the SAR grid
    joined = sar_px.join(
        icechart_px.select("scene", "line", "sample", "polygon_id"),
        ["scene", "line", "sample"],
        "left",
    )
    sar_mask = joined.select(
        "scene",
        "line",
        "sample",
        sar_size_mask(sar_cols, distance_threshold=distance_threshold).alias("mask"),
    )

    # W7 — center-pad the SAR mask to the upsampled AMSR2 size with True
    top, _b, left, _r = centered_pads(sar_h, sar_w, amsr_h, amsr_w)
    shifted = sar_mask.select(
        "scene",
        (F.col("line") + top).alias("line"),
        (F.col("sample") + left).alias("sample"),
        "mask",
    )
    amsr_up = upsample_mask(amsr2_mask, aspect_ratio)
    # pad ring = positions in the upsampled grid not covered by the shifted
    # SAR mask -> constant True; implemented as a left join + coalesce(True)
    full = amsr_up.select("scene", "line", "sample", F.col("mask").alias("amsr_mask")).join(
        shifted, ["scene", "line", "sample"], "left"
    )
    full_mask = full.select(
        "scene",
        "line",
        "sample",
        (F.coalesce(F.col("mask"), F.lit(True)) | F.col("amsr_mask")).alias("mask"),
    )

    # W6 — any-pool back down to the AMSR2 grid
    amsr_sized = any_pool_mask(full_mask, aspect_ratio, keys=["scene"])
    return full_mask, amsr_sized
