"""Golden end-to-end pipeline hash (SURVEY.md §5 item 3): the full build
pipeline on the domain fixtures must produce a byte-stable result.

If this fails after an intentional semantic change, recompute the hash
with the printed value and update GOLDEN_* — the test exists to make
silent regressions loud, not to freeze development.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark import fixtures
from asid_v2_data_pipeline_spark.config import PipelineConfig
from asid_v2_data_pipeline_spark.plans.build_pipeline import build_patches


def _pipeline_hash(spark, encoding: str) -> str:
    cfg = PipelineConfig(
        window_sar=8, stride_sar=8, window_amsr2=2, encoding=encoding
    )
    px = build_patches(
        fixtures.scenes(spark),
        fixtures.sar_pixels(spark),
        fixtures.icechart_pixels(spark),
        fixtures.polygon_codes(spark),
        fixtures.amsr2_pixels(spark),
        cfg,
    )
    rows = px.select(
        "scene",
        "i",
        "j",
        "var",
        "prow",
        "pcol",
        F.round("value", 6).alias("v"),
    ).collect()
    canon = sorted(tuple(r) for r in rows)
    h = hashlib.sha256()
    for t in canon:
        h.update(repr(t).encode())
    return h.hexdigest()


GOLDEN_BINARY = "6992f3c7c0913cd0ea3cb12042674ebcc4f41de5771aea6023ddd858b4a20846"
GOLDEN_CONT = "a41b0bbd6bf28d2625341883ce9a9e7ed514793fcd3d8c7c01151eed30efcc2f"


def test_golden_binary(spark):
    got = _pipeline_hash(spark, "binary")
    assert got == GOLDEN_BINARY, f"pipeline output changed: {got}"


def test_golden_continous(spark):
    got = _pipeline_hash(spark, "continous")
    assert got == GOLDEN_CONT, f"pipeline output changed: {got}"
