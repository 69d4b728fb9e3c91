"""Domain fixtures (FIXTURES.md §A) — reference-shaped tables built from
literal Python data, deterministic, small enough to hash.

Values mirror the reference's own unit-test literals where those pin
semantics (e.g. the polygon rows at
/root/reference/asip_v2/tests/test_archive.py:287-289).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from . import schemas

SCENE_A = "20180410T084537"  # healthy, doy ~100 (tests/test_archive.py:293)
SCENE_B = "20180110T120000"  # healthy, doy ~10
SCENE_C = "20180907T060000"  # healthy, doy ~250
SCENE_NO_IC = "20180301T000000"  # missing icechart
SCENE_NO_AMSR = "20180302T000000"  # missing AMSR2
SCENE_SMALL = "20180303T000000"  # extent < window

H = W = 32  # SAR grid
AH = AW = 8  # AMSR2 grid (aspect ratio 4)
WINDOW = 8


def _ts(scene: str) -> dt.datetime:
    return dt.datetime.strptime(scene, "%Y%m%dT%H%M%S")


def scenes(spark: SparkSession) -> DataFrame:
    rows = []
    for scene, has_ic, has_amsr, lr_s, lr_l in [
        (SCENE_A, True, True, 120, 200),
        (SCENE_B, True, True, 120, 200),
        (SCENE_C, True, True, 120, 200),
        (SCENE_NO_IC, False, True, 120, 200),
        (SCENE_NO_AMSR, True, False, 120, 200),
        (SCENE_SMALL, True, True, 12, 2),  # pinned tests/test_archive.py:254-267
    ]:
        rows.append(
            (
                scene,
                f"{scene}_S1B_AMSR2_Icechart.nc",
                _ts(scene),
                3,
                lr_s,
                14,
                lr_l,
                0,
                has_ic,
                has_amsr,
            )
        )
    return spark.createDataFrame(rows, schemas.SCENES)


def sar_pixels(spark: SparkSession, scene: str = SCENE_A) -> DataFrame:
    """32x32 grid: smooth values; NULL cluster in patch (1,2); one single
    NULL pixel in patch (2,1); low distance_map corner in patch (3,3)."""
    rows = []
    for line in range(H):
        for sample in range(W):
            i, j = line // WINDOW, sample // WINDOW
            masked = (i, j) == (1, 2) and line % 8 < 4
            single = (i, j) == (2, 1) and (line, sample) == (17, 9)
            v1 = None if (masked or single) else float(line * W + sample)
            v2 = None if masked else float(1000 + line + sample)
            dist = 5.0 if (i, j) == (3, 3) else 100.0
            rows.append((scene, line, sample, v1, v2, dist))
    return spark.createDataFrame(rows, schemas.SAR_PIXELS)


def icechart_pixels(spark: SparkSession, scene: str = SCENE_A) -> DataFrame:
    """Polygon ids tile the grid; patch (0,1) has a NULL (outside chart)."""
    ids = [33, 35, 40, 41, 42, 43, 44, 45]
    rows = []
    for line in range(H):
        for sample in range(W):
            pid = ids[(line // 8 * 4 + sample // 8) % len(ids)]
            if (line, sample) == (2, 10):  # one hole in patch (0,1)
                pid = None
            rows.append((scene, line, sample, pid))
    return spark.createDataFrame(rows, schemas.ICECHART_PIXELS)


def polygon_codes(spark: SparkSession, scene: str = SCENE_A) -> DataFrame:
    """Rows covering every encoder branch (FIXTURES.md A4), including the
    two verbatim reference rows (tests/test_archive.py:288-289)."""
    rows = [
        # id, ct, ca, sa, fa, cb, sb, fb, cc, sc, fc
        (33, 92, -9, 91, 8, -9, -9, -9, -9, -9, -9),  # verbatim ref row
        (35, 92, -9, 91, 8, -9, -9, -9, -9, -9, -9),  # verbatim ref row (CN=98 variant)
        (40, 5, -9, -9, -9, -9, -9, -9, -9, -9, -9),  # ct<10 -> open water
        (41, 80, 80, 83, 2, -9, -9, -9, -9, -9, -9),  # young ice
        (42, 90, 50, 96, 3, 40, 87, 2, -9, -9, -9),  # multi-year dominant
        (43, 60, 40, 87, 1, 40, 96, 2, -9, -9, -9),  # tie: first max wins
        (44, 70, -9, 94, 1, -9, -9, -9, -9, -9, -9),  # unmapped stage 94
        (45, 85, 30, 0, 1, -9, -9, -9, -9, -9, -9),  # quirk: ice-free f[-1] wrap
    ]
    return spark.createDataFrame(
        [(scene, *r, "I") for r in rows], schemas.POLYGON_CODES
    )


def amsr2_pixels(
    spark: SparkSession, scene: str = SCENE_A, channels: tuple[str, ...] = ("btemp_6.9h", "btemp_6.9v")
) -> DataFrame:
    """8x8 coarse grid; btemp = 200 + 0.5*line + 0.25*sample (analytic, so
    bilinear interpolation has a closed form).  Coarse cell centers sit at
    SAR coords 2 + 4k (aspect ratio 4)."""
    rows = []
    for ch_i, ch in enumerate(channels):
        for al in range(AH):
            for asamp in range(AW):
                line_c = 2.0 + 4.0 * al
                samp_c = 2.0 + 4.0 * asamp
                btemp = float(200 + 10 * ch_i) + 0.5 * line_c + 0.25 * samp_c
                rows.append((scene, ch, al, asamp, line_c, samp_c, btemp))
    return spark.createDataFrame(rows, schemas.AMSR2_PIXELS)


def ledger(spark: SparkSession) -> DataFrame:
    rows = [(f"{s}_S1B_AMSR2_Icechart.nc",) for s in (SCENE_B, SCENE_NO_IC)]
    return spark.createDataFrame(rows, schemas.LEDGER)
