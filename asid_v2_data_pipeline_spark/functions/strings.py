"""Scalar string / date / naming functions (SURVEY.md §2.6 C5-C12).

Each mirrors a reference site; all are built-in-expression compositions
(JVM-side, codegen-friendly — no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scene_id(filename: Column) -> Column:
    """C5 — scene id = first '_'-separated token of the filename
    (archive.py:229, apply_model.py:31)."""
    return F.split(filename, "_").getItem(0)


def scene_timestamp(filename: Column) -> Column:
    """C9 — parse '%Y%m%dT%H%M%S' from the scene prefix
    (train_model.py:78)."""
    return F.to_timestamp(scene_id(filename), "yyyyMMdd'T'HHmmss")


def day_of_year_0based(ts: Column) -> Column:
    """C10 — the reference computes ``(ts - Jan1).days`` = dayofyear - 1
    (train_model.py:79-80); we pin the off-by-one."""
    return F.dayofyear(ts) - F.lit(1)


def header_truncate(header: Column) -> Column:
    """C6 — ';'-split header truncated to the first 11 names
    (archive.py:231)."""
    return F.slice(F.split(header, ";"), 1, 11)


def parse_code_row(row: Column) -> list[Column]:
    """C7 — parse one polygon_codes row: id + 10 int attributes
    (archive.py:237-239)."""
    parts = F.split(row, ";")
    return [parts.getItem(i).cast("int") for i in range(11)]


def npz_name_conventer(name: Column) -> Column:
    """C8 — '.' -> '_' for variable names, e.g. btemp_89.0h -> btemp_89_0h
    (archive.py:154-155, write_batches archive.py:272)."""
    return F.regexp_replace(name, r"\.", "_")


def patch_filename(scene: Column, seq: Column) -> Column:
    """C12 — zero-padded output filename ``{scene}_{seq:0>6}.npz``
    (archive.py:291)."""
    return F.format_string("%s_%06d.npz", scene, seq.cast("long"))


def patch_filename_old(
    scene: Column, seq: Column, nersc: str, i: Column, j: Column
) -> Column:
    """C12 (old API) — ``{scene}_{seq:06d}_{nersc}-{i}_{j}.npz``
    (tests/test_archive.py:433-447)."""
    return F.format_string(
        "%s_%06d_" + nersc + "-%d_%d.npz",
        scene,
        seq.cast("long"),
        i.cast("int"),
        j.cast("int"),
    )


def parse_patch_loc(name: Column) -> tuple[Column, Column]:
    """C11 — parse (i, j) from an old-format filename
    (train_model.py:93-95): last '-' group, '.npz' stripped, '_'-split."""
    i = F.regexp_extract(name, r"-(\d+)_(\d+)\.npz$", 1).cast("int")
    j = F.regexp_extract(name, r"-(\d+)_(\d+)\.npz$", 2).cast("int")
    return i, j
