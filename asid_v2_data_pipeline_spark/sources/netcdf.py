"""NetCDF scene source (S1/S5) — binaryFile + Arrow-batched decode.

Real `.nc` ingestion plumbing for the reference's scene files
(/root/reference/asip_v2/build_dataset.py:28, archive.py:19-20): Spark
lists and ships files via the ``binaryFile`` source; each file is decoded
executor-side inside ``mapInPandas`` into the long-form pixel tables of
schemas.py.  One file = one task; at 100 TB the directory listing
parallelizes and decode scales with executors — no driver-side I/O.

Both container generations decode for real via pure-Python parsers —
classic CDF-1/CDF-2 in ``netcdf_classic.py`` and netCDF-4/HDF5 in
``hdf5_min.py`` (contiguous / chunked / gzip+shuffle layouts) — no
third-party dependency; ``decode_netcdf_scene`` dispatches on the file
magic.  The kernel stays injectable (``decode_fn``) so deployments with
the netCDF4 library can swap in ``netCDF4.Dataset`` for exotic layouts
(dense-stored groups, szip, …) outside the pure-Python scope.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("scene", T.StringType(), False),
        T.StructField("var", T.StringType(), False),
        T.StructField("line", T.IntegerType(), False),
        T.StructField("sample", T.IntegerType(), False),
        T.StructField("value", T.FloatType(), True),  # NULL = masked
    ]
)

DecodeFn = Callable[[str, bytes, list[str]], pd.DataFrame]


def decode_netcdf_scene(path: str, payload: bytes, variables: list[str]) -> pd.DataFrame:
    """Decode one scene file into long-form pixels (masked -> NULL, the
    engine analogue of ``fil[name][:]...filled(np.nan)`` at
    archive.py:19-20).

    Dispatches on the container magic: classic CDF-1/CDF-2 via the
    pure-Python reader in ``netcdf_classic.py``, netCDF-4/HDF5 via the
    pure-Python minimal-HDF5 reader in ``hdf5_min.py`` — the same
    either-generation acceptance as the reference's
    ``netCDF4.Dataset(path)`` (build_dataset.py:28), with no
    third-party dependency.

    Variables must be 2-D ``(line, sample)``; fill values surface as NULL.

    Parser boundary (r10 fuzz hardening): both container readers parse
    UNTRUSTED bytes with offsets taken from the stream itself, so a
    truncated or corrupt scene can surface as struct.error /
    IndexError / KeyError / TypeError / OverflowError deep in the
    walk.  Those convert to ValueError here — the ingest ledger can
    quarantine one bad scene instead of failing the whole pass.
    """
    import struct
    import zlib

    import numpy as np

    from .hdf5_min import HDF5_MAGIC, HDF5NetCDF
    from .netcdf_classic import ClassicNetCDF

    try:
        if payload[:8] == HDF5_MAGIC:
            ds = HDF5NetCDF(payload)
        else:
            ds = ClassicNetCDF(payload)
    except (
        struct.error, IndexError, KeyError, TypeError, OverflowError,
        zlib.error,
    ) as e:
        raise ValueError(
            f"{path}: truncated or corrupt scene container ({e})"
        ) from e
    scene = path.split("/")[-1].split("_")[0]
    frames = []
    for var in variables:
        if var not in ds.variables:
            continue
        try:
            arr = ds.masked(var)
        except (
            struct.error, IndexError, KeyError, TypeError,
            OverflowError, zlib.error,
        ) as e:
            raise ValueError(
                f"{path}: truncated or corrupt scene data ({e})"
            ) from e
        if arr.ndim != 2:
            raise ValueError(f"{var}: expected 2-D (line, sample), got {arr.shape}")
        h, w = arr.shape
        flat = arr.astype(np.float32).reshape(-1)
        frames.append(
            pd.DataFrame(
                {
                    "scene": scene,
                    "var": var,
                    "line": np.repeat(np.arange(h, dtype=np.int32), w),
                    "sample": np.tile(np.arange(w, dtype=np.int32), h),
                    # masked extension array: NaN -> pd.NA so Arrow ships
                    # proper NULLs (masked-read convention S5), vectorized
                    "value": pd.arrays.FloatingArray(flat, np.isnan(flat)),
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in PIXEL_SCHEMA.fields}
        )
    return pd.concat(frames, ignore_index=True)


REJECT_VAR = "_error"  # sentinel var name marking a quarantined scene


def read_scenes(
    spark: SparkSession,
    input_dir: str,
    variables: list[str],
    decode_fn: DecodeFn = decode_netcdf_scene,
    glob: str = "*.nc",
    names: DataFrame | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """S1 — scan a directory of scene files into one long-form pixel
    DataFrame.  ``binaryFile`` splits the listing across executors; decode
    happens in Arrow batches (one file per input row).

    ``names`` (optional, a one-column ``name`` DataFrame) restricts the
    scan BEFORE decode via a broadcast semi-join on the file name — the
    incremental path decodes only new files, never the whole directory.

    ``on_error`` (r10): ``"raise"`` preserves the fail-fast default;
    ``"quarantine"`` is the 100 TB shape — a scene whose decode raises
    ValueError / NotImplementedError emits ONE sentinel row
    ``(scene, var=REJECT_VAR, line=-1, sample=-1, value=NULL)`` instead
    of failing the task, so one corrupt file costs one scene, not the
    pass.  Pixel consumers filter on their variable names and never
    see the sentinel; ``df.filter(col("var") == REJECT_VAR)`` is the
    rejects side-channel the ledger can subtract before marking scenes
    processed."""
    from pyspark.sql import functions as F

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, {on_error!r}")

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("name"),
            F.col("content"),
        )
    )
    if names is not None:
        files = files.join(
            F.broadcast(names.select("name")), "name", "left_semi"
        )
    quarantine = on_error == "quarantine"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                if not quarantine:
                    yield decode_fn(r["name"], r["content"], variables)
                    continue
                try:
                    yield decode_fn(r["name"], r["content"], variables)
                except (ValueError, NotImplementedError):
                    scene = r["name"].split("/")[-1].split("_")[0]
                    yield pd.DataFrame(
                        {
                            "scene": [scene],
                            "var": [REJECT_VAR],
                            "line": pd.array([-1], dtype="int32"),
                            "sample": pd.array([-1], dtype="int32"),
                            "value": pd.array([None], dtype="Float32"),
                        }
                    )

    return files.mapInPandas(decode, PIXEL_SCHEMA)


def fake_decoder(side: int = 8) -> DecodeFn:
    """Deterministic fake decode kernel for tests: value = a simple
    function of (var index, line, sample); one masked pixel per variable."""

    def fn(name: str, payload: bytes, variables: list[str]) -> pd.DataFrame:
        scene = name.split("_")[0]
        rows = []
        for vi, var in enumerate(variables):
            for line in range(side):
                for sample in range(side):
                    masked = (line, sample) == (vi, vi)
                    rows.append(
                        (
                            scene,
                            var,
                            line,
                            sample,
                            None if masked else float(vi * 10000 + line * side + sample),
                        )
                    )
        return pd.DataFrame(
            rows, columns=["scene", "var", "line", "sample", "value"]
        )

    return fn
