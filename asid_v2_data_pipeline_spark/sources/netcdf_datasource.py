"""netCDF scene scan as a Spark 4 Python DataSource (S1, idiomatic form).

The engine surface the scene scan deserves on PySpark 4: register once,
then ``spark.read.format("netcdf")`` replaces the ``binaryFile`` +
``mapInPandas`` plumbing of ``netcdf.py::read_scenes`` —

    spark.dataSource.register(NetCDFDataSource)
    px = (spark.read.format("netcdf")
          .option("variables", "nersc_sar_primary,nersc_sar_secondary")
          .load("/data/scenes"))

Same long-form pixel output (masked -> NULL, the reference's
``archive.py:19-20`` fill convention), same one-file-one-partition
parallelism — but as a planned source: each file is an
``InputPartition``, decode runs executor-side, and rows travel as Arrow
RecordBatches (the fast path the Python DataSource API supports).

Options:

- ``variables`` (required): comma-separated variable names to extract.
- ``glob`` (default ``*.nc``): filename filter for the listing.
- ``names`` (optional): JSON-encoded list of exact file names — the
  incremental path's pruning, applied at PARTITION PLANNING time, so
  already-processed files produce no partitions at all (stronger than
  the binaryFile path's semi-join, which still lists then drops).  An
  empty list selects zero files.  Set via ``read_scenes_ds(names=...)``.
- ``decode_fn`` (optional): ``"pkg.module:callable"`` decode-kernel
  injection for deployments with the netCDF4 library (netCDF-4/HDF5
  containers); default is the pure-Python classic CDF-1/2 parser.

File listing and reads use plain Python IO — local/NFS paths in this
environment; a cloud deployment points ``decode_fn``-style injection at
an fsspec-backed opener the same way.  The listing is driver-side, like
every Spark file source's partition planning.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .netcdf import PIXEL_SCHEMA

_OPT_VARIABLES = "variables"
_OPT_GLOB = "glob"
_OPT_NAMES = "names"
_OPT_DECODE_FN = "decode_fn"


class _ScenePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class NetCDFDataSource(DataSource):
    """``format("netcdf")`` — one partition per scene file."""

    @classmethod
    def name(cls) -> str:
        return "netcdf"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema) -> "NetCDFSceneReader":
        return NetCDFSceneReader(self.options)


class NetCDFSceneReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("format('netcdf') requires .load(<directory>)")
        self.path = path
        self.variables = [
            v.strip()
            for v in options.get(_OPT_VARIABLES, "").split(",")
            if v.strip()
        ]
        if not self.variables:
            raise ValueError(
                "option 'variables' is required (comma-separated names)"
            )
        self.glob = options.get(_OPT_GLOB, "*.nc")
        names = options.get(_OPT_NAMES)
        # JSON-encoded (set by read_scenes_ds): survives commas in file
        # names, and an empty list means SELECT ZERO FILES, which a
        # comma-split encoding cannot distinguish from "no filter"
        if names is None:
            self.names = None
        else:
            import json

            self.names = set(json.loads(names))
        self.decode_ref = options.get(_OPT_DECODE_FN)

    def partitions(self):
        import glob as globmod
        import os

        files = sorted(globmod.glob(os.path.join(self.path, self.glob)))
        if self.names is not None:
            files = [f for f in files if os.path.basename(f) in self.names]
        return [_ScenePartition(f) for f in files]

    def _decode_fn(self):
        if self.decode_ref:
            import importlib

            mod, _, attr = self.decode_ref.partition(":")
            if not attr:
                raise ValueError(
                    f"decode_fn must be 'module:callable', got {self.decode_ref!r}"
                )
            return getattr(importlib.import_module(mod), attr)
        from .netcdf import decode_netcdf_scene

        return decode_netcdf_scene

    def read(self, partition: _ScenePartition):
        import os

        import pyarrow as pa

        # Spark schedules one read(None) task when partitions() returned
        # an empty list (empty dir, or names pruning excluded every
        # file) — that is an empty scan, not an error
        if partition is None:
            return

        decode = self._decode_fn()
        with open(partition.path, "rb") as fh:
            payload = fh.read()
        pdf = decode(os.path.basename(partition.path), payload, self.variables)
        arrow_schema = pa.schema(
            [
                pa.field("scene", pa.string(), nullable=False),
                pa.field("var", pa.string(), nullable=False),
                pa.field("line", pa.int32(), nullable=False),
                pa.field("sample", pa.int32(), nullable=False),
                pa.field("value", pa.float32(), nullable=True),
            ]
        )
        tbl = pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False)
        yield from tbl.to_batches()


def register(spark) -> None:
    """Idempotent registration of ``format("netcdf")`` on this session."""
    spark.dataSource.register(NetCDFDataSource)


def read_scenes_ds(
    spark,
    input_dir: str,
    variables: list[str],
    glob: str = "*.nc",
    names: list[str] | None = None,
    decode_fn_ref: str | None = None,
):
    """``read_scenes`` twin on the DataSource surface (registers on the
    session, then ``format("netcdf")``)."""
    register(spark)
    import json

    r = (
        spark.read.format("netcdf")
        .option(_OPT_VARIABLES, ",".join(variables))
        .option(_OPT_GLOB, glob)
    )
    if names is not None:
        r = r.option(_OPT_NAMES, json.dumps(sorted(names)))
    if decode_fn_ref is not None:
        r = r.option(_OPT_DECODE_FN, decode_fn_ref)
    return r.load(input_dir)
