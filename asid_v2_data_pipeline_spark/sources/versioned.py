"""Manifest-versioned parquet tables (lakehouse-lite): snapshot
isolation, time travel, rollback, vacuum — no table-format dependency.

Plain ``spark.read.parquet(dir)`` has two failure classes at scale:
readers see half-written output of a concurrent writer, and any
compaction/overwrite needs a rename window where the directory is
inconsistent (the round-4 ``sources/compact.py`` swap mitigates but
cannot eliminate it).  The fix every table format (Iceberg/Delta/Hudi)
uses is indirection: data files are IMMUTABLE, a manifest names the
exact file set of a version, and a single atomically-swapped pointer
names the current version.  This module implements the minimal form:

    {path}/data/v{N}/part-*.parquet   immutable once committed
    {path}/_versions/v{N}.json        file list + meta for version N
    {path}/_latest                    pointer file: just "N"

- **commit_version(df, mode)**: writes new files under ``data/v{N}``
  (N = latest + 1), writes the manifest (append = previous file set +
  new files; overwrite = new files only), then swaps ``_latest`` via
  write-temp + ``os.replace`` (atomic on POSIX; on object stores swap
  the pointer with a conditional PUT).  A crash BEFORE the pointer swap
  leaves ``_latest`` untouched — readers never see the partial commit,
  and the orphaned data/manifest are overwritten by the next commit of
  that version number.
- **read_latest / read_version**: load the manifest's exact file list —
  a reader holding version N is immune to later commits, compactions
  and vacuums (old files are deleted only when no retained version
  references them).
- **compact_version**: rewrites the CURRENT file set into fewer files
  as a NEW version — readers of old versions keep their files; there is
  no moment where the table path is missing or mixed (the gap the
  rename-swap design could not close).
- **rollback(n)**: commits a new version whose file set is version n's
  — history stays linear and append-only, like Iceberg's rollback.
- **vacuum(keep)**: deletes data files unreferenced by the retained
  manifests.  Retention is the reader contract: vacuum(keep=k) breaks
  readers pinned to versions older than latest-k+1, same as any table
  format's expire-snapshots.

Single-writer contract (same as merge/compact): serialize commits per
table path; readers need no coordination.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(path: str) -> str:
    return os.path.join(path, "_versions")


def _pointer(path: str) -> str:
    return os.path.join(path, "_latest")


def latest_version(path: str) -> int | None:
    """The committed version the pointer names, or None for an empty /
    uninitialized table."""
    try:
        with open(_pointer(path)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _manifest_path(path: str, n: int) -> str:
    return os.path.join(_versions_dir(path), f"v{n}.json")


def read_manifest(path: str, n: int) -> dict:
    with open(_manifest_path(path, n)) as f:
        return json.load(f)


def _swap_pointer(path: str, n: int) -> None:
    tmp = _pointer(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(n))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _pointer(path))


def _list_parquet(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def commit_version(
    df: DataFrame, path: str, mode: str = "append", batch_id: int | None = None
) -> int:
    """Write ``df`` as the next table version; returns its number.

    ``mode="append"``: the new version's file set is the current one
    plus the new files.  ``mode="overwrite"``: new files only.  The
    data write lands in the version's own immutable directory, so a
    crashed commit never perturbs any committed version.

    ``batch_id`` makes the commit IDEMPOTENT under foreachBatch's
    at-least-once replay: when the latest committed manifest already
    carries this batch_id, the commit is a no-op returning that version
    — a restarted stream re-offering the last micro-batch cannot
    double-append it (``streaming_sink`` wires this up)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_versions_dir(path), exist_ok=True)
    cur = latest_version(path)
    if (
        batch_id is not None
        and cur is not None
        and read_manifest(path, cur).get("batch_id") == batch_id
    ):
        return cur
    n = 0 if cur is None else cur + 1
    vdir = os.path.join(path, "data", f"v{n}")
    # overwrite absorbs orphans from a previous crashed attempt at n
    df.write.mode("overwrite").parquet(vdir)
    new_files = _list_parquet(vdir)
    base = (
        read_manifest(path, cur)["files"]
        if (mode == "append" and cur is not None)
        else []
    )
    manifest = {
        "version": n,
        "mode": mode,
        "files": base + new_files,
        "schema": df.schema.json(),
    }
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    with open(_manifest_path(path, n), "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    _swap_pointer(path, n)
    return n


def streaming_sink(path: str, mode: str = "append"):
    """A ``foreachBatch`` function committing each micro-batch as one
    table version: ``stream.writeStream.foreachBatch(
    streaming_sink(path)).start()``.  Exactly-once table state over
    at-least-once delivery via the manifest's batch_id (a replayed last
    batch is recognized and skipped), the same discipline as the
    streaming IVF/rollup sinks."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        commit_version(batch_df, path, mode=mode, batch_id=int(batch_id))

    return _sink


def diff_versions(
    spark: SparkSession, path: str, a: int, b: int
) -> tuple[DataFrame, DataFrame]:
    """(added, removed) row sets between versions ``a`` → ``b`` — two
    anti-joins over the exact file sets, for audits ("what did that
    load change?") and incremental downstream refresh."""
    da = read_version(spark, path, a)
    db = read_version(spark, path, b)
    cols = da.columns
    added = db.join(da, cols, "left_anti")
    removed = da.join(db, cols, "left_anti")
    return added, removed


def read_version(spark: SparkSession, path: str, n: int) -> DataFrame:
    """The exact file set of version ``n`` — immune to later commits,
    compactions, and (retention permitting) vacuums."""
    files = read_manifest(path, n)["files"]
    if not files:
        import pyspark.sql.types as T

        return spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(read_manifest(path, n)["schema"]))
        )
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(*files)


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    cur = latest_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    return read_version(spark, path, cur)


def compact_version(
    spark: SparkSession, path: str, target_files: int = 1
) -> int:
    """Rewrite the current file set into ``target_files`` files as a new
    version.  No rename window: every committed version stays readable
    throughout; old files are reclaimed only by ``vacuum``."""
    cur = latest_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    df = read_version(spark, path, cur).coalesce(target_files)
    return commit_version(df, path, mode="overwrite")


def rollback(path: str, n: int) -> int:
    """Commit a new version whose file set is version ``n``'s (history
    stays linear and append-only — the bad versions remain inspectable
    until vacuumed)."""
    cur = latest_version(path)
    if cur is None or n > cur:
        raise ValueError(f"cannot roll back to {n}: latest is {cur}")
    old = read_manifest(path, n)
    m = cur + 1
    manifest = {
        "version": m,
        "mode": "rollback",
        "rolled_back_to": n,
        "files": old["files"],
        "schema": old["schema"],
    }
    with open(_manifest_path(path, m), "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    _swap_pointer(path, m)
    return m


def vacuum(path: str, keep: int = 2) -> list[str]:
    """Delete data files referenced by NO retained manifest (the last
    ``keep`` versions).  Returns the deleted paths.  Readers pinned to
    expired versions break — retention is the reader contract."""
    cur = latest_version(path)
    if cur is None:
        return []
    retained = range(max(0, cur - keep + 1), cur + 1)
    live = set()
    for n in retained:
        live.update(read_manifest(path, n)["files"])
    deleted = []
    data_root = os.path.join(path, "data")
    for root, _dirs, files in os.walk(data_root):
        for f in files:
            p = os.path.join(root, f)
            if f.endswith(".parquet") and p not in live:
                os.remove(p)
                deleted.append(p)
    # expired manifests go too, so time travel fails loudly, not wrongly
    for f in os.listdir(_versions_dir(path)):
        n = int(f[1:-5]) if f.startswith("v") and f.endswith(".json") else None
        if n is not None and n not in retained:
            os.remove(os.path.join(_versions_dir(path), f))
    return sorted(deleted)
