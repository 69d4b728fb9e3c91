"""Manifest-versioned parquet tables (lakehouse-lite): snapshot
isolation, time travel, rollback, vacuum, optimistic concurrency — no
table-format dependency.

Plain ``spark.read.parquet(dir)`` has two failure classes at scale:
readers see half-written output of a concurrent writer, and any
compaction/overwrite needs a rename window where the directory is
inconsistent (the round-4 ``sources/compact.py`` swap mitigates but
cannot eliminate it).  The fix every table format (Iceberg/Delta/Hudi)
uses is indirection: data files are IMMUTABLE, a manifest names the
exact file set of a version, and the versioned manifest file itself is
the commit.  This module implements the minimal form:

    {path}/data/v{N}-{token}/part-*.parquet   immutable once committed
    {path}/_versions/v{N}.json                file list + meta = COMMIT of N
    {path}/_latest                            hint file: just "N"

All metadata IO goes through the filesystem shim (``sources/fsio.py``):
the Hadoop FileSystem API on classic PySpark — so manifests land on the
SAME scheme as the data files (HDFS/S3A/file), never silently on the
driver's local disk — with a pure-Python fallback for local paths under
Spark Connect.

**Commit protocol (optimistic concurrency, Delta-style).**  A commit of
version N writes its data files under a PRIVATE attempt directory
(``data/v{N}-{token}`` — concurrent writers can never interleave files),
then claims N by EXCLUSIVE-CREATE of ``_versions/v{N}.json``.  The
manifest create is the atomic commit point:

- two concurrent writers targeting the same N → exactly one create
  succeeds.  A losing APPEND auto-rebases (Delta-style logical conflict
  resolution): a blind append reads nothing from the table and its
  attempt directory is disjoint from every other writer's files by
  construction, so the loser re-reads the winner's manifest and
  re-claims N+1 with its already-written files — both appenders commit.
  A losing MERGE/DELETE rebases too when its touched-file set is
  DISJOINT from everything the winner chain removed (r8,
  WriteSerializable — the file-level check Delta defaults to): it
  carries the winner's files, swaps in its own rewrites, re-claims.
  Overlapping removals, a schema change mid-flight, or a losing
  overwrite/rollback get ``VersionConflictError`` and delete their own
  attempt directory (manual retry = re-read latest, redo);
- a crash BEFORE the manifest create leaves only an unreferenced attempt
  directory — invisible to every reader, reclaimed by ``vacuum``;
- a crash AFTER the manifest create is a DURABLE commit (the ``_latest``
  hint may be stale; readers probe forward, below).

On HDFS ``create(overwrite=false)`` is an atomic namespace op; on local
paths an O_EXCL create; on object stores a conditional PUT where the
Hadoop connector supports it (older connectors degrade to
check-then-create — serialize writers there, same caveat as Delta on
S3 without a LogStore).

**``_latest`` is a hint, not the truth.**  It is rewritten (atomically,
temp + rename) after every successful commit, but ``latest_version``
verifies it against the manifest directory and probes FORWARD for
manifests the hint doesn't know about — so a crash between manifest
create and hint update can never hide a committed version, and a
corrupt/missing hint degrades to a directory listing, never a wrong
answer.

- **read_latest / read_version**: load the manifest's exact file list —
  a reader holding version N is immune to later commits, compactions
  and vacuums (old files are deleted only when no retained version
  references them).
- **compact_version**: rewrites the CURRENT file set into fewer files
  as a NEW version — readers of old versions keep their files; there is
  no moment where the table path is missing or mixed.
- **rollback(n)**: commits a new version whose file set is version n's
  — history stays linear and append-only, like Iceberg's rollback.
- **vacuum(keep)**: deletes data files unreferenced by the retained
  manifests (which also reclaims crashed/losing attempt directories).
  Retention is the reader contract: vacuum(keep=k) breaks readers
  pinned to versions older than latest-k+1, same as any table format's
  expire-snapshots.

**Log-structured manifests (r10).**  A naive manifest stores the FULL
file list, so commit cost is O(total files): at ~10⁵–10⁶ files (100 TB)
every small append rewrites megabytes of metadata.  Instead, a commit
records a DELTA against its parent — ``{"base": N-1, "add": [...],
"remove_tails": [...], "add_stats": {...}}`` — and every
``_CHECKPOINT_EVERY``-th version (plus every overwrite/rollback, whose
delta would be the whole table anyway) is a FULL checkpoint, so commit
bytes are O(files touched) and a reader reconstructs any version from
the nearest checkpoint plus at most ``_CHECKPOINT_EVERY - 1`` tail
records (Delta Lake's log + checkpoint.parquet shape).  The encoder
REPLAYS the delta against the parent before writing and falls back to
a full record on any mismatch, so a delta in the log is correct by
construction.  The exclusive-create commit point, rebase semantics and
the logical manifest shape returned by ``read_manifest`` are all
unchanged — the delta encoding is invisible above this module.
``vacuum`` rewrites any retained delta whose parent falls outside
retention as a full record before deleting expired manifests, keeping
every retained chain self-contained.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .fsio import get_fs


class VersionConflictError(RuntimeError):
    """A concurrent writer committed this version number first."""


# how many times a losing APPEND re-reads the winner and re-claims
# before giving up (appends never logically conflict — the bound only
# guards against a pathological stream of faster writers)
_APPEND_REBASE_RETRIES = 10


def _versions_dir(path: str) -> str:
    return path.rstrip("/") + "/_versions"


def _pointer(path: str) -> str:
    return path.rstrip("/") + "/_latest"


def _manifest_path(path: str, n: int) -> str:
    return f"{_versions_dir(path)}/v{n}.json"


def _try_read_manifest(fs, path: str, n: int) -> dict | None:
    """The manifest for version ``n``, or None when absent or not yet
    fully written (a torn claim from a crashed writer on a backend
    without atomic create — never trusted as a commit)."""
    mp = _manifest_path(path, n)
    if not fs.exists(mp):
        return None
    try:
        return json.loads(fs.read_bytes(mp).decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return None


def latest_version(path: str, spark: SparkSession | None = None) -> int | None:
    """The highest committed version, or None for an empty table.

    The ``_latest`` hint is a starting point only: committed manifests
    past it (crash between commit and hint update) are found by probing
    forward; a missing/corrupt hint degrades to listing the manifest
    directory.  A manifest's existence — not the hint — is what makes a
    version committed."""
    fs = get_fs(spark, path)
    hint: int | None = None
    if fs.exists(_pointer(path)):
        try:
            hint = int(fs.read_bytes(_pointer(path)).decode("utf-8").strip())
        except (ValueError, UnicodeDecodeError):
            hint = None
    if hint is None or _try_read_manifest(fs, path, hint) is None:
        ns = [
            int(name[1:-5])
            for name in fs.list_names(_versions_dir(path))
            if name.startswith("v")
            and name.endswith(".json")
            and name[1:-5].isdigit()
        ]
        committed = [n for n in sorted(ns) if _try_read_manifest(fs, path, n)]
        hint = max(committed) if committed else None
        if hint is None:
            return None
    # probe forward past the hint — a committed manifest the hint missed
    n = hint
    while _try_read_manifest(fs, path, n + 1) is not None:
        n += 1
    return n


# every k-th version is a full checkpoint; the versions between carry
# O(files-touched) delta records (see module docstring)
_CHECKPOINT_EVERY = 16


def _replay(base: dict, rec: dict) -> dict:
    """Apply one delta record to its parent's LOGICAL manifest:
    surviving files keep their order, removed basenames drop their
    stats, added files append (the exact shape every writer builds)."""
    files = base["files"]
    stats = dict(base.get("stats", {}))
    rt = set(rec.get("remove_tails", ()))
    if rt:
        files = [f for f in files if f.rsplit("/", 1)[-1] not in rt]
        for t in rt:
            stats.pop(t, None)
    files = files + rec.get("add", [])
    stats.update(rec.get("add_stats", {}))
    out = {
        "version": rec["version"],
        "mode": rec["mode"],
        "files": files,
        "schema": rec["schema"],
    }
    if stats:
        out["stats"] = stats
    for k in ("batch_id", "rolled_back_to"):
        if k in rec:
            out[k] = rec[k]
    return out


def _reconstruct(fs, path: str, raw: dict) -> dict:
    """Logical manifest for a raw record: full records pass through,
    delta records walk back to the nearest checkpoint and replay
    forward (≤ _CHECKPOINT_EVERY - 1 tail reads)."""
    chain = [raw]
    m = raw
    while "base" in m:
        b = _try_read_manifest(fs, path, m["base"])
        if b is None:
            raise IOError(
                f"manifest chain for v{raw['version']} at {path} is "
                f"broken at v{m['base']} (vacuumed or torn)"
            )
        chain.append(b)
        m = b
    out = chain[-1]
    for rec in reversed(chain[:-1]):
        out = _replay(out, rec)
    return out


def _as_record(manifest: dict, prev: dict | None) -> dict:
    """The on-disk record for a logical manifest: a delta against its
    parent when one applies, a full checkpoint every
    ``_CHECKPOINT_EVERY`` versions and for overwrite/rollback (whose
    delta would be table-sized).  The delta is written ONLY if
    replaying it over the parent reproduces the logical manifest
    exactly — any drift (file order, stats) falls back to a full
    record, so correctness never depends on the encoding."""
    n = manifest["version"]
    if (
        prev is None
        or prev.get("version") != n - 1
        or n % _CHECKPOINT_EVERY == 0
        or manifest["mode"] in ("overwrite", "rollback")
    ):
        return manifest
    prev_files = prev["files"]
    prev_set = set(prev_files)
    fset = set(manifest["files"])
    add = [f for f in manifest["files"] if f not in prev_set]
    remove_tails = sorted(
        f.rsplit("/", 1)[-1] for f in prev_files if f not in fset
    )
    prev_stats = prev.get("stats", {})
    add_stats = {
        t: v
        for t, v in manifest.get("stats", {}).items()
        if prev_stats.get(t) != v
    }
    rec = {
        "version": n,
        "mode": manifest["mode"],
        "base": n - 1,
        "add": add,
        "remove_tails": remove_tails,
        "schema": manifest["schema"],
    }
    if add_stats:
        rec["add_stats"] = add_stats
    if "batch_id" in manifest:
        rec["batch_id"] = manifest["batch_id"]
    if _replay(prev, rec) != manifest:
        return manifest
    return rec


def read_manifest(path: str, n: int, spark: SparkSession | None = None) -> dict:
    fs = get_fs(spark, path)
    m = _try_read_manifest(fs, path, n)
    if m is None:
        raise FileNotFoundError(_manifest_path(path, n))
    return _reconstruct(fs, path, m)


def _write_hint(fs, path: str, n: int) -> None:
    # best-effort: latest_version never trusts the hint blindly, so a
    # crash mid-update (or a scheme without atomic overwrite) is safe
    fs.write_bytes(_pointer(path), str(n).encode(), overwrite=True)


def _claim_version(fs, path: str, n: int, manifest: dict) -> None:
    """Atomically commit ``manifest`` as version ``n`` via exclusive
    create; ``VersionConflictError`` if a concurrent writer won.  A torn
    claim (file exists but unreadable — crashed writer on a backend
    without atomic create) is repaired once and the claim retried."""
    data = json.dumps(manifest).encode()
    mp = _manifest_path(path, n)
    for attempt in (0, 1):
        try:
            fs.write_bytes(mp, data, overwrite=False)
            return
        except FileExistsError:
            if _try_read_manifest(fs, path, n) is not None:
                raise VersionConflictError(
                    f"version {n} at {path} was committed concurrently"
                ) from None
            if attempt == 1:
                raise IOError(
                    f"torn manifest claim persists at {mp}; repair failed"
                ) from None
            fs.delete(mp, recursive=False)


def _list_parquet(fs, d: str) -> list[str]:
    return [
        f"{d.rstrip('/')}/{name}"
        for name in fs.list_names(d)
        if name.endswith(".parquet") and not name.startswith(".")
    ]


def _evolve_schema(old_json: str, new_schema) -> str:
    """Union schema for an append: old columns keep their position and
    type, genuinely new columns are added at the end (old files read
    them as NULL).  A same-name/different-type collision raises — the
    silent-coercion failure mode every table format rejects."""
    import pyspark.sql.types as T

    old = T.StructType.fromJson(json.loads(old_json))
    by_name = {f.name: f for f in old.fields}
    merged = list(old.fields)
    for f in new_schema.fields:
        prev = by_name.get(f.name)
        if prev is None:
            merged.append(T.StructField(f.name, f.dataType, True))
        elif prev.dataType != f.dataType:
            raise ValueError(
                f"schema evolution conflict on column {f.name!r}: "
                f"{prev.dataType.simpleString()} vs "
                f"{f.dataType.simpleString()}"
            )
    return T.StructType(merged).json()


def _file_stats(
    spark: SparkSession, files: list[str], stats_cols: list[str]
) -> dict:
    """Per-file [min, max] for ``stats_cols`` over exactly ``files`` —
    one narrow aggregate over the NEW files only (never the whole
    table), the write-side half of manifest data-skipping."""
    from pyspark.sql import functions as F

    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"_lo_{c}"))
        aggs.append(F.max(c).alias(f"_hi_{c}"))
    rows = (
        spark.read.parquet(*files)
        .groupBy(F.col("_metadata.file_path").alias("_f"))
        .agg(*aggs)
        .collect()
    )

    def plain(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    out = {}
    for r in rows:
        # _metadata.file_path is a file: URI; key stats by basename so
        # lookup is path-form independent
        base = r["_f"].rsplit("/", 1)[-1]
        out[base] = {
            c: [plain(r[f"_lo_{c}"]), plain(r[f"_hi_{c}"])]
            for c in stats_cols
        }
    return out


def commit_version(
    df: DataFrame,
    path: str,
    mode: str = "append",
    batch_id: int | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Write ``df`` as the next table version; returns its number.

    ``mode="append"``: the new version's file set is the current one
    plus the new files — with SCHEMA EVOLUTION: new columns union onto
    the stored schema (old files read them as NULL), same-name type
    conflicts raise.  ``mode="overwrite"``: new files only, new schema.
    The data write lands in a private attempt directory, so a crashed
    or losing commit never perturbs any committed version; the
    exclusive manifest create is the commit point (see module
    docstring).

    ``batch_id`` makes the commit IDEMPOTENT under foreachBatch's
    at-least-once replay: when the latest committed manifest already
    carries this batch_id, the commit is a no-op returning that version
    — a restarted stream re-offering the last micro-batch cannot
    double-append it (``streaming_sink`` wires this up).

    ``stats_cols`` records per-file [min, max] for those columns in the
    manifest (one narrow aggregate over the NEW files only) — the
    data-skipping index ``read_version_pruned`` uses to open only
    overlapping files, every table format's file-level zone map."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    fs = get_fs(spark, path)
    fs.mkdirs(_versions_dir(path))
    cur = latest_version(path, spark)
    if (
        batch_id is not None
        and cur is not None
        and read_manifest(path, cur, spark).get("batch_id") == batch_id
    ):
        return cur
    n = 0 if cur is None else cur + 1
    token = uuid.uuid4().hex[:8]
    vdir = f"{path.rstrip('/')}/data/v{n}-{token}"
    df.write.mode("overwrite").parquet(vdir)
    new_files = _list_parquet(fs, vdir)
    new_stats = (
        _file_stats(spark, new_files, stats_cols) if stats_cols else {}
    )

    def _manifest_at(cur_v: int | None) -> tuple[dict, dict | None]:
        base: list[str] = []
        schema_json = df.schema.json()
        stats: dict = {}
        prev: dict | None = None
        if mode == "append" and cur_v is not None:
            prev = read_manifest(path, cur_v, spark)
            base = prev["files"]
            schema_json = _evolve_schema(prev["schema"], df.schema)
            stats = dict(prev.get("stats", {}))
        stats.update(new_stats)
        m = {
            "version": 0 if cur_v is None else cur_v + 1,
            "mode": mode,
            "files": base + new_files,
            "schema": schema_json,
        }
        if stats:
            m["stats"] = stats
        if batch_id is not None:
            m["batch_id"] = batch_id
        return m, prev

    manifest, prev_logical = _manifest_at(cur)
    for _ in range(_APPEND_REBASE_RETRIES + 1):
        try:
            _claim_version(fs, path, n, _as_record(manifest, prev_logical))
            _write_hint(fs, path, n)
            return n
        except VersionConflictError:
            if mode != "append":
                # the loser retires its own attempt dir so the conflict
                # leaves no orphan for vacuum to chase
                fs.delete(vdir, recursive=True)
                raise
            # Delta-style logical conflict resolution: a blind append
            # reads NOTHING from the table, so a concurrent commit can
            # never invalidate it — its private attempt directory is
            # disjoint from every other writer's file set by
            # construction.  Rebase: re-read the winner's manifest and
            # re-claim on top of it.  Data files are immutable and
            # already written; only the manifest is recomputed (schema
            # re-evolved against the winner's — a type conflict there is
            # a REAL conflict and still raises).
            cur = latest_version(path, spark)
            if (
                batch_id is not None
                and cur is not None
                and read_manifest(path, cur, spark).get("batch_id")
                == batch_id
            ):
                fs.delete(vdir, recursive=True)
                return cur
            try:
                manifest, prev_logical = _manifest_at(cur)
            except ValueError:
                fs.delete(vdir, recursive=True)
                raise
            n = manifest["version"]
    fs.delete(vdir, recursive=True)
    raise VersionConflictError(
        f"append to {path} lost the commit race "
        f"{_APPEND_REBASE_RETRIES + 1} times; giving up"
    )


def _commit_file_set(
    spark: SparkSession,
    path: str,
    prev: dict,
    files: list[str],
    mode: str,
    stats: dict,
) -> int:
    """CAS-commit an explicit file set as the next version (the shared
    tail of merge/delete): same claim protocol as commit_version.

    The claimed number is ``prev["version"] + 1`` — the version the file
    set was DERIVED from — never a re-read of latest: if a concurrent
    commit landed after the caller read ``prev``, claiming latest+1
    would succeed while silently dropping that commit's files from the
    new manifest (lost update); claiming prev+1 makes the race surface
    as a conflict.

    A LOSING commit then tries Delta-style file-set conflict resolution
    (VERDICT r7 task 6): diff the winner chain's manifest against
    ``prev`` — if the winner REMOVED none of the files this commit
    rewrote (and the schema is unchanged), the two writers touched
    disjoint files, so the loser rebases: carry the winner's file set,
    minus the files this commit rewrote, plus its own new files, and
    re-claim.  Overlapping removals (or a schema change mid-flight)
    still raise ``VersionConflictError``.  This is WriteSerializable
    isolation — the file-level check Delta defaults to: a concurrent
    blind append's rows are NOT re-scanned by this commit's predicate,
    and a concurrent rewrite of an untouched file carries the winner's
    version of those rows."""
    fs = get_fs(spark, path)
    prev_set = set(prev["files"])
    removed = prev_set - set(files)  # files this commit rewrote
    added = [f for f in files if f not in prev_set]
    added_tails = {f.rsplit("/", 1)[-1] for f in added}
    removed_tails = {f.rsplit("/", 1)[-1] for f in removed}
    base = prev
    out_files = files
    out_stats = stats
    for _ in range(_APPEND_REBASE_RETRIES + 1):
        n = base["version"] + 1
        manifest = {
            "version": n,
            "mode": mode,
            "files": out_files,
            "schema": prev["schema"],
        }
        if out_stats:
            manifest["stats"] = out_stats
        try:
            _claim_version(fs, path, n, _as_record(manifest, base))
            _write_hint(fs, path, n)
            return n
        except VersionConflictError:
            cur = latest_version(path, spark)
            winner = read_manifest(path, cur, spark)
            if winner["schema"] != prev["schema"]:
                raise VersionConflictError(
                    f"{mode} to {path} conflicts with a concurrent "
                    "schema-changing commit"
                )
            winner_removed = prev_set - set(winner["files"])
            if winner_removed & removed:
                raise VersionConflictError(
                    f"{mode} to {path} rewrote files a concurrent commit "
                    f"also removed ({len(winner_removed & removed)} "
                    "overlapping); not auto-resolvable"
                )
            # The rebase drops the loser's rewritten files from the
            # winner's manifest by basename tail (part filenames embed
            # a job UUID, so tails are unique per writer) — but guard
            # against a pathological tail collision with a file the
            # winner chain ADDED, which the filter would silently drop
            # (ADVICE r8).
            winner_added_tails = {
                f.rsplit("/", 1)[-1]
                for f in set(winner["files"]) - prev_set
            }
            if winner_added_tails & removed_tails:
                raise VersionConflictError(
                    f"{mode} to {path}: a concurrently added file shares "
                    "a basename with a file this commit rewrote; "
                    "not auto-resolvable"
                )
            out_files = [
                f
                for f in winner["files"]
                if f.rsplit("/", 1)[-1] not in removed_tails
            ] + added
            w_stats = dict(winner.get("stats", {}))
            for t in removed_tails:
                w_stats.pop(t, None)
            w_stats.update(
                {t: v for t, v in stats.items() if t in added_tails}
            )
            out_stats = w_stats
            base = winner
    raise VersionConflictError(
        f"{mode} to {path} lost the commit race "
        f"{_APPEND_REBASE_RETRIES + 1} times; giving up"
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    stats_cols: list[str] | None = None,
) -> dict:
    """Copy-on-write MERGE (upsert by key) into a versioned table:
    rewrite ONLY the files that contain a matched key; every untouched
    file carries over into the new version's manifest unchanged — at
    100 TB an upsert of a small batch rewrites a handful of files, not
    the table.

    File targeting is two-stage: the manifest zone map for ``key_col``
    (when recorded) prunes to range-overlapping candidates WITHOUT
    opening anything, then a semi-join over just those candidates finds
    the files actually holding matched keys (file-count-bounded driver
    list).  Rewritten = candidate rows with matched keys anti-joined
    out, plus ALL update rows (unmatched keys insert).  Readers of old
    versions keep their exact files.  Concurrent writers touching
    DISJOINT files both commit (the losing commit rebases onto the
    winner's manifest — see ``_commit_file_set``); overlapping rewrites
    raise ``VersionConflictError``."""
    from pyspark.sql import functions as F

    fs = get_fs(spark, path)
    cur = latest_version(path, spark)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    prev = read_manifest(path, cur, spark)
    stats = dict(prev.get("stats", {}))

    bounds = updates.agg(
        F.min(key_col).alias("_lo"), F.max(key_col).alias("_hi")
    ).first()
    # manifest stats were JSON-serialized through _file_stats' plain()
    # (timestamps/dates → isoformat strings); normalize the live bounds
    # the same way so the overlap compare never mixes str and datetime
    # (isoformat order == chronological order for a uniform format)
    def _plain(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    b_lo, b_hi = _plain(bounds["_lo"]), _plain(bounds["_hi"])
    candidates = []
    untouched = []
    for f in prev["files"]:
        st = stats.get(f.rsplit("/", 1)[-1], {}).get(key_col)
        if (
            st is None
            or st[0] is None
            or b_lo is None
            or (st[0] <= b_hi and st[1] >= b_lo)
        ):
            candidates.append(f)
        else:
            untouched.append(f)
    touched: list[str] = []
    if candidates and bounds["_lo"] is not None:
        import pyspark.sql.types as T

        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        cand = (
            spark.read.schema(schema)
            .parquet(*candidates)
            .withColumn("_f", F.col("_metadata.file_path"))
        )
        keys = updates.select(key_col).distinct()
        touched_rows = (
            cand.join(F.broadcast(keys), key_col, "left_semi")
            .select("_f")
            .distinct()
            .collect()
        )
        touched_tails = {r["_f"].rsplit("/", 1)[-1] for r in touched_rows}
        touched = [
            f for f in candidates if f.rsplit("/", 1)[-1] in touched_tails
        ]
        untouched += [f for f in candidates if f not in touched]
    else:
        untouched += candidates

    import pyspark.sql.types as T

    table_cols = [
        f.name for f in T.StructType.fromJson(json.loads(prev["schema"]))
    ]
    ups = updates.select(*table_cols)  # conform to the table schema
    n_next = cur + 1
    token = uuid.uuid4().hex[:8]
    vdir = f"{path.rstrip('/')}/data/v{n_next}-{token}"
    if touched:
        keep = _read_files(spark, path, prev, touched).join(
            F.broadcast(ups.select(key_col).distinct()),
            key_col,
            "left_anti",
        )
        out = keep.unionByName(ups)
    else:
        out = ups
    out.write.mode("overwrite").parquet(vdir)
    new_files = _list_parquet(fs, vdir)
    if stats_cols:
        stats.update(_file_stats(spark, new_files, stats_cols))
    for f in touched:
        stats.pop(f.rsplit("/", 1)[-1], None)
    try:
        v = _commit_file_set(
            spark, path, prev, untouched + new_files, "merge", stats
        )
    except VersionConflictError:
        fs.delete(vdir, recursive=True)
        raise
    return {
        "version": v,
        "files_rewritten": len(touched),
        "files_carried": len(untouched),
    }


def delete_where(
    spark: SparkSession,
    path: str,
    predicate: str,
    stats_cols: list[str] | None = None,
) -> dict:
    """Copy-on-write DELETE: rewrite only the files that contain rows
    matching ``predicate`` (a SQL boolean expression); files with no
    matches carry over unchanged.  Targeting opens each file's rows
    once (a count-per-file aggregate); combine with a zone-mapped
    column in the predicate by running ``read_version_pruned``-style
    maintenance for very large tables."""
    from pyspark.sql import functions as F

    fs = get_fs(spark, path)
    cur = latest_version(path, spark)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    prev = read_manifest(path, cur, spark)
    stats = dict(prev.get("stats", {}))
    full = read_version(spark, path, cur).withColumn(
        "_f", F.col("_metadata.file_path")
    )
    touched_tails = {
        r["_f"].rsplit("/", 1)[-1]
        for r in full.filter(predicate).select("_f").distinct().collect()
    }
    touched = [
        f for f in prev["files"] if f.rsplit("/", 1)[-1] in touched_tails
    ]
    untouched = [f for f in prev["files"] if f not in touched]
    new_files: list[str] = []
    vdir = None
    if touched:
        token = uuid.uuid4().hex[:8]
        vdir = f"{path.rstrip('/')}/data/v{cur + 1}-{token}"
        (
            _read_files(spark, path, prev, touched)
            # SQL DELETE removes rows where the predicate is TRUE only;
            # a bare NOT(pred) would also drop NULL-evaluating rows
            # (e.g. "x > 5" on x IS NULL) — coalesce keeps them
            .filter(f"NOT coalesce(({predicate}), false)")
            .write.mode("overwrite")
            .parquet(vdir)
        )
        new_files = _list_parquet(fs, vdir)
        if stats_cols:
            stats.update(_file_stats(spark, new_files, stats_cols))
    for f in touched:
        stats.pop(f.rsplit("/", 1)[-1], None)
    try:
        v = _commit_file_set(
            spark, path, prev, untouched + new_files, "delete", stats
        )
    except VersionConflictError:
        if vdir is not None:
            fs.delete(vdir, recursive=True)
        raise
    return {
        "version": v,
        "files_rewritten": len(touched),
        "files_carried": len(untouched),
    }


def commit_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "append",
    batch_id: int | None = None,
) -> int:
    """Commit with Z-curve file clustering + the zone map recorded for
    every clustered column: ``repartitionByRange`` on the Morton key
    gives each file a tight hyper-rectangle in ALL ``zorder_cols``, so
    ``read_version_pruned`` skips files on ANY of them — Delta's
    ``OPTIMIZE ZORDER BY`` + stats collection as one commit.  Columns
    must be bucketed into ``[0, 2^bits)`` by the caller (see
    functions/layout.zorder_key)."""
    from pyspark.sql import functions as F

    from ..functions.layout import zorder_key

    keyed = df.withColumn(
        "_zkey", zorder_key([F.col(c) for c in zorder_cols], bits)
    )
    parts = (
        keyed.repartitionByRange(num_files, "_zkey")
        if num_files
        else keyed.repartitionByRange("_zkey")
    )
    clustered = parts.sortWithinPartitions("_zkey").drop("_zkey")
    return commit_version(
        clustered, path, mode=mode, batch_id=batch_id,
        stats_cols=list(zorder_cols),
    )


def read_changes(
    spark: SparkSession, path: str, since: int, until: int | None = None
) -> DataFrame:
    """Incremental consumption (append-only CDC): the rows ADDED after
    version ``since`` up to ``until`` (default latest), computed as a
    FILE-SET difference between the two manifests — zero joins, zero
    scans of pre-existing data, the incremental-refresh primitive a
    downstream pipeline polls.  Requires every intermediate version to
    be an append (or rollback-free merge history would lie about rows);
    any overwrite/delete/merge/rollback in the range raises with
    guidance to use ``diff_versions`` (which compares row sets, at
    full-scan cost) instead."""
    cur = latest_version(path, spark)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    if until is None:
        until = cur
    if not 0 <= since <= until <= cur:
        raise ValueError(f"bad version range [{since}, {until}] (latest {cur})")
    for n in range(since + 1, until + 1):
        mode = read_manifest(path, n, spark)["mode"]
        if mode != "append":
            raise ValueError(
                f"version {n} is {mode!r}, not an append: file-diff CDC "
                "would be wrong — use diff_versions for row-level diff"
            )
    old = set(read_manifest(path, since, spark)["files"])
    m = read_manifest(path, until, spark)
    added = [f for f in m["files"] if f not in old]
    return _read_files(spark, path, m, added)


def sync_changes(
    spark: SparkSession, src_path: str, cursor_path: str, apply_fn
) -> int | None:
    """Pull-based exactly-once downstream refresh: read the rows added
    to ``src_path`` since the last synced version (``read_changes``),
    hand them to ``apply_fn(df, since, until)``, then advance the
    cursor — a tiny JSON file written through the filesystem shim, so
    the cursor lives next to whatever scheme the consumer uses.

    Crash semantics: the cursor advances only AFTER ``apply_fn``
    returns, so a crash mid-apply re-delivers the same change set on
    the next call — at-least-once delivery; make ``apply_fn``
    idempotent (e.g. commit into another versioned table keyed by
    ``until`` as the batch_id, which this composes with) and the
    pipeline is exactly-once end-to-end.  Returns the new cursor
    version, or None when there was nothing to sync."""
    fs = get_fs(spark, cursor_path)
    since = -1
    if fs.exists(cursor_path):
        since = json.loads(fs.read_bytes(cursor_path).decode())["version"]
    until = latest_version(src_path, spark)
    if until is None or until <= since:
        return None
    if since < 0:
        changes = read_version(spark, src_path, until)  # bootstrap: all
    else:
        changes = read_changes(spark, src_path, since, until)
    apply_fn(changes, since, until)
    fs.write_bytes(
        cursor_path, json.dumps({"version": until}).encode(), overwrite=True
    )
    return until


def table_history(
    path: str, spark: SparkSession | None = None
) -> list[dict]:
    """The audit view: one row per retained version, oldest first —
    version, mode, file count, batch_id (when present), rolled_back_to
    (when a rollback).  Reads manifests only; never opens data files."""
    fs = get_fs(spark, path)
    cur = latest_version(path, spark)
    if cur is None:
        return []
    out = []
    for name in fs.list_names(_versions_dir(path)):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        digits = name[1:-5]
        if not digits.isdigit():
            continue
        m = _try_read_manifest(fs, path, int(digits))
        if m is None:
            continue
        if "base" in m:  # delta record: n_files needs the logical view
            m = _reconstruct(fs, path, m)
        row = {
            "version": m["version"],
            "mode": m["mode"],
            "n_files": len(m["files"]),
        }
        for k in ("batch_id", "rolled_back_to"):
            if k in m:
                row[k] = m[k]
        out.append(row)
    return sorted(out, key=lambda r: r["version"])


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
    compactions, and (retention permitting) vacuums.  Reads with the
    manifest's STORED schema (no footer merging at plan time; files
    predating an evolved column return NULL for it)."""
    m = read_manifest(path, n, spark)
    return _read_files(spark, path, m, m["files"])


def _read_files(
    spark: SparkSession, path: str, manifest: dict, files: list[str]
) -> DataFrame:
    import pyspark.sql.types as T

    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if not files:
        return spark.createDataFrame([], schema)
    spark.catalog.refreshByPath(path)
    return spark.read.schema(schema).parquet(*files)


def read_version_pruned(
    spark: SparkSession,
    path: str,
    n: int,
    col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Version ``n`` restricted to files whose manifest [min, max] for
    ``col`` overlaps [lo, hi] — file-level data skipping from the
    manifest's zone map, BEFORE Spark ever lists or opens a file (the
    move every table format makes: partition pruning without
    partitioning).  Files without recorded stats (or with NULL bounds)
    are conservatively kept, so the result == full scan + filter for
    any data; the caller still applies the row-level predicate (this
    prunes files, not rows).  Pass plain comparable values (numbers /
    strings / isoformat timestamps — the form the stats are stored
    in)."""
    m = read_manifest(path, n, spark)
    stats = m.get("stats", {})
    keep = []
    for f in m["files"]:
        st = stats.get(f.rsplit("/", 1)[-1], {}).get(col)
        if st is None or st[0] is None or st[1] is None:
            keep.append(f)
            continue
        fmin, fmax = st
        if (hi is None or fmin <= hi) and (lo is None or fmax >= lo):
            keep.append(f)
    return _read_files(spark, path, m, keep)


def read_latest_pruned(
    spark: SparkSession, path: str, col: str, lo=None, hi=None
) -> DataFrame:
    cur = latest_version(path, spark)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    return read_version_pruned(spark, path, cur, col, lo, hi)


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    cur = latest_version(path, spark)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    return read_version(spark, path, cur)


def compact_version(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    stats_cols: list[str] | None = None,
) -> int:
    """Rewrite the current file set into ``target_files`` files as a new
    version.  No rename window: every committed version stays readable
    throughout; old files are reclaimed only by ``vacuum``.  Pass
    ``stats_cols`` to re-record the zone map for the compacted files
    (an overwrite drops the old per-file stats with the old files)."""
    cur = latest_version(path, spark)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    df = read_version(spark, path, cur).coalesce(target_files)
    return commit_version(df, path, mode="overwrite", stats_cols=stats_cols)


def rollback(path: str, n: int, spark: SparkSession | None = None) -> int:
    """Commit a new version whose file set is version ``n``'s (history
    stays linear and append-only — the bad versions remain inspectable
    until vacuumed).  Same CAS claim as a data commit, so a rollback
    racing a concurrent commit loses cleanly rather than forking
    history."""
    fs = get_fs(spark, path)
    cur = latest_version(path, spark)
    if cur is None or n > cur:
        raise ValueError(f"cannot roll back to {n}: latest is {cur}")
    old = read_manifest(path, n, spark)
    m = cur + 1
    manifest = {
        "version": m,
        "mode": "rollback",
        "rolled_back_to": n,
        "files": old["files"],
        "schema": old["schema"],
    }
    _claim_version(fs, path, m, manifest)
    _write_hint(fs, path, m)
    return m


def vacuum(path: str, keep: int = 2, spark: SparkSession | None = None) -> list[str]:
    """Delete data files referenced by NO retained manifest (the last
    ``keep`` versions) — including files of crashed or losing commit
    attempts, which no manifest ever referenced.  Returns the deleted
    paths.  Readers pinned to expired versions break — retention is the
    reader contract.  MAINTENANCE CONTRACT: do not run vacuum
    concurrently with writers — it computes the retained set from the
    latest version it sees, so a commit landing mid-vacuum could have
    its manifest swept as "expired future garbage"; serialize vacuum
    with the writer, the same window every table format's
    expire-snapshots needs."""
    fs = get_fs(spark, path)
    cur = latest_version(path, spark)
    if cur is None:
        return []
    retained = range(max(0, cur - keep + 1), cur + 1)
    # retained delta records whose parent is about to expire get
    # rewritten as full checkpoints FIRST, so every retained chain
    # stays self-contained after the expired manifests are deleted
    # (ascending order: deeper chains still resolve while rewriting).
    # Safe under vacuum's no-concurrent-writers contract — the record
    # content is the same logical manifest, re-encoded.
    for n in retained:
        raw = _try_read_manifest(fs, path, n)
        if raw is not None and "base" in raw and raw["base"] < retained[0]:
            full = _reconstruct(fs, path, raw)
            fs.write_bytes(
                _manifest_path(path, n),
                json.dumps(full).encode(),
                overwrite=True,
            )
    live: set[str] = set()
    for n in retained:
        live.update(read_manifest(path, n, spark)["files"])
    deleted = []
    data_root = path.rstrip("/") + "/data"
    for dname in fs.list_dir_names(data_root):
        ddir = f"{data_root}/{dname}"
        kept_any = False
        for f in _list_parquet(fs, ddir):
            if f not in live:
                fs.delete(f, recursive=False)
                deleted.append(f)
            else:
                kept_any = True
        if not kept_any and not _list_parquet(fs, ddir):
            fs.delete(ddir, recursive=True)  # empty attempt/expired dir
    # expired manifests go too, so time travel fails loudly, not wrongly
    for name in fs.list_names(_versions_dir(path)):
        if name.startswith("v") and name.endswith(".json"):
            digits = name[1:-5]
            if digits.isdigit() and int(digits) not in retained:
                fs.delete(f"{_versions_dir(path)}/{name}", recursive=False)
    return sorted(deleted)
