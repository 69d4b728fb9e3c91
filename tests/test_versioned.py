"""Manifest-versioned parquet tables: snapshot isolation, time travel,
crash safety, compaction without a rename window, rollback, vacuum."""

import json
import os

import pytest

from asid_v2_data_pipeline_spark.sources import versioned as V


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_overwrite_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    a = spark.range(0, 3).selectExpr("id", "id * 10 AS x")
    b = spark.range(3, 5).selectExpr("id", "id * 10 AS x")
    v0 = V.commit_version(a, p)
    v1 = V.commit_version(b, p, mode="append")
    assert (v0, v1) == (0, 1)
    assert _rows(V.read_version(spark, p, 0)) == _rows(a)
    assert _rows(V.read_version(spark, p, 1)) == _rows(a.unionAll(b))
    c = spark.range(100, 102).selectExpr("id", "id AS x")
    v2 = V.commit_version(c, p, mode="overwrite")
    assert _rows(V.read_latest(spark, p)) == _rows(c)
    assert _rows(V.read_version(spark, p, 1)) == _rows(a.unionAll(b))
    assert v2 == 2


def test_crashed_commit_is_invisible(spark, tmp_path):
    """Data written but the manifest claim never created (crash before
    the commit point): readers still see the old version; the next
    commit takes the same version number; vacuum reclaims the orphan
    attempt directory."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    # simulate the crash: a private attempt dir with data, no manifest
    orphan = spark.range(900, 999)
    vdir = os.path.join(p, "data", "v1-deadbeef")
    orphan.write.mode("overwrite").parquet(vdir)
    assert V.latest_version(p) == 0
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 3))
    # next commit takes version number 1; the orphan never surfaces
    v = V.commit_version(spark.range(3, 5), p, mode="append")
    assert v == 1
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 5))
    # vacuum reclaims the unreferenced attempt dir
    V.vacuum(p, keep=10)
    assert not os.path.exists(vdir)
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 5))


def test_commit_after_manifest_is_durable(spark, tmp_path):
    """A crash AFTER the manifest create but BEFORE the hint update is a
    durable commit: latest_version probes forward past the stale hint."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    # simulate: write data + manifest exactly as commit_version would,
    # but 'crash' before _write_hint
    extra = spark.range(3, 5)
    vdir = os.path.join(p, "data", "v1-cafef00d")
    extra.write.mode("overwrite").parquet(vdir)
    files = V.read_manifest(p, 0)["files"] + sorted(
        os.path.join(vdir, f)
        for f in os.listdir(vdir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    with open(os.path.join(p, "_versions", "v1.json"), "w") as f:
        json.dump({"version": 1, "mode": "append", "files": files,
                   "schema": extra.schema.json()}, f)
    # hint still says 0, but version 1 is committed
    assert V.latest_version(p) == 1
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 5))
    # and the next commit builds on top of it
    assert V.commit_version(spark.range(5, 6), p, mode="append") == 2


def test_two_writer_conflict_loser_raises(spark, tmp_path):
    """Optimistic concurrency: two writers race version 1; the loser
    gets VersionConflictError, its attempt files never surface, and the
    table state is exactly the winner's manifest."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    winner = spark.range(10, 12)
    loser = spark.range(900, 999)
    # interleave: the loser reads latest (=0), writes its attempt data,
    # but the winner claims v1 first — exactly the lost-update race
    loser_vdir = os.path.join(p, "data", "v1-10053575")
    loser.write.mode("overwrite").parquet(loser_vdir)
    assert V.commit_version(winner, p, mode="append") == 1
    # the loser now tries to claim v1 with its pre-written attempt
    from asid_v2_data_pipeline_spark.sources.fsio import LocalFS

    fs = LocalFS()
    manifest = {"version": 1, "mode": "overwrite",
                "files": V._list_parquet(fs, loser_vdir),
                "schema": loser.schema.json()}
    with pytest.raises(V.VersionConflictError):
        V._claim_version(fs, p, 1, manifest)
    # table state is the winner's
    assert _rows(V.read_latest(spark, p)) == _rows(
        spark.range(0, 3).unionAll(winner)
    )
    # and the full commit_version path raises the same way when racing:
    # simulate by forcing the next version number to collide
    assert V.latest_version(p) == 1


def test_torn_claim_is_repaired(spark, tmp_path):
    """A half-written manifest (crashed writer on a backend without
    atomic create) does not permanently squat the version number: the
    next commit repairs it and commits."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    os.makedirs(os.path.join(p, "_versions"), exist_ok=True)
    with open(os.path.join(p, "_versions", "v1.json"), "w") as f:
        f.write('{"version": 1, "mode": "appe')  # torn mid-write
    # the torn claim is not a committed version
    assert V.latest_version(p) == 0
    v = V.commit_version(spark.range(3, 5), p, mode="append")
    assert v == 1
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 5))


def test_file_scheme_uri_roundtrip(spark, tmp_path):
    """The whole commit/read/rollback cycle works when the table path is
    a ``file:`` URI — metadata goes through the Hadoop FileSystem API
    resolved for the path's scheme, not driver-local os calls."""
    p = "file://" + str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p, mode="append")
    V.commit_version(spark.range(3, 5), p, mode="append")
    assert V.latest_version(p, spark) == 1
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 5))
    v = V.rollback(p, 0, spark)
    assert v == 2
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 3))
    # the metadata physically exists under the local path the URI names
    assert os.path.exists(os.path.join(str(tmp_path / "t"), "_versions", "v2.json"))
    assert os.path.exists(os.path.join(str(tmp_path / "t"), "_latest"))


def test_compact_no_window_and_old_reader_survives(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(4):
        V.commit_version(spark.range(i * 10, i * 10 + 5), p, mode="append")
    before = V.read_latest(spark, p)
    n_files_before = len(V.read_manifest(p, 3)["files"])
    assert n_files_before > 1
    v = V.compact_version(spark, p, target_files=1)
    assert len(V.read_manifest(p, v)["files"]) == 1
    assert _rows(V.read_latest(spark, p)) == _rows(before)
    # a reader pinned to version 3 still reads its exact files
    assert _rows(V.read_version(spark, p, 3)) == _rows(before)


def test_rollback_is_linear_history(spark, tmp_path):
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    V.commit_version(spark.range(0, 99), p, mode="overwrite")  # bad load
    v = V.rollback(p, 0)
    assert v == 2
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 3))
    # the bad version remains inspectable
    assert V.read_version(spark, p, 1).count() == 99
    with pytest.raises(ValueError):
        V.rollback(p, 99)


def test_vacuum_keeps_retained_files_only(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(4):
        V.commit_version(
            spark.range(i, i + 1), p,
            mode="overwrite" if i == 2 else "append",
        )
    deleted = V.vacuum(p, keep=2)
    # versions 2 and 3 retained: v0/v1-only files are gone
    assert deleted and all("/data/v0-" in d or "/data/v1-" in d for d in deleted)
    assert V.read_version(spark, p, 3).count() == 2  # v2 overwrote, v3 appended
    assert _rows(V.read_latest(spark, p)) == [(2,), (3,)]
    with pytest.raises(FileNotFoundError):
        V.read_manifest(p, 0)


def test_batch_id_idempotent_replay(spark, tmp_path):
    p = str(tmp_path / "t")
    v0 = V.commit_version(spark.range(0, 3), p, batch_id=0)
    v1 = V.commit_version(spark.range(3, 5), p, mode="append", batch_id=1)
    # at-least-once: the stream restarts and re-offers batch 1
    v1b = V.commit_version(spark.range(3, 5), p, mode="append", batch_id=1)
    assert (v0, v1, v1b) == (0, 1, 1)
    assert V.read_latest(spark, p).count() == 5  # not 7
    # a NEW batch advances normally
    v2 = V.commit_version(spark.range(5, 6), p, mode="append", batch_id=2)
    assert v2 == 2 and V.read_latest(spark, p).count() == 6


def test_streaming_sink_commits_micro_batches(spark, tmp_path):
    p = str(tmp_path / "t")
    src = str(tmp_path / "src")
    spark.range(0, 4).coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(V.streaming_sink(p))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert V.latest_version(p) is not None
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 4))


def test_diff_versions(spark, tmp_path):
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 4), p)
    V.commit_version(spark.range(2, 6), p, mode="overwrite")
    added, removed = V.diff_versions(spark, p, 0, 1)
    assert _rows(added) == [(4,), (5,)]
    assert _rows(removed) == [(0,), (1,)]


def test_schema_evolution_appends_new_column(spark, tmp_path):
    """Appending a frame with an extra column unions the schema: old
    files read the new column as NULL; a same-name type conflict
    raises instead of coercing."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3).selectExpr("id", "id * 2 AS x"), p)
    V.commit_version(
        spark.range(3, 5).selectExpr("id", "id * 2 AS x", "'tag' AS note"),
        p,
        mode="append",
    )
    latest = V.read_latest(spark, p)
    assert latest.columns == ["id", "x", "note"]
    got = {r["id"]: r["note"] for r in latest.collect()}
    assert got == {0: None, 1: None, 2: None, 3: "tag", 4: "tag"}
    # version 0 keeps its original two-column schema
    assert V.read_version(spark, p, 0).columns == ["id", "x"]
    # type conflict raises
    with pytest.raises(ValueError, match="schema evolution conflict"):
        V.commit_version(
            spark.range(5, 6).selectExpr("id", "'oops' AS x"),
            p,
            mode="append",
        )


def test_stats_pruned_read_skips_files(spark, tmp_path):
    """Per-file [min, max] recorded at commit prune the file set before
    Spark opens anything; results equal full scan + filter."""
    p = str(tmp_path / "t")
    df = (
        spark.range(0, 1000)
        .selectExpr("id", "id AS k")
        .repartitionByRange(5, "k")
    )
    V.commit_version(df, p, stats_cols=["k"])
    m = V.read_manifest(p, 0)
    assert len(m["files"]) == 5 and len(m["stats"]) == 5
    pruned = V.read_latest_pruned(spark, p, "k", lo=100, hi=150)
    assert len(pruned.inputFiles()) < 5
    got = sorted(
        r["id"] for r in pruned.filter("k BETWEEN 100 AND 150").collect()
    )
    assert got == list(range(100, 151))
    # open bounds prune one side only; no-stats columns keep everything
    assert len(V.read_latest_pruned(spark, p, "k", lo=900).inputFiles()) < 5
    assert len(V.read_latest_pruned(spark, p, "id", lo=0).inputFiles()) == 5


def test_stats_survive_appends_and_compaction_rerecords(spark, tmp_path):
    p = str(tmp_path / "t")
    a = spark.range(0, 100).selectExpr("id", "id AS k").repartitionByRange(2, "k")
    b = spark.range(100, 200).selectExpr("id", "id AS k").repartitionByRange(2, "k")
    V.commit_version(a, p, stats_cols=["k"])
    V.commit_version(b, p, mode="append", stats_cols=["k"])
    pruned = V.read_latest_pruned(spark, p, "k", lo=150, hi=199)
    assert len(pruned.inputFiles()) == 1
    assert pruned.filter("k >= 150").count() == 50
    v = V.compact_version(spark, p, target_files=2, stats_cols=["k"])
    assert len(V.read_manifest(p, v)["stats"]) >= 2
    assert V.read_latest(spark, p).count() == 200


def test_merge_upsert_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write MERGE: a small keyed batch rewrites only the files
    holding matched keys (zone-map candidates -> semi-join targeting);
    everything else carries over by reference; old versions intact."""
    p = str(tmp_path / "t")
    base = (
        spark.range(0, 1000)
        .selectExpr("id", "id AS k", "CAST(0 AS INT) AS rev")
        .repartitionByRange(5, "k")
    )
    V.commit_version(base, p, stats_cols=["k"])
    ups = spark.createDataFrame(
        [(50, 50, 1), (60, 60, 1), (5000, 5000, 1)],  # 2 updates + 1 insert
        "id long, k long, rev int",
    )
    r = V.merge_upsert(spark, p, ups, "k", stats_cols=["k"])
    assert r["version"] == 1
    assert r["files_rewritten"] == 1  # keys 50/60 live in one range file
    assert r["files_carried"] == 4
    latest = V.read_latest(spark, p)
    assert latest.count() == 1001
    got = {r["k"]: r["rev"] for r in latest.filter("k IN (50, 60, 61, 5000)").collect()}
    assert got == {50: 1, 60: 1, 61: 0, 5000: 1}
    # snapshot isolation: version 0 is untouched
    v0 = V.read_version(spark, p, 0)
    assert v0.count() == 1000 and v0.filter("rev != 0").count() == 0
    # zone map still prunes after the merge
    pruned = V.read_latest_pruned(spark, p, "k", lo=900, hi=950)
    assert len(pruned.inputFiles()) < 6


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    p = str(tmp_path / "t")
    base = (
        spark.range(0, 400)
        .selectExpr("id", "id AS k")
        .repartitionByRange(4, "k")
    )
    V.commit_version(base, p, stats_cols=["k"])
    r = V.delete_where(spark, p, "k BETWEEN 110 AND 130", stats_cols=["k"])
    assert r["files_rewritten"] == 1 and r["files_carried"] == 3
    latest = V.read_latest(spark, p)
    assert latest.count() == 400 - 21
    assert latest.filter("k BETWEEN 110 AND 130").count() == 0
    assert V.read_version(spark, p, 0).count() == 400
    # deleting nothing carries everything
    r2 = V.delete_where(spark, p, "k > 99999")
    assert r2["files_rewritten"] == 0
    assert V.read_latest(spark, p).count() == 379


def test_table_history_audit_view(spark, tmp_path):
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p, batch_id=0)
    V.commit_version(spark.range(3, 5), p, mode="append")
    V.delete_where(spark, p, "id = 3")
    V.rollback(p, 1)
    h = V.table_history(p)
    assert [r["version"] for r in h] == [0, 1, 2, 3]
    assert [r["mode"] for r in h] == ["append", "append", "delete", "rollback"]
    assert h[0]["batch_id"] == 0 and h[3]["rolled_back_to"] == 1


def test_read_changes_incremental_cdc(spark, tmp_path):
    """File-diff CDC over an append chain: exactly the appended rows,
    no scan of pre-existing files; non-append history raises."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    V.commit_version(spark.range(3, 6), p, mode="append")
    V.commit_version(spark.range(6, 10), p, mode="append")
    assert _rows(V.read_changes(spark, p, 0)) == _rows(spark.range(3, 10))
    assert _rows(V.read_changes(spark, p, 1, 2)) == _rows(spark.range(6, 10))
    assert V.read_changes(spark, p, 2).count() == 0
    # CDC read opens only the appended files
    ch = V.read_changes(spark, p, 1, 2)
    assert set(ch.inputFiles()) <= {
        "file://" + f if not f.startswith("file:") else f
        for f in V.read_manifest(p, 2)["files"]
        if f not in set(V.read_manifest(p, 1)["files"])
    } or len(ch.inputFiles()) == len(
        set(V.read_manifest(p, 2)["files"])
        - set(V.read_manifest(p, 1)["files"])
    )
    V.delete_where(spark, p, "id = 0")
    with pytest.raises(ValueError, match="not an append"):
        V.read_changes(spark, p, 0)
    with pytest.raises(ValueError, match="bad version range"):
        V.read_changes(spark, p, 5)


def test_commit_zordered_prunes_on_every_dimension(spark, tmp_path):
    """Z-curve clustering + zone map: a 2-D grid committed z-ordered
    prunes files on EITHER dimension (a 1-D range layout prunes only
    its sort column)."""
    p = str(tmp_path / "t")
    grid = spark.range(0, 64 * 64).selectExpr(
        "id", "CAST(id % 64 AS BIGINT) AS x", "CAST(id DIV 64 AS BIGINT) AS y"
    )
    V.commit_zordered(grid, p, ["x", "y"], bits=6, num_files=16)
    m = V.read_manifest(p, 0)
    assert len(m["files"]) == 16
    for col in ("x", "y"):
        pruned = V.read_latest_pruned(spark, p, col, lo=0, hi=7)
        assert len(pruned.inputFiles()) < 16, col
        got = pruned.filter(f"{col} <= 7").count()
        assert got == 8 * 64, col


def test_sync_changes_exactly_once_composition(spark, tmp_path):
    """sync_changes + batch_id-keyed commit into a downstream versioned
    table = exactly-once end-to-end: replays after a simulated crash
    don't double-apply; each sync moves only the delta."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cursor = str(tmp_path / "cursor.json")

    def apply_fn(df, since, until):
        V.commit_version(df, dst, mode="append", batch_id=until)

    V.commit_version(spark.range(0, 3), src)
    assert V.sync_changes(spark, src, cursor, apply_fn) == 0  # bootstrap
    assert _rows(V.read_latest(spark, dst)) == _rows(spark.range(0, 3))
    assert V.sync_changes(spark, src, cursor, apply_fn) is None  # no-op

    V.commit_version(spark.range(3, 5), src, mode="append")
    V.commit_version(spark.range(5, 6), src, mode="append")
    assert V.sync_changes(spark, src, cursor, apply_fn) == 2  # both deltas
    assert _rows(V.read_latest(spark, dst)) == _rows(spark.range(0, 6))

    # crash-before-cursor-advance: re-apply is absorbed by batch_id
    apply_fn(V.read_changes(spark, src, 0, 2), 0, 2)  # replayed delivery
    assert _rows(V.read_latest(spark, dst)) == _rows(spark.range(0, 6))


def test_append_rebase_on_conflict(spark, tmp_path, monkeypatch):
    """Logical conflict resolution (Delta-style): a losing APPEND
    re-reads the winner's manifest and re-claims on top — both
    concurrent appenders commit (versions N and N+1) and the table is
    the union, with no VersionConflictError surfacing."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    real = V._claim_version
    state = {"injected": False}

    def inject(fs, path, n, manifest):
        if not state["injected"]:
            state["injected"] = True
            # a faster appender lands v1 while our claim is in flight
            V.commit_version(spark.range(100, 103), p, mode="append")
        return real(fs, path, n, manifest)

    monkeypatch.setattr(V, "_claim_version", inject)
    v = V.commit_version(spark.range(10, 13), p, mode="append")
    assert v == 2
    assert _rows(V.read_latest(spark, p)) == _rows(
        spark.range(0, 3).unionAll(spark.range(100, 103)).unionAll(
            spark.range(10, 13)
        )
    )
    h = V.table_history(p)
    assert [r["version"] for r in h] == [0, 1, 2]


def test_append_rebase_preserves_winner_stats_and_schema(
    spark, tmp_path, monkeypatch
):
    """The rebased manifest is re-derived from the WINNER's: its files,
    zone-map stats, and evolved schema all carry into the loser's
    re-claimed version."""
    p = str(tmp_path / "t")
    V.commit_version(
        spark.range(0, 100).selectExpr("id AS k"), p, stats_cols=["k"]
    )
    real = V._claim_version
    state = {"injected": False}

    def inject(fs, path, n, manifest):
        if not state["injected"]:
            state["injected"] = True
            V.commit_version(
                spark.range(1000, 1100).selectExpr("id AS k"),
                p, mode="append", stats_cols=["k"],
            )
        return real(fs, path, n, manifest)

    monkeypatch.setattr(V, "_claim_version", inject)
    v = V.commit_version(
        spark.range(5000, 5100).selectExpr("id AS k"),
        p, mode="append", stats_cols=["k"],
    )
    assert v == 2
    # zone map covers all three generations: pruning to the winner's
    # range opens neither v0's nor the loser's files
    pruned = V.read_latest_pruned(spark, p, "k", lo=1000, hi=1099)
    assert pruned.count() == 100
    full = V.read_latest(spark, p)
    assert pruned.count() < full.count() == 300
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def _inject_on_first_claim(monkeypatch, fn):
    """Run ``fn`` (a concurrent winner) right before the first manifest
    claim, so the claiming writer loses the race mid-commit."""
    real = V._claim_version
    state = {"injected": False}

    def inject(fs, path, n, manifest):
        if not state["injected"]:
            state["injected"] = True
            fn()
        return real(fs, path, n, manifest)

    monkeypatch.setattr(V, "_claim_version", inject)


def test_merge_race_vs_append_rebases_no_lost_update(
    spark, tmp_path, monkeypatch
):
    """A merge racing a concurrent blind APPEND rebases (r8 disjoint
    file-set resolution): both commit, nothing is lost — the appended
    rows AND the upsert are in the final table.  (Before r8 this raised;
    the invariant under test is still no-lost-update: the rebased
    manifest must carry the winner's files.)"""
    p = str(tmp_path / "t")
    V.commit_version(
        spark.range(0, 100).selectExpr("id", "id AS k", "0 AS rev"), p
    )
    _inject_on_first_claim(
        monkeypatch,
        lambda: V.commit_version(
            spark.range(100, 110).selectExpr("id", "id AS k", "0 AS rev"),
            p,
            mode="append",
        ),
    )
    ups = spark.createDataFrame([(5, 5, 1)], "id long, k long, rev int")
    res = V.merge_upsert(spark, p, ups, "k")
    assert res["version"] == 2 and V.latest_version(p) == 2
    final = V.read_latest(spark, p)
    assert final.count() == 110  # append kept, upsert replaced in place
    assert final.filter("k = 5").first()["rev"] == 1
    assert final.filter("k >= 100").count() == 10


def test_disjoint_cow_deletes_both_commit(spark, tmp_path, monkeypatch):
    """VERDICT r7 task 6: two COW deletes touching DISJOINT files both
    commit — the loser rebases its rewritten file onto the winner's
    manifest; both predicates' effects land."""
    p = str(tmp_path / "t")
    V.commit_version(
        spark.range(0, 10).selectExpr("id", "id AS k").coalesce(1), p
    )
    V.commit_version(
        spark.range(100, 110).selectExpr("id", "id AS k").coalesce(1),
        p,
        mode="append",
    )
    _inject_on_first_claim(
        monkeypatch, lambda: V.delete_where(spark, p, "k < 3")
    )
    res = V.delete_where(spark, p, "k >= 100 and k < 105")
    assert res["version"] == 3 and V.latest_version(p) == 3
    got = sorted(r["k"] for r in V.read_latest(spark, p).collect())
    assert got == [3, 4, 5, 6, 7, 8, 9, 105, 106, 107, 108, 109]


def test_overlapping_cow_writers_still_conflict(
    spark, tmp_path, monkeypatch
):
    """Two writers rewriting the SAME file are a real conflict: the
    loser raises and its attempt directory is cleaned up."""
    p = str(tmp_path / "t")
    V.commit_version(
        spark.range(0, 10).selectExpr("id", "id AS k").coalesce(1), p
    )
    _inject_on_first_claim(
        monkeypatch, lambda: V.delete_where(spark, p, "k = 1")
    )
    with pytest.raises(V.VersionConflictError, match="overlap"):
        V.delete_where(spark, p, "k = 2")
    assert V.latest_version(p) == 1
    got = sorted(r["k"] for r in V.read_latest(spark, p).collect())
    assert got == [0, 2, 3, 4, 5, 6, 7, 8, 9]  # winner's delete only
    # the loser's attempt directory was retired (no orphan data dirs
    # beyond the two committed versions)
    data = os.listdir(str(tmp_path / "t" / "data"))
    assert len(data) == 2


def test_cow_rebase_vs_schema_change_conflicts(
    spark, tmp_path, monkeypatch
):
    """A concurrent schema-evolving append is NOT auto-resolvable for a
    merge/delete loser — the rebased manifest would stamp the stale
    schema over the winner's."""
    p = str(tmp_path / "t")
    V.commit_version(
        spark.range(0, 10).selectExpr("id", "id AS k").coalesce(1), p
    )
    _inject_on_first_claim(
        monkeypatch,
        lambda: V.commit_version(
            spark.range(100, 105).selectExpr(
                "id", "id AS k", "CAST(1 AS INT) AS extra"
            ),
            p,
            mode="append",
        ),
    )
    with pytest.raises(V.VersionConflictError, match="schema"):
        V.delete_where(spark, p, "k = 2")


def test_concurrent_appenders_stress(spark, tmp_path):
    """N threads blind-append concurrently; every one commits (rebase
    absorbs the races) and the final table is the exact union."""
    import threading

    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 10), p)
    errs = []

    def worker(i):
        try:
            V.commit_version(
                spark.range(i * 100, i * 100 + 10), p, mode="append"
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(1, 7)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert V.latest_version(p) == 6
    expect = spark.range(0, 10)
    for i in range(1, 7):
        expect = expect.unionAll(spark.range(i * 100, i * 100 + 10))
    assert _rows(V.read_latest(spark, p)) == _rows(expect)


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE semantics: only rows where the predicate is TRUE go; rows
    where it evaluates NULL (e.g. x IS NULL under 'x > 5') stay."""
    p = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 10), (2, None), (3, 3), (4, None), (5, 99)],
        "id long, x int",
    ).coalesce(1)
    V.commit_version(base, p)
    r = V.delete_where(spark, p, "x > 5")
    assert r["files_rewritten"] == 1
    got = _rows(V.read_latest(spark, p))
    assert got == [(2, None), (3, 3), (4, None)]


def test_merge_upsert_timestamp_key(spark, tmp_path):
    """Zone-map targeting works when the merge key is a timestamp: the
    stored stats are isoformat strings, the live bounds are normalized
    the same way before comparing (no str-vs-datetime TypeError)."""
    p = str(tmp_path / "t")
    base = spark.sql(
        "SELECT id, timestamp'2024-01-01' + make_interval(0,0,0,CAST(id AS INT)) AS ts,"
        " 0 AS rev FROM range(0, 96)"
    ).repartitionByRange(4, "ts")
    V.commit_version(base, p, stats_cols=["ts"])
    ups = spark.sql(
        "SELECT id, timestamp'2024-01-01' + make_interval(0,0,0,CAST(id AS INT)) AS ts,"
        " 1 AS rev FROM range(10, 12)"
    )
    r = V.merge_upsert(spark, p, ups, "ts", stats_cols=["ts"])
    assert r["version"] == 1
    assert r["files_rewritten"] == 1  # days 10-11 live in one range file
    assert r["files_carried"] == 3
    latest = V.read_latest(spark, p)
    assert latest.count() == 96
    assert latest.filter("rev = 1").count() == 2


def _manifest_bytes(p, n):
    with open(os.path.join(p, "_versions", f"v{n}.json"), "rb") as f:
        return f.read()


def test_log_structured_manifests_commit_is_o_delta(spark, tmp_path):
    """VERDICT r10 task 3: a long append history must write O(files
    touched) bytes per commit, NOT O(total files) — at 100 TB
    (~10⁵–10⁶ files) a full-list manifest makes every small append
    rewrite megabytes of metadata.  Non-checkpoint records are deltas
    (base + add, no full file list); checkpoints land every
    _CHECKPOINT_EVERY versions; reconstruction returns the identical
    logical manifest at every version."""
    p = str(tmp_path / "t")
    one = spark.range(0, 1).selectExpr("id", "id AS x").coalesce(1)
    n_commits = 40
    for i in range(n_commits):
        V.commit_version(one, p, mode="append")
    sizes = [len(_manifest_bytes(p, n)) for n in range(n_commits)]
    raws = [
        json.loads(_manifest_bytes(p, n).decode()) for n in range(n_commits)
    ]
    # deltas carry no "files" key and exactly one added file; their
    # size is flat in table size (the O(delta) contract)
    delta_ns = [n for n, r in enumerate(raws) if "base" in r]
    ckpt_ns = [n for n, r in enumerate(raws) if "base" not in r]
    assert 0 in ckpt_ns  # first commit has no parent
    assert all(
        n % V._CHECKPOINT_EVERY == 0 for n in ckpt_ns
    ), f"unexpected checkpoints at {ckpt_ns}"
    assert len(delta_ns) == n_commits - len(ckpt_ns)
    for n in delta_ns:
        assert "files" not in raws[n] and len(raws[n]["add"]) == 1
    # O(delta): the last delta is no bigger than an early one (+slack
    # for the version digits), while the table has grown 40x
    early = next(s for n, s in enumerate(sizes) if n in delta_ns)
    late = sizes[max(delta_ns)]
    assert late <= early + 64, (early, late)
    # checkpoints DO grow with the table — that's their job
    assert len(_manifest_bytes(p, 32)) > len(_manifest_bytes(p, 16)) > sizes[1]
    # reconstruction: every version's logical view is exact
    for n in (0, 1, 15, 16, 17, 31, 32, n_commits - 1):
        m = V.read_manifest(p, n)
        assert m["version"] == n and len(m["files"]) == n + 1
        assert V.read_version(spark, p, n).count() == n + 1


def test_log_structured_manifests_with_merge_delete_and_stats(
    spark, tmp_path
):
    """Delta records survive the harder writers: merge/delete rewrite
    files (remove_tails + add), stats follow their files through the
    encoding, and data-skipping reads reconstruct the same pruned
    sets."""
    p = str(tmp_path / "t")
    base = spark.range(0, 100).selectExpr("id", "id * 2 AS x")
    V.commit_version(base.repartition(4), p, stats_cols=["id"])
    for i in range(3):
        upd = spark.range(i * 10, i * 10 + 5).selectExpr(
            "id", "id * 100 AS x"
        )
        V.merge_upsert(spark, p, upd, "id", stats_cols=["id"])
    V.delete_where(spark, p, "id >= 95", stats_cols=["id"])
    cur = V.latest_version(p)
    raws = [
        json.loads(_manifest_bytes(p, n).decode()) for n in range(cur + 1)
    ]
    assert any("base" in r and r.get("remove_tails") for r in raws[1:])
    m = V.read_manifest(p, cur)
    got = sorted(
        tuple(r) for r in V.read_latest(spark, p).collect()
    )
    # ids 0-4, 10-14, 20-24 updated by the merges; 95+ deleted
    want = sorted(
        [(i, i * 100) for i in list(range(5)) + list(range(10, 15)) + list(range(20, 25))]
        + [(i, i * 2) for i in range(100) if i < 95 and not (
            i < 5 or 10 <= i < 15 or 20 <= i < 25)]
    )
    assert got == want
    # stats survive the delta encoding: every live file has its zone
    assert set(m["stats"]) == {f.rsplit("/", 1)[-1] for f in m["files"]}


def test_vacuum_repairs_delta_chains(spark, tmp_path):
    """vacuum deletes expired manifests; retained delta records whose
    parent expired are rewritten as full checkpoints first, so every
    retained version stays readable afterwards."""
    p = str(tmp_path / "t")
    one = spark.range(0, 1).selectExpr("id", "id AS x").coalesce(1)
    for _ in range(8):
        V.commit_version(one, p, mode="append")
    # versions 1..7 are deltas on the v0 checkpoint; keep only 6,7
    raw7 = json.loads(_manifest_bytes(p, 7).decode())
    assert "base" in raw7
    V.vacuum(p, keep=2)
    raw6 = json.loads(_manifest_bytes(p, 6).decode())
    assert "base" not in raw6  # rewritten full: parent expired
    raw7 = json.loads(_manifest_bytes(p, 7).decode())
    assert raw7.get("base") == 6  # still a delta on the retained v6
    assert V.read_version(spark, p, 6).count() == 7
    assert V.read_version(spark, p, 7).count() == 8
    with pytest.raises(FileNotFoundError):
        V.read_manifest(p, 3)
