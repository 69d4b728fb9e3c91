"""Keyed parquet MERGE: upsert/delete semantics, touched-bucket-only IO,
idempotent re-merge (sources/merge.py)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.sources import merge as mg


def _rows(spark, tdir):
    return {
        r["k"]: (r["v"], r["src"])
        for r in mg.read_table(spark, tdir).collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [Row(k=i, v=float(i), src="base") for i in range(50)]
    )
    mg.init_table(base, tdir, "k", n_buckets=8)
    return tdir


def test_upsert_and_insert(spark, table):
    ups = spark.createDataFrame(
        [Row(k=3, v=99.0, src="up"), Row(k=100, v=1.0, src="up")]
    )
    stats = mg.merge_upsert(spark, table, ups, "k", n_buckets=8)
    assert 1 <= stats["touched_buckets"] <= 2
    got = _rows(spark, table)
    assert got[3] == (99.0, "up")          # replaced
    assert got[100] == (1.0, "up")         # inserted
    assert got[4] == (4.0, "base")         # untouched key intact
    assert len(got) == 51


def test_delete_tombstones(spark, table):
    ups = spark.createDataFrame(
        [
            Row(k=7, v=0.0, src="up", dead=True),
            Row(k=8, v=8.5, src="up", dead=False),
            Row(k=9, v=0.0, src="up", dead=None),  # NULL flag = keep
        ]
    )
    mg.merge_upsert(spark, table, ups, "k", n_buckets=8, delete_col="dead")
    got = _rows(spark, table)
    assert 7 not in got
    assert got[8] == (8.5, "up")
    assert got[9] == (0.0, "up")
    assert len(got) == 49


def test_untouched_buckets_not_rewritten(spark, table):
    # find a bucket the update does NOT touch and pin its file mtimes
    ups = spark.createDataFrame([Row(k=3, v=99.0, src="up")])
    touched_b = ups.select(
        F.pmod(F.xxhash64("k"), F.lit(8)).cast("int").alias("b")
    ).collect()[0]["b"]
    other = next(
        d for d in sorted(os.listdir(table))
        if d.startswith(mg.BUCKET_COL) and d != f"{mg.BUCKET_COL}={touched_b}"
    )
    before = {
        f: os.path.getmtime(os.path.join(table, other, f))
        for f in os.listdir(os.path.join(table, other))
    }
    mg.merge_upsert(spark, table, ups, "k", n_buckets=8)
    after = {
        f: os.path.getmtime(os.path.join(table, other, f))
        for f in os.listdir(os.path.join(table, other))
    }
    assert before == after  # same files, byte-for-byte untouched


def test_idempotent_re_merge(spark, table):
    ups = spark.createDataFrame([Row(k=3, v=99.0, src="up"), Row(k=60, v=6.0, src="up")])
    mg.merge_upsert(spark, table, ups, "k", n_buckets=8)
    first = _rows(spark, table)
    mg.merge_upsert(spark, table, ups, "k", n_buckets=8)
    assert _rows(spark, table) == first


def test_duplicate_update_keys_rejected(spark, table):
    ups = spark.createDataFrame([Row(k=3, v=1.0, src="a"), Row(k=3, v=2.0, src="b")])
    with pytest.raises(ValueError, match="multiple rows"):
        mg.merge_upsert(spark, table, ups, "k", n_buckets=8)


def test_reserved_column_rejected(spark, tmp_path):
    df = (
        spark.range(3)
        .withColumnRenamed("id", "k")
        .withColumn(mg.BUCKET_COL, F.lit(1))
    )
    with pytest.raises(ValueError, match="reserved"):
        mg.init_table(df, str(tmp_path / "t2"), "k")


def test_schema_evolution_adds_column(spark, table):
    # updates carry a NEW column: old rows surface it as NULL, new rows
    # keep it, untouched buckets reconcile via mergeSchema on read
    ups = spark.createDataFrame(
        [Row(k=3, v=99.0, src="up", score=0.9), Row(k=200, v=1.0, src="up", score=0.1)]
    )
    mg.merge_upsert(spark, table, ups, "k", n_buckets=8)
    got = {r["k"]: r["score"] for r in mg.read_table(spark, table).collect()}
    assert got[3] == 0.9 and got[200] == 0.1
    assert got[4] is None            # pre-evolution row in a touched bucket
    assert len(got) == 51


def test_delete_sole_key_of_sparse_bucket(spark, tmp_path):
    """With n_buckets=64 and 5 keys, buckets hold a single key each — a
    tombstone for one must remove the bucket DIRECTORY, not just report
    it touched (dynamic overwrite only rewrites partitions that receive
    rows, so an emptied bucket needs an explicit delete)."""
    tdir = str(tmp_path / "sparse")
    base = spark.createDataFrame(
        [Row(k=i, v=float(i), src="base") for i in range(5)]
    )
    mg.init_table(base, tdir, "k", n_buckets=64)
    bucket_of_3 = spark.createDataFrame([Row(k=3)]).select(
        F.pmod(F.xxhash64("k"), F.lit(64)).cast("int").alias("b")
    ).collect()[0]["b"]
    shares = spark.createDataFrame([Row(k=i) for i in range(5) if i != 3]).select(
        F.pmod(F.xxhash64("k"), F.lit(64)).cast("int").alias("b")
    ).filter(F.col("b") == bucket_of_3).count()

    ups = spark.createDataFrame([Row(k=3, v=0.0, src="up", dead=True)])
    stats = mg.merge_upsert(spark, tdir, ups, "k", n_buckets=64, delete_col="dead")
    got = _rows(spark, tdir)
    assert 3 not in got
    assert len(got) == 4
    if shares == 0:  # sole occupant: dir must be gone
        assert stats["emptied_buckets"] == 1
        assert not os.path.exists(
            os.path.join(tdir, f"{mg.BUCKET_COL}={bucket_of_3}")
        )
    # retrying the same tombstone batch is a no-op, not an error
    mg.merge_upsert(spark, tdir, ups, "k", n_buckets=64, delete_col="dead")
    assert _rows(spark, tdir) == got


def test_delete_every_key_keeps_table_readable(spark, tmp_path):
    """Tombstoning ALL remaining keys must leave a READABLE empty table
    (one zero-row file preserves the schema footers), not a bricked
    directory — and later merges must be able to repopulate it."""
    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [Row(k=i, v=float(i), src="base") for i in range(3)]
    )
    mg.init_table(base, tdir, "k", n_buckets=16)
    tomb = spark.createDataFrame(
        [Row(k=i, v=0.0, src="x", dead=True) for i in range(3)]
    )
    mg.merge_upsert(spark, tdir, tomb, "k", n_buckets=16, delete_col="dead")
    spark.catalog.refreshByPath(tdir)
    assert mg.read_table(spark, tdir).count() == 0  # readable, empty
    # table stays usable: repopulate
    ups = spark.createDataFrame([Row(k=7, v=7.0, src="new")])
    mg.merge_upsert(spark, tdir, ups, "k", n_buckets=16)
    assert _rows(spark, tdir) == {7: (7.0, "new")}


def test_random_merge_sequence_matches_model(spark, tmp_path):
    """Model-based check: a deterministic pseudo-random sequence of
    upsert/delete batches applied to the bucketed table must equal a
    plain dict replay after every step (catches survivor-loss, tombstone
    and bucket-routing bugs that single-shot tests can miss).  Sparse
    buckets (64 buckets / ≤40 keys) on purpose: many buckets hold a
    single key, so tombstones regularly EMPTY a bucket — the dense
    50-keys/8-buckets shape of the other tests never exercised that."""
    import random

    rng = random.Random(1234)
    tdir = str(tmp_path / "tbl")
    model = {k: (float(k), "base") for k in range(40)}
    mg.init_table(
        spark.createDataFrame([Row(k=k, v=v, src=s) for k, (v, s) in model.items()]),
        tdir,
        "k",
        n_buckets=64,
    )
    for step in range(6):
        keys = rng.sample(range(60), rng.randint(1, 8))
        batch = []
        for k in keys:
            if rng.random() < 0.3:
                batch.append(Row(k=k, v=0.0, src=f"s{step}", dead=True))
                model.pop(k, None)
            else:
                v = round(rng.uniform(0, 100), 3)
                batch.append(Row(k=k, v=v, src=f"s{step}", dead=False))
                model[k] = (v, f"s{step}")
        mg.merge_upsert(
            spark, tdir, spark.createDataFrame(batch), "k",
            n_buckets=64, delete_col="dead",
        )
        got = {
            r["k"]: (r["v"], r["src"])
            for r in mg.read_table(spark, tdir).collect()
        }
        assert got == model, f"diverged at step {step}"
