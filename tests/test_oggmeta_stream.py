"""Runtime test of the streaming OGG-METADATA admission loop — the
first family expressed purely as an ``admit_fn`` on the shared
harness (``streaming/admission.py``): codec dispatch (Vorbis/Opus),
duration/packet gates, fingerprint dedup vs the persisted index and
within batch, quarantine for corrupt containers, checkpoint resume,
and retry idempotency."""

from __future__ import annotations

from asid_v2_data_pipeline_spark.functions.opus import (
    opus_packet,
    write_ogg_opus,
)
from asid_v2_data_pipeline_spark.functions.vorbis import write_ogg_vorbis
from asid_v2_data_pipeline_spark.streaming.oggmeta_stream import (
    ogg_meta_stream,
    process_ogg_meta_batch,
)

SCHEMA = "media_id long, payload binary"


def _vorbis(title: str, n_pkts: int = 4) -> bytes:
    return write_ogg_vorbis(
        2, 44100, {"TITLE": title}, n_audio_packets=n_pkts
    )


def _opus(title: str, n_pkts: int = 4) -> bytes:
    return write_ogg_opus(
        1,
        {"TITLE": title},
        [opus_packet(16, 1) for _ in range(n_pkts)],
        pre_skip=0,
    )


def _write(spark, src, rows):
    spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)


def _dirs(tmp_path):
    return {
        k: str(tmp_path / k)
        for k in ("src", "corpus", "index", "quar", "ck")
    }


def _ids(spark, path):
    return sorted(r["media_id"] for r in spark.read.parquet(path).collect())


def test_streaming_ogg_meta_admission(spark, tmp_path):
    dirs = _dirs(tmp_path)
    # batch 1: one vorbis, one opus, a same-fingerprint vorbis dup
    # (same codec/title/duration), and a zero-packet stream (gate)
    _write(
        spark,
        dirs["src"],
        [
            (1, _vorbis("alpha")),
            (2, _opus("beta")),
            (3, _vorbis("alpha")),
            (4, _vorbis("empty", n_pkts=0)),
        ],
    )
    # batch 2: index-caught dup of 1 + a novel opus
    _write(
        spark,
        dirs["src"],
        [(10, _vorbis("alpha")), (11, _opus("gamma"))],
    )
    q = ogg_meta_stream(
        spark, dirs["src"], dirs["corpus"], dirs["index"],
        dirs["quar"], dirs["ck"], min_packets=1,
    )
    q.awaitTermination(180)
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11]
    rows = {
        r["media_id"]: r for r in spark.read.parquet(dirs["corpus"]).collect()
    }
    assert rows[1]["codec"] == "vorbis" and rows[1]["title"] == "alpha"
    assert rows[2]["codec"] == "opus"
    assert rows[2]["duration_samples"] == 4 * 2 * 120  # code-1 CELT 2.5ms

    # restart with a new file: checkpoint resumes, index still dedups
    _write(
        spark,
        dirs["src"],
        [(20, _opus("beta")), (21, _vorbis("delta"))],
    )
    q = ogg_meta_stream(
        spark, dirs["src"], dirs["corpus"], dirs["index"],
        dirs["quar"], dirs["ck"], min_packets=1,
    )
    q.awaitTermination(180)
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11, 21]


def test_ogg_meta_poison_quarantined_and_retry_idempotent(spark, tmp_path):
    good = _vorbis("keeper")
    poison = bytearray(good)
    poison[30] ^= 0xFF  # corrupt a header page (CRC mismatch)
    batch = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, poison),
            (3, bytearray(b"not ogg at all")),
            (4, bytearray(_opus("fine"))),
        ],
        SCHEMA,
    )
    dirs = _dirs(tmp_path)
    process_ogg_meta_batch(
        batch, 0, dirs["corpus"], dirs["index"], dirs["quar"]
    )
    assert _ids(spark, dirs["corpus"]) == [1, 4]
    quar = sorted(
        (r["media_id"], r["error"])
        for r in spark.read.parquet(dirs["quar"]).collect()
    )
    assert [m for m, _ in quar] == [2, 3]
    assert all(e for _, e in quar)
    # retry with the same batch_id: identical persisted state
    process_ogg_meta_batch(
        batch, 0, dirs["corpus"], dirs["index"], dirs["quar"]
    )
    assert _ids(spark, dirs["corpus"]) == [1, 4]
    assert spark.read.parquet(dirs["index"]).count() == 2
    assert spark.read.parquet(dirs["quar"]).count() == 2
