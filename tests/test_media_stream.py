"""Runtime test of the streaming MEDIA admission loop: per-file
micro-batches of real FLAC payloads through a streaming query; gates
must reject bad audio, the fingerprint index must carry admitted media
forward so later batches dedup against earlier ones, a second drain
resumes from the checkpoint, and the micro-batch step is idempotent on
retry (the exactly-once-results contract of dedup_stream, inherited)."""

from __future__ import annotations

import numpy as np

from asid_v2_data_pipeline_spark.functions.flac import write_flac
from asid_v2_data_pipeline_spark.streaming.media_stream import (
    audio_admission_stream,
    process_media_batch,
)

SCHEMA = "media_id long, payload binary"


def _pcm(seed: int, n: int = 200) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-15000, 15000, size=(n, 2)).astype(np.int64)


def _flac(samples: np.ndarray) -> bytearray:
    return bytearray(write_flac(samples, sample_rate=16000))


def _clipped(n: int = 200) -> np.ndarray:
    # every sample at the rails: clip_ratio 1.0 -> gate rejects
    return np.full((n, 2), 30000, dtype=np.int64)


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _drain(spark, dirs):
    q = audio_admission_stream(
        spark,
        dirs["src"],
        dirs["corpus"],
        dirs["index"],
        dirs["ck"],
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)


def _ids(spark, corpus):
    return sorted(r["media_id"] for r in spark.read.parquet(corpus).collect())


def _dirs(tmp_path):
    return {
        k: str(tmp_path / k) for k in ("src", "corpus", "index", "ck")
    }


def test_streaming_audio_admission(spark, tmp_path):
    dirs = _dirs(tmp_path)
    a, b = _pcm(1), _pcm(2)
    # batch 1: two good novel payloads, an exact duplicate of media 1
    # (within-batch loser), and a fully-clipped payload (gate reject)
    _write(
        spark,
        dirs["src"],
        [
            (1, _flac(a)),
            (2, _flac(b)),
            (3, _flac(a)),
            (4, _flac(_clipped())),
        ],
    )
    # batch 2 (separate file => separate micro-batch): a duplicate of
    # media 1 that must be caught VIA THE INDEX, plus one novel payload
    _write(spark, dirs["src"], [(10, _flac(a)), (11, _flac(_pcm(3)))])
    _drain(spark, dirs)
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11]
    # the decode is real: admitted loudness matches the pre-encode PCM
    row = (
        spark.read.parquet(dirs["corpus"])
        .filter("media_id = 1")
        .collect()[0]
    )
    flat = a.reshape(-1)
    assert row["rms"] == float(np.sqrt((flat * flat).sum() / flat.size))

    # restart with a new file: checkpoint resumes, index still dedups
    _write(spark, dirs["src"], [(20, _flac(a)), (21, _flac(_pcm(4)))])
    _drain(spark, dirs)
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11, 21]


def test_media_batch_retry_is_idempotent(spark, tmp_path):
    dirs = _dirs(tmp_path)
    batch = spark.createDataFrame(
        [(1, _flac(_pcm(7))), (2, _flac(_pcm(8)))], SCHEMA
    )
    process_media_batch(batch, 0, dirs["corpus"], dirs["index"])
    first = _ids(spark, dirs["corpus"])
    # a retried batch must see exactly the history it saw first (none)
    # and must not mark itself a duplicate of its own index rows
    process_media_batch(batch, 0, dirs["corpus"], dirs["index"])
    assert _ids(spark, dirs["corpus"]) == first == [1, 2]
    fp_rows = spark.read.parquet(dirs["index"])
    assert fp_rows.count() == 2


def test_mono_payload_gates_on_real_sample_count(spark):
    """ADVICE r7: the admission gates hardcoded stereo (n = n_frames*2),
    halving mono ratios — a fully-silent mono payload slipped through at
    silence_ratio 0.5.  Gates must use the decoded channel count."""
    from asid_v2_data_pipeline_spark.streaming.media_stream import (
        admit_media_batch,
    )

    silent_mono = np.full((200, 1), 10, dtype=np.int64)  # |s| << 8192
    loud_mono = np.arange(200, dtype=np.int64).reshape(200, 1) * 150 - 15000
    batch = spark.createDataFrame(
        [(1, _flac(silent_mono)), (2, _flac(loud_mono)), (3, _flac(_pcm(7)))],
        SCHEMA,
    )
    admitted, _ = admit_media_batch(batch, None)
    rows = {r["media_id"]: r for r in admitted.collect()}
    # silent mono: true silence_ratio = 1.0 > 0.85 -> rejected
    assert 1 not in rows
    # loud mono admitted with mono denominators (n = 200, not 400)
    flat = loud_mono.reshape(-1)
    assert rows[2]["silence_ratio"] == float(
        (np.abs(flat) < 8192).sum() / flat.size
    )
    assert rows[2]["rms"] == float(np.sqrt((flat * flat).sum() / flat.size))
    assert 3 in rows  # stereo path unchanged


def test_mixed_codec_payloads_admit_through_one_funnel(spark):
    """r8: the admission step is codec-dispatched — FLAC and
    ID3-prefixed MP3 payloads gate through the same integer stats, and
    the fingerprint dedup sees both; unknown magic quarantines (r10:
    gated out like any inadmissible document, the stream survives)."""
    from asid_v2_data_pipeline_spark.functions.id3 import write_id3
    from asid_v2_data_pipeline_spark.functions.mp3 import write_mp3_l3
    from asid_v2_data_pipeline_spark.streaming.media_stream import (
        admit_media_batch,
    )

    rng = np.random.default_rng(5)
    q = rng.integers(-1, 2, size=(1, 2, 576))
    sf = np.full((1, 2, 21), 0, np.int64)
    # gg=194: clip 0.066, silence 0.675 -> passes both gates
    mp3_loud = write_mp3_l3(q, sf, global_gain=194)
    # gg=170 (2^-10): everything under the silence threshold -> rejected
    mp3_silent = write_id3({"TIT2": "x"}) + write_mp3_l3(
        q, sf, global_gain=170
    )
    batch = spark.createDataFrame(
        [
            (1, _flac(_pcm(1))),          # FLAC, admitted
            (2, bytearray(mp3_loud)),     # MP3, admitted
            (3, bytearray(mp3_silent)),   # MP3, silence gate rejects
            (4, _flac(_clipped())),       # FLAC, clip gate rejects
        ],
        SCHEMA,
    )
    admitted, fps = admit_media_batch(batch, None)
    got = {r["media_id"]: r for r in admitted.collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_channels"] == 2 and got[2]["n_channels"] == 1
    bad = spark.createDataFrame([(9, bytearray(b"???junk"))], SCHEMA)
    assert admit_media_batch(bad, None)[0].collect() == []


def test_wav_payloads_admit_through_the_same_funnel(spark):
    """r9 (VERDICT r8 task 3): RIFF/WAVE joins the magic dispatch — a
    mixed FLAC + MP3 + WAV batch gates through one funnel, the WAV
    stats match the raw PCM exactly (lossless), and a WAV duplicate of
    an earlier admitted fingerprint dedups against the index."""
    from asid_v2_data_pipeline_spark.functions.codecs import write_wav
    from asid_v2_data_pipeline_spark.functions.mp3 import write_mp3_l3
    from asid_v2_data_pipeline_spark.streaming.media_stream import (
        admit_media_batch,
    )

    rng = np.random.default_rng(11)
    q = rng.integers(-1, 2, size=(1, 2, 576))
    sf = np.full((1, 2, 21), 0, np.int64)
    mp3_loud = write_mp3_l3(q, sf, global_gain=194)
    wav_pcm = rng.integers(-15000, 15000, size=300).astype(np.int16)
    wav_silent = np.zeros(300, np.int16)
    batch = spark.createDataFrame(
        [
            (1, _flac(_pcm(7))),                       # FLAC, admitted
            (2, bytearray(mp3_loud)),                  # MP3, admitted
            (3, bytearray(write_wav(wav_pcm, 16000))),  # WAV, admitted
            (4, bytearray(write_wav(wav_silent, 16000))),  # silence gate
        ],
        SCHEMA,
    )
    admitted, fps = admit_media_batch(batch, None)
    got = {r["media_id"]: r for r in admitted.collect()}
    assert set(got) == {1, 2, 3}
    w = got[3]
    flat = wav_pcm.astype(np.int64)
    assert w["n_channels"] == 1 and w["n_frames"] == 300
    assert abs(w["rms"] - float(np.sqrt((flat * flat).mean()))) < 1e-9
    assert w["fp"] == int(((np.arange(16) + 1) * flat[:16]).sum())
    # a WAV byte-duplicate of media 3's samples dedups vs the index
    dup = spark.createDataFrame(
        [(9, bytearray(write_wav(wav_pcm, 16000)))], SCHEMA
    )
    admitted2, _ = admit_media_batch(dup, fps)
    assert admitted2.count() == 0


def test_admitting_funnel_quarantines_per_document(spark):
    """r10: decode_audio_stats_admitting turns corrupt payloads into
    rejected ROWS (null stats + error class) in the same batch where
    good FLAC/WAV/MP3 documents decode — never a failed task.  A
    payload hitting a DISCLOSED format boundary (NotImplementedError)
    quarantines too; only genuine bugs propagate."""
    import pandas as pd

    from asid_v2_data_pipeline_spark.functions.codecs import write_wav
    from asid_v2_data_pipeline_spark.functions.mp3 import write_mp3_l3
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_audio_stats_admitting,
    )

    good_flac = bytes(_flac(_pcm(1)))
    pcm = _pcm(2)[:, 0].astype(np.int16)
    good_wav = write_wav(pcm, 16000)
    q = np.zeros((1, 2, 576), np.int64)
    sfs = np.zeros((1, 2, 21), np.int64)
    good_mp3 = write_mp3_l3(q, sfs)
    corrupt_magic = b"JUNK" + good_wav[4:]
    corrupt_flac = good_flac[:40] + b"\x00" * 10  # truncated mid-frame
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3, 4, 5],
            "payload": [
                good_flac, good_wav, good_mp3, corrupt_magic,
                corrupt_flac,
            ],
        }
    )
    media = spark.createDataFrame(pdf)
    rows = {
        r["media_id"]: r
        for r in decode_audio_stats_admitting(media, 20000, 256, 8)
        .collect()
    }
    assert len(rows) == 5
    for mid in (1, 2, 3):
        assert rows[mid]["error"] is None
        assert rows[mid]["n_frames"] > 0
    for mid in (4, 5):
        assert rows[mid]["error"] == "ValueError"
        assert rows[mid]["n_frames"] is None
        assert rows[mid]["sum_sq"] is None


def test_streaming_admission_survives_poison_payload(spark, tmp_path):
    """r10: a corrupt payload in a streaming micro-batch is gated out
    like any other rejected document — the batch step completes, the
    good payloads admit, and a retry stays idempotent.  Before the
    quarantining funnel, a poison message restart-looped the stream
    forever."""
    import pandas as pd

    from asid_v2_data_pipeline_spark.streaming.media_stream import (
        process_media_batch,
    )

    good = bytes(_flac(_pcm(31)))
    poison = b"JUNK" + good[4:]
    batch = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2, 3],
             "payload": [good, poison, bytes(_flac(_pcm(32)))]}
        )
    )
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    process_media_batch(batch, 0, corpus, index)
    admitted = spark.read.parquet(corpus)
    ids = sorted(r["media_id"] for r in admitted.collect())
    assert ids == [1, 3]  # poison dropped, stream alive
    process_media_batch(batch, 0, corpus, index)  # retry: idempotent
    assert sorted(
        r["media_id"] for r in spark.read.parquet(corpus).collect()
    ) == [1, 3]
