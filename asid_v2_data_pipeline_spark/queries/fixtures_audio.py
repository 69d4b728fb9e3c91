"""Fixture builders for the audio codec queries (r12, VERDICT r11
task 4): the ``mapInPandas`` kernels that synthesize media-fixture
payload BYTES for ``queries/audio.py`` — encode + container mux
standing in for bytes that at production scale already sit in object
storage (see ``_shared._cached_media``).  Split out so audio.py stays
a query module; ``all_queries()``/``all_oracles()`` keys are
unchanged.  Function sources are byte-identical to their pre-split
form, so the media-cache fingerprints (AST with docstrings stripped)
are preserved.
"""

from __future__ import annotations

from .graph import _FLAC_BLOCK, _FLAC_RATE
from .oracles_mp3 import _MP3_GG

_MP3_MKV_TICKS = 26  # ~1152/44100 s per frame at the 1 ms default scale

# mono frames per document = eight granule segments with fixed block
# types and per-frame bitrates (VBR exercises the reservoir packing)
# seg 5 is a MIXED block (r9 second pass), seg 6 pure short:
# long,long | long,long | start,mixed | short,stop — every transition
# valid (start->mixed, mixed->short, short->stop)
_MP3G_BT = (0, 0, 0, 0, 1, 2, 2, 3)
_MP3G_MIXED = (0, 0, 0, 0, 0, 1, 0, 0)
_MP3G_KBPS = (320, 256, 224, 320)
_MP3G_V5 = (0, 1, 2, -1, -2)  # byte%5 -> table-2 value

def _flac_build(batches, block_size, mux_mkv):
    """Shared fixture kernel for the FLAC queries: each document's
    UTF-8 bytes become interleaved 16-bit big-endian stereo PCM
    (sample[j][c] = raw[4j+2c]·256 + raw[4j+2c+1] − 32768), encoded as
    REAL FLAC — mid/side stereo for even doc_ids, independent for odd,
    so both decorrelation paths run under the oracle.  With
    ``mux_mkv`` the stream is split per the Matroska A_FLAC codec
    mapping: metadata headers into CodecPrivate, one frame per
    SimpleBlock, clusters of 4."""
    import numpy as np
    import pandas as pd

    from ..functions.flac import (
        flac_codec_private,
        flac_frames,
        write_flac,
    )

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            m = len(raw) // 4
            if m == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8, count=4 * m).astype(np.int64)
            samples = (
                (b[0::2] * 256 + b[1::2]) - 32768
            ).reshape(m, 2)
            blob = write_flac(
                samples,
                sample_rate=_FLAC_RATE,
                block_size=block_size,
                bits_per_sample=16,
                stereo_mode="mid_side" if int(did) % 2 == 0 else "independent",
            )
            if not mux_mkv:
                payloads.append(blob)
                continue
            from ..functions.ebml import MkvTrack, write_mkv

            _info, frames = flac_frames(blob)
            tracks = [
                MkvTrack(
                    1,
                    "audio",
                    "A_FLAC",
                    sampling_hz=float(_FLAC_RATE),
                    channels=2,
                    codec_private=flac_codec_private(blob),
                )
            ]
            payloads.append(
                write_mkv(
                    [
                        (1, i * block_size, True, fr)
                        for i, fr in enumerate(frames)
                    ],
                    tracks,
                    cluster_every=4,
                )
            )
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

def _ogg_flac_build(batches):
    """Fixture kernel for ``mm_ogg_flac_rms``: the ``_flac_build``
    native streams (hashed as a dep) wrapped per the FLAC-in-Ogg
    mapping — mapping packet + one frame per audio packet, multi-
    packet pages with CRC-sealed lacing."""
    from ..functions.ogg import write_ogg_flac

    for pdf in _flac_build(batches, _FLAC_BLOCK, False):
        pdf["payload"] = [
            write_ogg_flac(bytes(p)) if p is not None else None
            for p in pdf["payload"]
        ]
        yield pdf

def _mp3_mkv_build(batches):
    """Fixture kernel for ``mm_mkv_mp3_rms``: a data-dependent NUMBER
    of frames per document (F = 1 + n_bytes mod 3, so the decode chain
    length varies per row), built as one mono Layer III stream (segment
    gc = f*2 + g keeps the byte→bitstream mapping of ``_mp3_build``),
    then muxed per the Matroska A_MPEG/L3 codec mapping: one MPEG frame
    per SimpleBlock, no CodecPrivate, clusters of 2."""
    import numpy as np
    import pandas as pd

    from ..functions.ebml import MkvTrack, write_mkv
    from ..functions.mp3 import _FRAME_LEN, write_mp3_l3

    tracks = [
        MkvTrack(1, "audio", "A_MPEG/L3", sampling_hz=44100.0, channels=1)
    ]
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            nf = 1 + nb % 3
            q = np.empty((nf, 2, 576), np.int64)
            sfs = np.empty((nf, 2, 21), np.int64)
            for f in range(nf):
                for g in range(2):
                    gc = f * 2 + g
                    v = b[(576 * gc + np.arange(576)) % nb] % 3
                    q[f, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[f, g] = b[(21 * gc + np.arange(21)) % nb] % 8
            stream = write_mp3_l3(q, sfs, global_gain=_MP3_GG)
            frames = [
                (
                    1,
                    f * _MP3_MKV_TICKS,
                    True,
                    stream[f * _FRAME_LEN : (f + 1) * _FRAME_LEN],
                )
                for f in range(nf)
            ]
            payloads.append(write_mkv(frames, tracks, cluster_every=2))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _mp3_build(batches, nch: int = 1, stereo_mode: str = "independent"):
    """Fixture kernel for the ``mm_mp3*`` queries: document bytes
    become ONE real ID3v2-prefixed MPEG-1 Layer III frame (44.1 kHz,
    320 kbps, Huffman table 1; mono or independent-channel stereo).
    The byte→bitstream mapping the oracle mirrors, over granule-channel
    segments ``gc = g*nch + ch`` (bitstream order): line i of segment
    gc takes its quantized value from byte ``(576·gc + i) mod n``
    (b%3: 0→0, 1→+1, 2→−1); scalefactor band k of segment gc from byte
    ``(21·gc + k) mod n`` (b%8)."""
    import numpy as np
    import pandas as pd

    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            q = np.empty((1, 2, nch, 576), np.int64)
            sfs = np.empty((1, 2, nch, 21), np.int64)
            for g in range(2):
                for ch in range(nch):
                    gc = g * nch + ch
                    v = b[(576 * gc + np.arange(576)) % nb] % 3
                    q[0, g, ch] = np.where(
                        v == 0, 0, np.where(v == 1, 1, -1)
                    )
                    sfs[0, g, ch] = b[(21 * gc + np.arange(21)) % nb] % 8
            if nch == 1:
                q, sfs = q[:, :, 0], sfs[:, :, 0]
            payloads.append(
                write_id3({"TIT2": f"doc {did}"})
                + write_mp3_l3(
                    q, sfs, global_gain=_MP3_GG,
                    stereo_mode=stereo_mode,
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _audio_mixed_build(batches):
    """Fixture kernel for ``mm_audio_multicodec``: a HETEROGENEOUS
    corpus — even doc_ids become real FLAC stereo streams (the
    ``_flac_build`` sample mapping: interleaved 16-bit big-endian pairs
    from the UTF-8 bytes; mid/side for doc_id % 4 == 0), odd doc_ids
    become ID3-prefixed mono Layer III (the ``_mp3_build`` mapping)."""
    import numpy as np
    import pandas as pd

    from ..functions.flac import write_flac
    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if did % 2 == 0:
                m = nb // 4
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=4 * m).astype(
                    np.int64
                )
                samples = ((b[0::2] * 256 + b[1::2]) - 32768).reshape(m, 2)
                payloads.append(
                    write_flac(
                        samples,
                        sample_rate=_FLAC_RATE,
                        block_size=4096,
                        stereo_mode=(
                            "mid_side" if did % 4 == 0 else "independent"
                        ),
                    )
                )
            else:
                if nb == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8).astype(np.int64)
                q = np.empty((1, 2, 576), np.int64)
                sfs = np.empty((1, 2, 21), np.int64)
                for g in range(2):
                    v = b[(576 * g + np.arange(576)) % nb] % 3
                    q[0, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[0, g] = b[(21 * g + np.arange(21)) % nb] % 8
                payloads.append(
                    write_id3({"TIT2": f"doc {did}"})
                    + write_mp3_l3(q, sfs, global_gain=_MP3_GG)
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _audio_mixed3_build(batches):
    """Fixture kernel for ``mm_audio_multicodec3`` (r9, VERDICT r8
    task 3): THREE codecs through one funnel — ``doc_id % 3 == 0``
    becomes real FLAC stereo, ``% 3 == 1`` ID3-prefixed mono Layer III,
    ``% 3 == 2`` a RIFF/WAVE container with mono 16-bit PCM (the most
    common raw-audio container, previously absent from the dispatch).
    The WAV samples use the same big-endian byte-pair mapping as FLAC,
    so both lossless arms re-derive from the pre-encode octets."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_wav
    from ..functions.flac import write_flac
    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            arm = did % 3
            if arm == 0:
                m = nb // 4
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=4 * m).astype(
                    np.int64
                )
                samples = ((b[0::2] * 256 + b[1::2]) - 32768).reshape(m, 2)
                payloads.append(
                    write_flac(
                        samples,
                        sample_rate=_FLAC_RATE,
                        block_size=4096,
                        stereo_mode=(
                            "mid_side" if did % 6 == 0 else "independent"
                        ),
                    )
                )
            elif arm == 1:
                if nb == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8).astype(np.int64)
                q = np.empty((1, 2, 576), np.int64)
                sfs = np.empty((1, 2, 21), np.int64)
                for g in range(2):
                    v = b[(576 * g + np.arange(576)) % nb] % 3
                    q[0, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[0, g] = b[(21 * g + np.arange(21)) % nb] % 8
                payloads.append(
                    write_id3({"TIT2": f"doc {did}"})
                    + write_mp3_l3(q, sfs, global_gain=_MP3_GG)
                )
            else:
                m = nb // 2
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=2 * m).astype(
                    np.int64
                )
                pcm = ((b[0::2] * 256 + b[1::2]) - 32768).astype(np.int16)
                payloads.append(write_wav(pcm, sample_rate=_FLAC_RATE))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _audio_mixed4_build(batches):
    """Fixture kernel for ``mm_audio_multicodec4`` (r10): FOUR
    containers through one funnel — ``doc_id % 4 == 0`` real FLAC
    stereo, ``% 4 == 1`` ID3-prefixed mono Layer III, ``% 4 == 2``
    RIFF/WAVE mono 16-bit PCM, ``% 4 == 3`` AIFF mono 16-bit PCM
    (big-endian IFF with the 80-bit extended-float sample rate).  The
    three lossless arms share the big-endian byte-pair mapping, so
    they re-derive from the pre-encode octets."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_aiff, write_wav
    from ..functions.flac import write_flac
    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            arm = did % 4
            if arm == 0:
                m = nb // 4
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=4 * m).astype(
                    np.int64
                )
                samples = ((b[0::2] * 256 + b[1::2]) - 32768).reshape(m, 2)
                payloads.append(
                    write_flac(
                        samples,
                        sample_rate=_FLAC_RATE,
                        block_size=4096,
                        stereo_mode=(
                            "mid_side" if did % 8 == 0 else "independent"
                        ),
                    )
                )
            elif arm == 1:
                if nb == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8).astype(np.int64)
                q = np.empty((1, 2, 576), np.int64)
                sfs = np.empty((1, 2, 21), np.int64)
                for g in range(2):
                    v = b[(576 * g + np.arange(576)) % nb] % 3
                    q[0, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[0, g] = b[(21 * g + np.arange(21)) % nb] % 8
                payloads.append(
                    write_id3({"TIT2": f"doc {did}"})
                    + write_mp3_l3(q, sfs, global_gain=_MP3_GG)
                )
            else:
                m = nb // 2
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=2 * m).astype(
                    np.int64
                )
                pcm = ((b[0::2] * 256 + b[1::2]) - 32768).astype(np.int16)
                payloads.append(
                    write_wav(pcm, sample_rate=_FLAC_RATE)
                    if arm == 2
                    else write_aiff(pcm, sample_rate=_FLAC_RATE)
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _audio_quarantine_build(batches):
    """Fixture kernel for ``mm_audio_quarantine`` (r10): every doc a
    mono 16-bit PCM WAV from the big-endian octet-pair mapping, and
    docs with ``doc_id % 7 == 3`` get their RIFF magic destroyed — a
    deterministic corrupt-subset so the quarantine path itself is
    oracle-checkable."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_wav

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            m = len(raw) // 2
            if m == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8, count=2 * m).astype(np.int64)
            pcm = ((b[0::2] * 256 + b[1::2]) - 32768).astype(np.int16)
            blob = write_wav(pcm, sample_rate=_FLAC_RATE)
            if did % 7 == 3:
                blob = b"JUNK" + blob[4:]  # magic broken -> must reject
            payloads.append(blob)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _mp3_general_build(batches):
    """Fixture kernel for ``mm_mp3_general``: each document becomes an
    ID3v2-prefixed GENERAL-profile Layer III stream — four mono frames
    at varying bitrates (the bit reservoir genuinely engages), a valid
    long→start→MIXED→short→stop window sequence, Huffman table 2 +
    count1 quads + preflag on segments 0/3 (table B on seg 0, the
    variable-length table A on seg 3), scfsi sharing + a
    scalefac_scale=1 granule on frame 0, and a short granule with
    byte-derived subblock_gain and per-window scalefactors.

    Byte→bitstream mapping (the oracle mirrors it, segment
    ``seg = 2f+g``): line i of seg takes byte ``(576·seg+i) mod n`` —
    %5 mapped over {0,±1,±2} in the table-2 region (lines 0..35 of
    segs 0/3), %3 over {0,±1} elsewhere; segs 0/3 transmit 162
    big-value lines + 96 count1 lines and zero the rest.  Long
    scalefactor band k of seg: byte ``(21·seg+k) mod n`` %8 (seg 1
    shares bands 11..20 with seg 0 via scfsi); the short seg's
    36 per-window scalefactors sit at ``21·seg + 3·sfb + w`` and its
    subblock gains at ``21·seg + 36 + w``."""
    import numpy as np
    import pandas as pd

    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3_general

    v5 = np.array(_MP3G_V5, np.int64)

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            frames = []
            for f in range(4):
                grans = []
                for g in range(2):
                    seg = 2 * f + g
                    bt = _MP3G_BT[seg]
                    idx = (576 * seg + np.arange(576)) % nb
                    q = np.zeros(576, np.int64)
                    if seg in (0, 3):
                        q[:36] = v5[b[idx[:36]] % 5]
                        m3 = b[idx[36:258]] % 3
                        q[36:258] = np.where(
                            m3 == 0, 0, np.where(m3 == 1, 1, -1)
                        )
                        bv, nq, tsel = 81, 24, [2, 1, 1]
                    else:
                        m3 = b[idx] % 3
                        q[:] = np.where(
                            m3 == 0, 0, np.where(m3 == 1, 1, -1)
                        )
                        bv, nq, tsel = 288, 0, [1, 1, 1]
                    if bt == 2:
                        mixed = bool(_MP3G_MIXED[seg])
                        sfs3 = (
                            b[
                                (
                                    21 * seg
                                    + 3 * np.arange(12)[:, None]
                                    + np.arange(3)[None, :]
                                )
                                % nb
                            ]
                            % 8
                        )
                        sbg = [
                            int(b[(21 * seg + 36 + w) % nb] % 8)
                            for w in range(3)
                        ]
                        gran = {
                            "block_type": 2,
                            "mixed": mixed,
                            "spectrum": q,
                            "big_values": bv,
                            "count1": nq,
                            "scalefacs_short": sfs3,
                            "subblock_gain": sbg,
                            "scalefac_scale": 0,
                            "table_select": tsel[:2],
                            "global_gain": _MP3_GG,
                        }
                        if mixed:
                            # long sfbs 0..7 from bytes 39..46 of the
                            # segment's sf range; short rows 0..2 zero
                            sfs3[:3] = 0
                            gran["scalefacs_short"] = sfs3
                            gran["scalefacs_long"] = (
                                b[(21 * seg + 39 + np.arange(8)) % nb]
                                % 8
                            )
                        grans.append(gran)
                    else:
                        sf = b[(21 * seg + np.arange(21)) % nb] % 8
                        if seg == 1:  # scfsi groups 2+3 share seg 0's
                            sf[11:21] = b[np.arange(11, 21) % nb] % 8
                        grans.append({
                            "block_type": bt,
                            "spectrum": q,
                            "big_values": bv,
                            "count1": nq,
                            # seg 0 codes its quads under count1 table
                            # B, seg 3 under the variable-length table
                            # A (r9) — both transport, zero oracle
                            # footprint
                            "count1_table": "A" if seg == 3 else "B",
                            "scalefacs": sf,
                            "preflag": 1 if seg in (0, 3) else 0,
                            "scalefac_scale": 1 if seg == 1 else 0,
                            "table_select": tsel,
                            "global_gain": _MP3_GG,
                        })
                frames.append({
                    "kbps": _MP3G_KBPS[f],
                    "scfsi": 0b0011 if f == 0 else 0,
                    # frame 2 is CRC-protected: the decoder verifies
                    # the error-check word (pure transport, no oracle
                    # footprint)
                    "crc": f == 2,
                    "granules": grans,
                })
            payloads.append(
                write_id3({"TIT2": f"doc {did}"})
                + write_mp3_l3_general(frames)
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _mp3_intensity_build(batches):
    """Fixture kernel for ``mm_mp3_intensity_rms``: stereo frames in
    joint-stereo mode 01 / mode_ext 01 — the left channel carries the
    full 576-line spectrum, the right channel transmits only its first
    134 lines (sfb 15 bound) and its scalefactors in bands 15..20 are
    byte-derived is_pos positions (%7, so 0..6).  Same %3 value and %8
    scalefactor byte mappings as ``_mp3_build``."""
    import numpy as np
    import pandas as pd

    from ..functions.id3 import write_id3
    from ..functions.mp3 import _IS_BV, write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            q = np.zeros((1, 2, 2, 576), np.int64)
            sfs = np.empty((1, 2, 2, 21), np.int64)
            for g in range(2):
                for ch in range(2):
                    gc = g * 2 + ch
                    lines = 576 if ch == 0 else 2 * _IS_BV
                    v = b[(576 * gc + np.arange(lines)) % nb] % 3
                    q[0, g, ch, :lines] = np.where(
                        v == 0, 0, np.where(v == 1, 1, -1)
                    )
                    sfs[0, g, ch] = b[(21 * gc + np.arange(21)) % nb] % 8
                # right bands 15..20 are is_pos: cap at 6
                sfs[0, g, 1, 15:21] %= 7
            payloads.append(
                write_id3({"TIT2": f"doc {did}"})
                + write_mp3_l3(
                    q, sfs, global_gain=_MP3_GG,
                    stereo_mode="intensity",
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _ogg_vorbis_build(batches):
    """Fixture kernel for ``mm_ogg_vorbis_meta``: per document, a
    complete Ogg-Vorbis stream — spec-legal identification, comment
    and FULL setup headers (codebooks/floors/residues/mappings/modes,
    ``functions/vorbis.py``) plus ``len(text) mod 7`` placeholder
    audio packets (opaque by the adjudicated decode boundary).
    Channels/rate/bitrate/tags derive from doc_id and the text, so
    the oracle reconstructs every column from the documents table."""
    import pandas as pd

    from ..functions.vorbis import write_ogg_vorbis

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            payloads.append(
                write_ogg_vorbis(
                    channels=1 + did % 2,
                    rate=8000 * (1 + did % 4),
                    tags={"TITLE": t[:12], "SOURCE": f"doc{did}"},
                    n_audio_packets=len(t) % 7,
                    bitrate_nominal=1000 * (1 + did % 5),
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _ogg_opus_build(batches):
    """Fixture kernel for ``mm_ogg_opus_meta``: per document, an Ogg
    stream of RFC 7845 OpusHead/OpusTags plus TOC-skeleton audio
    packets whose config and frame-count code derive from the text
    bytes — so the oracle replays the RFC 6716 §3.1 duration table
    from the documents table.  SILK/CELT payloads stay opaque
    (SCALE.md §Vorbis float-codec boundary)."""
    import pandas as pd

    from ..functions.opus import opus_packet, write_ogg_opus

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            n_pkts = min(len(t) % 6, len(t) // 2)
            pkts = []
            for i in range(n_pkts):
                c = ord(t[2 * i]) % 32
                code = ord(t[2 * i + 1]) % 3
                pkts.append(opus_packet(c, code))
            payloads.append(
                write_ogg_opus(
                    channels=1 + did % 2,
                    tags={"TITLE": t[:12], "SOURCE": f"doc{did}"},
                    packets=pkts,
                    pre_skip=100 + did % 200,
                    input_rate=8000 * (1 + did % 6),
                    gain_q8=(did % 17) - 8,
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )

def _ogg_meta_quar_build(batches):
    """Fixture kernel for ``mm_ogg_meta_quarantine``: the Vorbis/Opus
    dispatch corpus (codec by doc parity, metadata from doc_id/text as
    in the two clean fixtures) with a deterministically corrupted
    subset — ``doc_id % 5 == 2`` gets a flipped byte inside the first
    header page, so the CRC check converts it to a quarantine row."""
    import pandas as pd

    from ..functions.opus import opus_packet, write_ogg_opus
    from ..functions.vorbis import write_ogg_vorbis

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            if did % 2 == 0:
                blob = write_ogg_vorbis(
                    channels=1 + did % 2,
                    rate=8000 * (1 + did % 4),
                    tags={"TITLE": t[:12]},
                    n_audio_packets=len(t) % 7,
                )
            else:
                n_pkts = min(len(t) % 6, len(t) // 2)
                blob = write_ogg_opus(
                    channels=1,
                    tags={"TITLE": t[:12]},
                    packets=[
                        opus_packet(
                            ord(t[2 * i]) % 32, ord(t[2 * i + 1]) % 3
                        )
                        for i in range(n_pkts)
                    ],
                    pre_skip=0,
                )
            if did % 5 == 2:
                b = bytearray(blob)
                b[30] ^= 0xFF
                blob = bytes(b)
            payloads.append(blob)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )
