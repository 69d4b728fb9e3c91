"""Pure-Python WAV/BMP codecs: container round-trips, palette/stereo
variants, compressed-codec rejection, and the real-decode multimodal
operators (functions/codecs.py, operators/multimodal.py round 5)."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.codecs import (
    parse_bmp,
    parse_wav,
    write_bmp,
    write_wav,
)


def test_wav_u8_mono_roundtrip():
    s = np.arange(100, dtype=np.uint8)
    rate, nch, got = parse_wav(write_wav(s, 8000))
    assert (rate, nch) == (8000, 1)
    np.testing.assert_array_equal(got[:, 0], s)


def test_wav_i16_stereo_roundtrip():
    s = (np.arange(40, dtype=np.int16).reshape(20, 2) - 10) * 1000
    rate, nch, got = parse_wav(write_wav(s, 44100))
    assert (rate, nch) == (44100, 2)
    np.testing.assert_array_equal(got, s)


def test_wav_odd_data_padding():
    """RIFF chunks are word-aligned: an odd-length 8-bit data chunk gets
    a pad byte that must not leak into the samples."""
    s = np.arange(7, dtype=np.uint8)
    blob = write_wav(s, 8000)
    assert len(blob) % 2 == 0
    _r, _c, got = parse_wav(blob)
    assert got.shape == (7, 1)


def test_wav_rejects_non_pcm_and_garbage():
    s = np.arange(8, dtype=np.uint8)
    blob = bytearray(write_wav(s, 8000))
    i = blob.index(b"fmt ") + 8
    blob[i : i + 2] = (85).to_bytes(2, "little")  # claim MP3 (format 85)
    with pytest.raises(NotImplementedError, match="not PCM"):
        parse_wav(bytes(blob))
    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"\x00" * 44)


def test_bmp_24bit_roundtrip_with_row_padding():
    """Width 3 -> 9-byte rows padded to 12; bottom-up BGR storage must
    round-trip to top-down RGB exactly."""
    rgb = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    got = parse_bmp(write_bmp(rgb))
    np.testing.assert_array_equal(got, rgb)


def test_bmp_grayscale_roundtrip():
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    got = parse_bmp(write_bmp(gray))
    assert (got[:, :, 0] == got[:, :, 1]).all()
    np.testing.assert_array_equal(got[:, :, 0], gray)


def test_bmp_8bit_palette():
    """Hand-built 8-bit palette BMP (2x2, identity grayscale palette):
    palette expansion and bottom-up order."""
    import struct

    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))  # BGRA
    rows = bytes([10, 20, 0, 0]) + bytes([30, 40, 0, 0])  # bottom-up, padded
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(rows), 0, 0, 256, 0)
    off = 14 + len(dib) + len(pal)
    head = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    got = parse_bmp(head + dib + pal + rows)
    np.testing.assert_array_equal(
        got[:, :, 0], np.array([[30, 40], [10, 20]], dtype=np.uint8)
    )


def test_bmp_rejects_foreign_compression_and_garbage():
    import struct

    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(write_bmp(rgb))
    blob[30:34] = struct.pack("<I", 4)  # BI_JPEG (RLE8 decodes now)
    with pytest.raises(NotImplementedError, match="compression"):
        parse_bmp(bytes(blob))
    # RLE8 flag on non-8-bit data is malformed, not merely unsupported
    blob[30:34] = struct.pack("<I", 1)
    with pytest.raises(ValueError, match="RLE8"):
        parse_bmp(bytes(blob))
    with pytest.raises(ValueError, match="BMP"):
        parse_bmp(b"\x00" * 64)


def test_bmp_rle8_decode():
    """Hand-built BI_RLE8 stream: encoded runs, absolute mode (odd
    length -> word pad), end-of-line, a delta skip (skipped pixels
    stay palette index 0), end-of-bitmap."""
    import struct

    w, h = 6, 3
    # bottom-up rows: the stream writes row y=0 (bottom) first
    rle = bytes(
        [
            3, 5,            # run: 3 x index 5
            0, 3, 1, 2, 3, 0,  # absolute: escape, count 3, literals, pad
            0, 0,            # EOL -> next row up
            2, 9,            # run: 2 x 9
            0, 2, 2, 1,      # delta: skip dx=2, dy=1 (to top row, x=4)
            2, 4,            # run on the top row
            0, 1,            # EOD
        ]
    )
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))  # BGRA
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 0, 0, 256, 0
    )
    off = 14 + len(dib) + len(pal)
    head = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
    got = parse_bmp(head + dib + pal + rle)
    want = np.zeros((h, w), dtype=np.uint8)
    want[2] = [5, 5, 5, 1, 2, 3]   # bottom row -> top-down index 2
    want[1, :2] = 9                 # middle row
    want[0, 4:6] = 4                # delta lands on the top row
    np.testing.assert_array_equal(got[:, :, 0], want)


def test_decode_stub_rejects_compressed_magic():
    from asid_v2_data_pipeline_spark.operators.multimodal import DecodeStub

    with pytest.raises(NotImplementedError, match="compressed codec"):
        DecodeStub.decode(b"\x1a\x45\xdf\xa3" + b"\x00" * 16)  # WebM
    with pytest.raises(NotImplementedError, match="compressed codec"):
        DecodeStub.decode(b"ID3\x04" + b"\x00" * 16)  # MP3
    assert len(DecodeStub.decode(b"plain bytes")) == 8


def test_decode_wav_rms_operator(spark):
    """Real container through the Spark operator: known samples -> exact
    centered sum-of-squares per window."""
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_wav_rms,
    )

    s = np.array([128, 130, 126, 128, 138, 118, 128, 128], dtype=np.uint8)
    rows = [(1, bytearray(write_wav(s, 8000)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["win_no"]: (r["sum_sq"], r["sample_rate"])
        for r in decode_wav_rms(media, 4).collect()
    }
    # centered: [0,2,-2,0] -> 8 ; [10,-10,0,0] -> 200
    assert got == {0: (8, 8000), 1: (200, 8000)}


def test_decode_bmp_pool_operator(spark):
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_bmp_pool,
    )

    gray = np.arange(16, dtype=np.uint8).reshape(4, 4)
    media = spark.createDataFrame(
        [(1, bytearray(write_bmp(gray)))], "media_id long, payload binary"
    )
    r = decode_bmp_pool(media, 2).collect()[0]
    assert (r["width"], r["height"]) == (4, 4)
    want = gray.astype(float).reshape(2, 2, 2, 2).mean(axis=(1, 3)).ravel()
    assert r["pooled"] == pytest.approx(list(want))


def test_png_roundtrip_all_color_types_and_filters():
    """PNG writer/parser: every color type (gray, gray+alpha, RGB,
    RGBA), with both the all-None and the filter-cycling writer modes
    (the latter forces the reader through Sub/Up/Average/Paeth)."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_png,
        write_png,
    )

    rng = np.random.RandomState(3)
    for shape in [(5, 7), (6, 4, 1), (4, 6, 2), (5, 5, 3), (3, 8, 4)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        for mode in ("none", "cycle"):
            got = parse_png(write_png(a, filter_mode=mode))
            want = a if a.ndim == 3 else a[:, :, None]
            np.testing.assert_array_equal(got, want)


def test_png_palette_and_rejects():
    import struct
    import zlib as z

    from asid_v2_data_pipeline_spark.functions.codecs import (
        PNG_MAGIC,
        parse_png,
    )

    # hand-built 2x2 palette PNG (color type 3, identity gray palette)
    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", z.crc32(t + b) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = b"".join(bytes([i, i, i]) for i in range(256))
    raw = bytes([0, 10, 20]) + bytes([0, 30, 40])  # filter 0 rows
    blob = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", z.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = parse_png(blob)
    np.testing.assert_array_equal(
        got[:, :, 0], np.array([[10, 20], [30, 40]], dtype=np.uint8)
    )

    with pytest.raises(ValueError, match="not a PNG"):
        parse_png(b"\x00" * 16)
    # depth 3 is not a legal PNG bit depth (16-bit decodes for real now)
    ihdr3 = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    blob3 = PNG_MAGIC + chunk(b"IHDR", ihdr3) + chunk(
        b"IDAT", z.compress(b"\x00" * 18)
    ) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth"):
        parse_png(blob3)


def test_decode_image_pool_dispatches_bmp_and_png(spark):
    from asid_v2_data_pipeline_spark.functions.codecs import (
        write_bmp,
        write_png,
    )
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_image_pool,
    )

    gray = np.arange(16, dtype=np.uint8).reshape(4, 4)
    media = spark.createDataFrame(
        [
            (1, bytearray(write_bmp(gray))),
            (2, bytearray(write_png(gray, filter_mode="cycle"))),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r["pooled"] for r in decode_image_pool(media, 2).collect()}
    want = list(gray.astype(float).reshape(2, 2, 2, 2).mean(axis=(1, 3)).ravel())
    assert rows[1] == pytest.approx(want)
    assert rows[2] == pytest.approx(want)


def test_decode_stub_accepts_text_starting_with_id3():
    """Plain text beginning with the letters 'ID3' is NOT an MP3: the
    byte-feature path must histogram it, not crash the job (only a real
    ID3v2 header — version 2/3/4, sync-safe sizes — raises)."""
    from asid_v2_data_pipeline_spark.operators.multimodal import DecodeStub

    assert len(DecodeStub.decode(b"ID3 tags are metadata containers")) == 8
    with pytest.raises(NotImplementedError, match="compressed codec"):
        DecodeStub.decode(b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x00" * 8)


def test_mulaw_wav_roundtrip_and_bounds():
    """G.711 mu-law: decode(encode(x)) matches an independent pure-
    Python model byte-for-byte; the full container round-trips through
    parse_wav; quantization error obeys the segment bound."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _MULAW_TABLE,
        mulaw_encode,
        parse_wav,
        write_wav_mulaw,
    )

    # independent reference encode (branch/loop form, no numpy tricks)
    def ref_encode(x):
        sign = 0x80 if x < 0 else 0
        mag = min(abs(int(x)), 32635) + 0x84
        exp = 7
        for e in range(8):
            if mag < (1 << (e + 8)):
                exp = e
                break
        mant = (mag >> (exp + 3)) & 0x0F
        return ~(sign | (exp << 4) | mant) & 0xFF

    rng = np.random.RandomState(3)
    xs = np.concatenate(
        [
            rng.randint(-32768, 32768, 500),
            np.array([0, 1, -1, 132, -132, 32635, -32635, 32767, -32768]),
        ]
    ).astype(np.int16)
    got = mulaw_encode(xs)
    want = np.array([ref_encode(int(x)) for x in xs], dtype=np.uint8)
    assert np.array_equal(got, want)

    # container round-trip: parse returns the decoded linear samples
    blob = write_wav_mulaw(xs, sample_rate=8000)
    rate, nch, samples = parse_wav(blob)
    assert (rate, nch) == (8000, 1)
    assert np.array_equal(samples[:, 0], _MULAW_TABLE[got])

    # error bound: mu-law quantization error < segment step size
    dec = _MULAW_TABLE[got].astype(np.int64)
    err = np.abs(dec - np.clip(xs.astype(np.int64), -32635, 32635))
    mag = np.abs(np.clip(xs.astype(np.int64), -32635, 32635)) + 0x84
    step = np.array([1 << (int(np.floor(np.log2(m))) - 4) for m in mag])
    assert (err <= step).all()


def test_gif_lzw_roundtrip_and_independent_decoder():
    """GIF write->parse round-trips exactly across palette sizes,
    table-reset stress, and max-compression runs (the KwK LZW case);
    the engine's bit-level LZW output also decodes identically under an
    independent list-based decoder written here."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _lzw_encode,
        parse_gif,
        write_gif,
    )

    rng = np.random.RandomState(7)
    for n_pal, shape in [(4, (8, 8)), (16, (13, 9)), (256, (24, 31)), (2, (5, 5))]:
        pal = rng.randint(0, 256, (n_pal, 3)).astype(np.uint8)
        idx = rng.randint(0, n_pal, shape).astype(np.uint8)
        rgb = parse_gif(write_gif(idx, pal))
        assert np.array_equal(rgb, pal[idx])

    idx = np.zeros((64, 64), dtype=np.uint8)  # KwK-heavy runs
    pal = np.array([[9, 8, 7], [1, 2, 3]], dtype=np.uint8)
    assert np.array_equal(parse_gif(write_gif(idx, pal)), pal[idx])

    # independent LZW decoder (list-table form, different structure)
    def ref_decode(data, mcs, n):
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        bits = []
        for byte in data:
            for i in range(8):
                bits.append((byte >> i) & 1)
        pos, width = 0, mcs + 1
        table = [[i] for i in range(clear)] + [None, None]
        out, prev = [], None
        while len(out) < n and pos + width <= len(bits):
            code = sum(b << i for i, b in enumerate(bits[pos : pos + width]))
            pos += width
            if code == eoi:
                break
            if code == clear:
                table = [[i] for i in range(clear)] + [None, None]
                width, prev = mcs + 1, None
                continue
            if code < len(table) and table[code] is not None:
                entry = list(table[code])
            else:
                entry = prev + [prev[0]]
            out.extend(entry)
            if prev is not None:
                table.append(prev + [entry[0]])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
        return out[:n]

    seq = [int(x) for x in rng.randint(0, 16, 3000)]
    enc = _lzw_encode(seq, 4)
    assert ref_decode(enc, 4, len(seq)) == seq

    # flipping the interlace flag on sequentially-stored data must
    # permute rows (the de-interlace really runs), preserving the
    # pixel multiset; garbage still raises
    import pytest

    pal4 = np.array(
        [[0, 0, 0], [50, 0, 0], [0, 50, 0], [0, 0, 50]], dtype=np.uint8
    )
    idx4 = (np.arange(16, dtype=np.uint8).reshape(4, 4) // 4) % 4
    blob = bytearray(write_gif(idx4, pal4))
    desc = blob.index(0x2C)
    blob[desc + 9] |= 0x40
    reordered = parse_gif(bytes(blob))
    plain = parse_gif(write_gif(idx4, pal4))
    assert not np.array_equal(reordered, plain)
    np.testing.assert_array_equal(
        np.sort(reordered, axis=0), np.sort(plain, axis=0)
    )
    with pytest.raises(ValueError, match="GIF"):
        parse_gif(b"\x00" * 24)


# --- JPEG (baseline sequential, fixed-point integer transform) ------------


def test_jpeg_gray_roundtrip_equals_integer_reference():
    """decode(encode(x)) must equal the fixed-point reference pipeline
    EXACTLY — the property the mm_jpeg_pool oracle is built on.  Any
    drift in Huffman tables, bit stuffing, zigzag, quantization or
    either transform pass shows up here."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        _QUANT_LUMA,
        _dequant_idct,
        _fdct_quant,
        _quality_table,
        parse_jpeg,
        write_jpeg,
    )

    rng = np.random.RandomState(7)
    for quality in (25, 50, 75, 95):
        q = _quality_table(_QUANT_LUMA, quality)
        for _ in range(20):
            x = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
            dec = parse_jpeg(write_jpeg(x, quality=quality))
            ref = _dequant_idct(
                _fdct_quant(x.astype(np.int64) - 128, q), q
            )
            assert np.array_equal(dec, ref)


def test_jpeg_multi_block_and_crop():
    """Non-multiple-of-8 dims: encoder edge-pads, decoder crops back to
    the SOF dimensions; DC prediction chains across blocks."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
    )

    rng = np.random.RandomState(11)
    x = rng.randint(0, 256, size=(19, 30)).astype(np.uint8)
    d = parse_jpeg(write_jpeg(x, quality=90))
    assert d.shape == (19, 30)
    # a smooth gradient survives quantization nearly unchanged
    g = np.linspace(0, 255, 64 * 48).reshape(48, 64).astype(np.uint8)
    d = parse_jpeg(write_jpeg(g, quality=95))
    assert d.shape == (48, 64)
    assert np.mean(np.abs(d.astype(int) - g.astype(int))) < 1.0


def test_jpeg_color_444_roundtrip():
    """3-component 4:4:4 color: container + entropy plumbing identical
    per component, integer YCbCr<->RGB on both sides."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
    )

    g = np.linspace(0, 255, 16 * 16).reshape(16, 16).astype(np.uint8)
    rgb = np.stack([g, g.T, 255 - g], axis=-1).astype(np.uint8)
    d = parse_jpeg(write_jpeg(rgb, quality=95))
    assert d.shape == (16, 16, 3)
    assert np.mean(np.abs(d.astype(int) - rgb.astype(int))) < 3.0


def test_jpeg_unsupported_streams_raise_loudly():
    """Extended sequential (SOF1) raises NotImplementedError; a
    baseline stream whose SOF marker is flipped to SOF2 is a malformed
    hybrid (full-band DC scan) and raises ValueError; garbage raises
    ValueError — never a silent wrong decode."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
    )

    x = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(write_jpeg(x))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC1  # extended sequential
    with pytest.raises(NotImplementedError, match="SOF0"):
        parse_jpeg(bytes(blob))
    blob = bytearray(write_jpeg(x))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # SOF2 marker over a baseline scan structure
    with pytest.raises(ValueError, match="Se=0"):
        parse_jpeg(bytes(blob))
    blob = bytearray(write_jpeg(x))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 11] = 0x22  # 2x2 sampling factors
    with pytest.raises(NotImplementedError, match="4:4:4"):
        parse_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg(b"\x00\x11\x22")


def test_jpeg_magic_dispatch_and_pool_operator(spark):
    """decode_image routes FFD8 payloads to parse_jpeg; the pooled
    operator output matches the reference pipeline pooled by hand."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        _QUANT_LUMA,
        _dequant_idct,
        _fdct_quant,
        _quality_table,
        decode_image,
        write_jpeg,
    )
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_image_pool,
    )

    rng = np.random.RandomState(13)
    x = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
    payload = write_jpeg(x, quality=75)
    assert decode_image(payload).shape == (8, 8)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    out = decode_image_pool(media, 2).collect()[0]
    q = _quality_table(_QUANT_LUMA, 75)
    ref = _dequant_idct(_fdct_quant(x.astype(np.int64) - 128, q), q)
    expect = (
        ref.astype(np.float64).reshape(4, 2, 4, 2).mean(axis=(1, 3)).ravel()
    )
    assert out["width"] == 8 and out["height"] == 8
    assert np.allclose(out["pooled"], expect)


def test_decode_wav_dft_matches_fft_and_is_exact(spark):
    """Fixed-point DFT band powers: exact int64, and (scaled) they track
    numpy's float FFT to the twiddle-rounding bound — both the exactness
    contract (oracle hashability) and the signal meaning."""
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_wav_dft,
        dft_twiddles,
    )

    rng = np.random.RandomState(5)
    s = rng.randint(0, 256, size=32).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(write_wav(s, 8000)))], "media_id long, payload binary"
    )
    rows = decode_wav_dft(media, 8).collect()
    assert len(rows) == 4 * 5  # 4 windows x bins 0..4
    got = {(r["win_no"], r["bin"]): r["power"] for r in rows}
    cos_t, sin_t = dft_twiddles(8)
    c = np.array(cos_t, dtype=np.int64)
    sn = np.array(sin_t, dtype=np.int64)
    x = s.astype(np.int64) - 128
    for w in range(4):
        seg = x[w * 8 : (w + 1) * 8]
        re = c @ seg
        im = sn @ seg
        for b in range(5):
            assert got[(w, b)] == int(re[b] ** 2 + im[b] ** 2)
        # float FFT agreement within the integer-twiddle rounding bound
        f = np.fft.rfft(seg.astype(float))
        scaled = np.sqrt(np.array([got[(w, b)] for b in range(5)], float))
        np.testing.assert_allclose(
            scaled / 4096.0, np.abs(f), atol=0.5, rtol=1e-3
        )


def test_id3_roundtrip_versions_and_encodings():
    """ID3v2.3 (plain frame sizes) and v2.4 (syncsafe), all four text
    encodings, padding skipped, audio split point exact."""
    from asid_v2_data_pipeline_spark.functions.id3 import (
        parse_id3,
        write_id3,
    )

    frames = {"TIT2": "hello world", "TPE1": "en", "TRCK": "42"}
    for major in (3, 4):
        for enc in (0, 1, 2, 3):
            blob = write_id3(
                frames, major=major, encoding=enc, audio=b"\xffAUDIO"
            )
            tags = parse_id3(blob)
            assert tags["_version"][0] == major
            assert tags["TIT2"] == "hello world"
            assert tags["TPE1"] == "en"
            assert tags["TRCK"] == "42"
            assert blob[tags["_tag_bytes"] :] == b"\xffAUDIO"

    with pytest.raises(ValueError, match="not an ID3"):
        parse_id3(b"MP3?" * 4)
    blob = bytearray(write_id3(frames))
    blob[3] = 5  # claim a future ID3v2.5
    with pytest.raises(NotImplementedError, match="2.2/2.3/2.4"):
        parse_id3(bytes(blob))
    blob = bytearray(write_id3(frames))
    blob[5] = 0x40  # extended-header flag with no real extended header:
    # the first frame bytes misparse as a giant size -> overrun raise
    with pytest.raises(ValueError, match="extended header"):
        parse_id3(bytes(blob))


def test_id3_v22_roundtrip():
    """ID3v2.2: 6-byte frame headers with 3-char ids, mapped onto the
    v2.3 names on read; tag/audio split exact."""
    from asid_v2_data_pipeline_spark.functions.id3 import (
        parse_id3,
        write_id3,
    )

    frames = {"TIT2": "old song", "TPE1": "band", "TALB": "lp", "TRCK": "7"}
    for enc in (0, 1, 2, 3):
        blob = write_id3(frames, major=2, encoding=enc, audio=b"\xffA")
        tags = parse_id3(blob)
        assert tags["_version"][0] == 2
        assert tags["TIT2"] == "old song"
        assert tags["TPE1"] == "band"
        assert tags["TALB"] == "lp"
        assert tags["TRCK"] == "7"
        assert blob[tags["_tag_bytes"] :] == b"\xffA"
    # v2.2 frame headers are 7 bytes smaller than v2.3's per frame
    v22 = parse_id3(write_id3(frames, major=2))["_tag_bytes"]
    v23 = parse_id3(write_id3(frames, major=3))["_tag_bytes"]
    assert v23 - v22 == 4 * 4


def test_id3_unsynchronization_matrix():
    """REAL unsynchronization round-trips: UTF-16 bodies carry 0xFF
    (the BOM and many code units), so escape bytes are actually
    inserted — whole-tag for v2.2/v2.3 (header size counts expanded
    bytes), per-frame for v2.4 (syncsafe size of expanded body).  The
    audio split point stays exact and no false sync survives in the
    tag."""
    from asid_v2_data_pipeline_spark.functions.id3 import (
        _unsync_decode,
        _unsync_encode,
        parse_id3,
        write_id3,
    )

    # the escape scheme itself round-trips on adversarial byte runs
    for data in (
        b"\xff\x00", b"\xff\xe0", b"\xff\xfb\x90", b"\xff", b"",
        b"\xff\xff\xff", b"ok\xff\x00\xff", bytes(range(256)),
    ):
        enc = _unsync_encode(data)
        assert _unsync_decode(enc) == data
        # no FF followed by a sync-pattern byte survives encoding
        assert not any(
            enc[i] == 0xFF and enc[i + 1] >= 0xE0
            for i in range(len(enc) - 1)
        )

    frames = {"TIT2": "hýllo wörld", "TPE1": "bänd"}
    for major in (2, 3, 4):
        for enc_id in (0, 1, 2, 3):
            blob = write_id3(
                frames, major=major, encoding=enc_id, unsync=True,
                audio=b"\xff\xfb!",
            )
            if enc_id == 1:  # UTF-16 BOM FF FE: real escapes inserted
                plain = write_id3(
                    frames, major=major, encoding=enc_id, audio=b"\xff\xfb!"
                )
                assert len(blob) > len(plain)
            tags = parse_id3(blob)
            assert tags["TIT2"] == "hýllo wörld", (major, enc_id)
            assert tags["TPE1"] == "bänd", (major, enc_id)
            assert blob[tags["_tag_bytes"] :] == b"\xff\xfb!", (major, enc_id)


def test_gif_background_index_out_of_range_falls_back():
    """ADVICE r8: a malformed GIF whose background index exceeds the
    global color table must not raise a raw numpy IndexError — the
    canvas falls back to black for the uncovered region."""
    import numpy as np
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_gif_frames,
        write_gif_anim,
    )

    pal = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    frame = np.zeros((2, 2), dtype=np.uint8)
    blob = bytearray(
        write_gif_anim([frame], pal, [10], rects=[(1, 1)], screen=(4, 4))
    )
    blob[11] = 7  # background index beyond the 2-entry color table
    frames = parse_gif_frames(bytes(blob))
    # uncovered canvas = black fallback, the frame still composes
    first = frames[0][1]
    assert first.shape == (4, 4, 3)
    assert (first[0, 0] == 0).all()
    assert (first[1, 1] == pal[0]).all()


def test_id3_grouping_identity_flag_orderings():
    """ADVICE r8: v2.3 stores the flag-derived fields in FLAG order —
    4-byte decompressed size (0x80) BEFORE the grouping byte (0x20) —
    and v2.4's grouping byte (format 0x40) leads the frame data, before
    the per-frame-unsynced body.  Both must decode; combined with
    compression/unsync the orderings are where the r8 bug lived."""
    from asid_v2_data_pipeline_spark.functions.id3 import (
        parse_id3,
        write_id3,
    )

    frames = {"TIT2": "grouped tïtle", "TALB": "älbum"}
    # v2.3: group alone, compress alone, and both (size-then-group)
    for compress in (False, True):
        blob = write_id3(
            frames, major=3, compress=compress, group=0x41,
            audio=b"\xff\xfb!",
        )
        tags = parse_id3(blob)
        assert tags["TIT2"] == "grouped tïtle", compress
        assert blob[tags["_tag_bytes"]:] == b"\xff\xfb!"
    # v2.4: group byte before the (compressed, unsynced) body
    for compress in (False, True):
        for unsync in (False, True):
            blob = write_id3(
                frames, major=4, compress=compress, unsync=unsync,
                group=0xFF,  # worst case: group byte looks like sync
                audio=b"\xff\xfb!",
            )
            tags = parse_id3(blob)
            assert tags["TALB"] == "älbum", (compress, unsync)


def test_extract_id3_tags_operator(spark):
    from asid_v2_data_pipeline_spark.functions.id3 import write_id3
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        extract_id3_tags,
    )

    blob = write_id3(
        {"TIT2": "t", "TALB": "a"}, major=4, audio=b"x" * 10
    )
    media = spark.createDataFrame(
        [(3, bytearray(blob))], "media_id long, payload binary"
    )
    r = extract_id3_tags(media).collect()[0]
    assert (r["major"], r["title"], r["album"]) == (4, "t", "a")
    assert r["artist"] is None and r["audio_bytes"] == 10


def test_mp3_frame_walk_exact_and_guards():
    """Frame-header walking: VBR census + exact duration; desync, mixed
    sample rates, truncation and non-MPEG1/L3 streams raise."""
    from asid_v2_data_pipeline_spark.functions.id3 import (
        parse_mp3_frames,
        write_mp3,
    )

    blob = write_mp3(
        [128, 192, 64], paddings=[0, 1, 0],
        id3_frames={"TIT2": "song", "TPE1": "band"},
    )
    info = parse_mp3_frames(blob)
    assert info["n_frames"] == 3
    assert info["sample_rate"] == 44100
    assert info["kbps_sum"] == 128 + 192 + 64
    assert info["duration_us"] == 3 * 1152 * 1_000_000 // 44100
    # ID3v1 trailer terminates the walk cleanly
    info2 = parse_mp3_frames(write_mp3([128]) + b"TAG" + b"\x00" * 125)
    assert info2["n_frames"] == 1

    with pytest.raises(ValueError, match="lost sync"):
        parse_mp3_frames(write_mp3([128]) + b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="truncated final"):
        parse_mp3_frames(write_mp3([128])[:-10])
    bad = bytearray(write_mp3([128]))
    bad[1] = (bad[1] & ~0x18) | 0x08  # version bits 01 = reserved
    with pytest.raises(ValueError, match="reserved"):
        parse_mp3_frames(bytes(bad))
    with pytest.raises(ValueError, match="no audio frames"):
        parse_mp3_frames(b"")
    # a homogeneous stream whose second frame flips version must raise
    # (or desync), never average two incompatible families
    two = write_mp3([64, 64], sample_rate=22050, version="2", layer=3)
    flip = bytearray(two)
    second = 4 + (72 * 64 * 1000 // 22050) - 4  # after first frame
    flip[second + 1] |= 0x18  # claim MPEG-1 on frame 2
    with pytest.raises(ValueError):
        parse_mp3_frames(bytes(flip))


def test_mp3_version_layer_matrix():
    """MPEG-1/2/2.5 × Layer I/II/III: frame-length formulas (Layer I
    4-byte slots; MPEG-2/2.5 L3 half-length), per-family bitrate
    tables, samples-per-frame and exact durations all round-trip."""
    from asid_v2_data_pipeline_spark.functions.id3 import (
        _MP3_BITRATE_TABLES,
        _MP3_RATE_TABLES,
        _mp3_spf,
        parse_mp3_frames,
        write_mp3,
    )

    for version in ("1", "2", "2.5"):
        for layer in (1, 2, 3):
            group = "1" if version == "1" else "2"
            table = _MP3_BITRATE_TABLES[(group, layer)]
            kbps = [table[0], table[5], table[-1]]
            sr = _MP3_RATE_TABLES[version][1]
            blob = write_mp3(
                kbps, sample_rate=sr, paddings=[1, 0, 1],
                id3_frames={"TIT2": "x"}, version=version, layer=layer,
            )
            info = parse_mp3_frames(blob)
            assert info["n_frames"] == 3, (version, layer)
            assert info["sample_rate"] == sr
            assert info["kbps_sum"] == sum(kbps)
            assert info["version"] == version
            assert info["layer"] == layer
            spf = _mp3_spf(version, layer)
            assert info["duration_us"] == 3 * spf * 1_000_000 // sr


def test_mp3_stream_info_operator(spark):
    from asid_v2_data_pipeline_spark.functions.id3 import write_mp3
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        mp3_stream_info,
    )

    media = spark.createDataFrame(
        [(5, bytearray(write_mp3([64, 64])))],
        "media_id long, payload binary",
    )
    r = mp3_stream_info(media).collect()[0]
    assert (r["n_frames"], r["kbps_sum"]) == (2, 128)
    assert r["duration_us"] == 2 * 1152 * 1_000_000 // 44100


def test_jpeg_restart_intervals():
    """DRI + RSTn: every interval the stream byte-aligns, emits the
    cycling restart marker and resets DC predictors — decode equals the
    no-restart decode bit-for-bit (same quantization), gray and color,
    at intervals that do and don't divide the MCU count."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
    )

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, (24, 32), dtype=np.uint8)  # 12 MCUs
    rgb = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    rgb = np.stack([rgb, rgb // 2, 255 - rgb], axis=-1)  # 6 MCUs
    for px in (gray, rgb):
        base = parse_jpeg(write_jpeg(px, quality=80))
        for ri in (1, 2, 5):
            blob = write_jpeg(px, quality=80, restart_interval=ri)
            assert b"\xff\xdd" in blob
            n_mcus = (px.shape[0] // 8) * (px.shape[1] // 8)
            n_markers = sum(
                blob.count(bytes([0xFF, 0xD0 + m])) for m in range(8)
            )
            assert n_markers >= (n_mcus - 1) // ri
            np.testing.assert_array_equal(parse_jpeg(blob), base)
    # a stream whose markers are out of sequence raises, not misdecodes
    blob = bytearray(write_jpeg(gray, quality=80, restart_interval=2))
    first = blob.index(b"\xff\xd0")
    blob[first + 1] = 0xD3  # RST0 -> RST3
    with pytest.raises(ValueError, match="out of sequence"):
        parse_jpeg(bytes(blob))


def test_jpeg_progressive_equals_baseline():
    """Progressive (SOF2) transmits the SAME quantized coefficients as
    baseline, only reordered — so for every shape / quality /
    subsampling the progressive encode must decode bit-for-bit equal
    to the baseline encode of the same pixels.  This is the r10
    correctness pin: any bug in spectral selection, successive
    approximation, EOB-run coding, or the refinement correction bits
    breaks the equality."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
        write_jpeg_progressive,
    )

    rng = np.random.RandomState(42)
    cases = [
        ((8, 8), "444"),
        ((24, 17), "444"),
        ((16, 16, 3), "444"),
        ((24, 17, 3), "444"),
        ((32, 32, 3), "420"),
        ((40, 33, 3), "420"),  # luma ceil-grid < MCU grid
    ]
    for shape, sub in cases:
        for quality in (25, 60, 92):
            px = rng.randint(0, 256, shape).astype(np.uint8)
            base = parse_jpeg(write_jpeg(px, quality, subsampling=sub))
            blob = write_jpeg_progressive(px, quality, subsampling=sub)
            assert b"\xff\xc2" in blob  # really SOF2
            assert blob.count(b"\xff\xda") > 1  # really multi-scan
            np.testing.assert_array_equal(parse_jpeg(blob), base)


def test_jpeg_progressive_restarts_and_custom_scripts():
    """Restart markers inside progressive scans (DC-predictor + EOB-run
    reset at byte-aligned RSTn) and non-default scan scripts — per-
    component DC scans (non-interleaved traversal), split AC bands,
    3-bit-deep successive approximation — all decode equal to
    baseline."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
        write_jpeg_progressive,
    )

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (40, 33, 3)).astype(np.uint8)
    base = parse_jpeg(write_jpeg(px, 70, subsampling="420"))
    for ri in (1, 3, 7):
        blob = write_jpeg_progressive(
            px, 70, subsampling="420", restart_interval=ri
        )
        assert any(bytes([0xFF, 0xD0 + m]) in blob for m in range(8))
        np.testing.assert_array_equal(parse_jpeg(blob), base)
    script = [
        ((0,), 0, 0, 0, 2), ((1,), 0, 0, 0, 2), ((2,), 0, 0, 0, 2),
        ((0,), 1, 1, 0, 1), ((0,), 2, 63, 0, 1),
        ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
        ((0,), 0, 0, 2, 1), ((1,), 0, 0, 2, 1), ((2,), 0, 0, 2, 1),
        ((0,), 0, 0, 1, 0), ((1,), 0, 0, 1, 0), ((2,), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]
    np.testing.assert_array_equal(
        parse_jpeg(
            write_jpeg_progressive(px, 70, subsampling="420", scans=script)
        ),
        base,
    )
    deep = [
        ((0,), 0, 0, 0, 3), ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2),
        ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0), ((0,), 0, 0, 3, 2),
        ((0,), 0, 0, 2, 1), ((0,), 0, 0, 1, 0),
    ]
    g = rng.randint(0, 256, (17, 9)).astype(np.uint8)
    np.testing.assert_array_equal(
        parse_jpeg(write_jpeg_progressive(g, 50, scans=deep)),
        parse_jpeg(write_jpeg(g, 50)),
    )


def test_jpeg_progressive_scan_script_validation():
    """Illegal or incomplete scan scripts are rejected at WRITE time:
    an incomplete script would encode fine but decode unequal to
    baseline, so the writer refuses it loudly."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        write_jpeg_progressive,
    )

    px = np.zeros((8, 8), dtype=np.uint8)
    bad = [
        ([((0,), 0, 5, 0, 0)], "Se=0"),  # DC scan with AC band
        ([((0, 0), 0, 0, 0, 0)], "component list"),  # duplicate comp
        ([((0,), 1, 63, 0, 0)], "AC before DC"),  # AC without DC
        (  # refinement skips a bit
            [((0,), 0, 0, 0, 2), ((0,), 0, 0, 2, 0), ((0,), 1, 63, 0, 0)],
            "exactly 1",
        ),
        (  # never reaches bit 0
            [((0,), 0, 0, 0, 1), ((0,), 1, 63, 0, 0)],
            "incomplete",
        ),
        (  # same band transmitted twice as first
            [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0), ((0,), 1, 63, 0, 0)],
            "sequence invalid",
        ),
    ]
    for scans, msg in bad:
        with pytest.raises(ValueError, match=msg):
            write_jpeg_progressive(px, scans=scans)


def test_jpeg_randomized_roundtrip_matrix():
    """Seeded randomized matrix (VERDICT r10 task 2 — the discipline
    that caught the MP3 region-boundary bug): random shapes, gray/RGB,
    qualities, subsampling, restart intervals, and randomly GENERATED
    legal progressive scan scripts.  Every combination must satisfy
    progressive == baseline decode, and the baseline must equal the
    fixed-point reference pipeline (already pinned elsewhere for 8×8).
    Fixed seed: failures reproduce."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
        write_jpeg_progressive,
    )

    rng = np.random.RandomState(1234)

    def random_script(ncomp):
        """A random legal, complete script: random DC hold-back bit,
        random AC band split points and approximation depth."""
        dc_al = int(rng.randint(0, 3))
        scans = [(tuple(range(ncomp)), 0, 0, 0, dc_al)]
        for al in range(dc_al, 0, -1):
            scans.append((tuple(range(ncomp)), 0, 0, al, al - 1))
        for c in range(ncomp):
            ac_al = int(rng.randint(0, 3))
            # random split of 1..63 into 1-3 bands
            nb = int(rng.randint(1, 4))
            cuts = sorted(rng.choice(range(2, 63), nb - 1, replace=False))
            bounds = [1] + [int(x) for x in cuts] + [64]
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                scans.append(((c,), b0, b1 - 1, 0, ac_al))
            for al in range(ac_al, 0, -1):
                scans.append(((c,), 1, 63, al, al - 1))
        return scans

    for trial in range(24):
        gray = bool(rng.randint(0, 2))
        h = int(rng.randint(1, 49))
        w = int(rng.randint(1, 49))
        shape = (h, w) if gray else (h, w, 3)
        px = rng.randint(0, 256, shape).astype(np.uint8)
        quality = int(rng.randint(5, 99))
        sub = "444" if gray or rng.randint(0, 2) else "420"
        ri = int(rng.choice([0, 0, 1, 2, 5]))
        base = parse_jpeg(
            write_jpeg(px, quality, restart_interval=ri, subsampling=sub)
        )
        blob = write_jpeg_progressive(
            px,
            quality,
            subsampling=sub,
            scans=random_script(1 if gray else 3),
            restart_interval=ri,
        )
        prog = parse_jpeg(blob)
        assert np.array_equal(prog, base), (
            f"trial {trial}: shape={shape} q={quality} sub={sub} ri={ri}"
        )


def test_gif_interlace_and_local_palette():
    """Interlaced GIFs (four-pass row order) and local color tables
    decode identically to the plain form."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_gif,
        write_gif,
    )

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    for h, w in ((13, 6), (8, 8), (1, 5), (3, 4)):
        idx = rng.randint(0, 16, (h, w), dtype=np.uint8)
        want = parse_gif(write_gif(idx, pal))
        np.testing.assert_array_equal(want, pal[idx])
        np.testing.assert_array_equal(
            parse_gif(write_gif(idx, pal, interlace=True)), want
        )
        np.testing.assert_array_equal(
            parse_gif(write_gif(idx, pal, local_palette=True)), want
        )
        np.testing.assert_array_equal(
            parse_gif(
                write_gif(idx, pal, interlace=True, local_palette=True)
            ),
            want,
        )


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 chroma subsampling (the dominant real-world JPEG form):
    MCU = four Y blocks + Cb + Cr over a 16x16 tile.  The decoded image
    equals a block-by-block reference built from the module's own
    transform helpers (pins the MCU interleave, quarter-res chroma and
    replication upsample wiring), and constant-color images survive
    nearly exactly; works with restart intervals and odd dimensions."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        _QUANT_CHROMA,
        _QUANT_LUMA,
        _dequant_idct,
        _fdct_quant,
        _pad_to,
        _quality_table,
        _rgb_to_ycbcr_int,
        _ycbcr_to_rgb_int,
        parse_jpeg,
        write_jpeg,
    )

    rng = np.random.RandomState(13)

    def reference_420(px, quality):
        ycc = _rgb_to_ycbcr_int(px)
        qy = _quality_table(_QUANT_LUMA, quality)
        qc = _quality_table(_QUANT_CHROMA, quality)
        y = _pad_to(ycc[..., 0].astype(np.int64), 16)
        hh, ww = y.shape
        planes, qts, subs = [y], [qy], [1]
        for ci in (1, 2):
            c = _pad_to(ycc[..., ci].astype(np.int64), 16)
            planes.append(
                c.reshape(hh // 2, 2, ww // 2, 2).sum(axis=(1, 3)) // 4
            )
            qts.append(qc)
            subs.append(2)
        outs = []
        for plane, qt, s in zip(planes, qts, subs):
            out = np.zeros_like(plane)
            for r in range(0, plane.shape[0], 8):
                for c in range(0, plane.shape[1], 8):
                    blk = plane[r : r + 8, c : c + 8] - 128
                    out[r : r + 8, c : c + 8] = _dequant_idct(
                        _fdct_quant(blk, qt), qt
                    )
            outs.append(np.repeat(np.repeat(out, s, 0), s, 1))
        h, w = px.shape[:2]
        ycc2 = np.stack([o[:h, :w] for o in outs], axis=-1)
        return _ycbcr_to_rgb_int(ycc2)

    for shape, ri in (((16, 16), 0), ((24, 40), 0), ((13, 19), 2)):
        px = rng.randint(0, 256, shape + (3,), dtype=np.uint8)
        blob = write_jpeg(
            px, quality=80, subsampling="420", restart_interval=ri
        )
        # SOF carries the 2x2 luma sampling factor
        sof = blob.index(b"\xff\xc0")
        assert blob[sof + 11] == 0x22
        got = parse_jpeg(blob)
        np.testing.assert_array_equal(got, reference_420(px, 80))

    # constant color: subsampling loses nothing
    flat = np.full((32, 32, 3), 0, dtype=np.uint8)
    flat[..., 0] = 180
    flat[..., 1] = 90
    flat[..., 2] = 40
    got = parse_jpeg(write_jpeg(flat, quality=95, subsampling="420"))
    assert np.abs(got.astype(int) - flat.astype(int)).max() <= 3

    # 444 output is byte-identical to the pre-subsampling writer path
    gray = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    assert write_jpeg(gray, quality=75) == write_jpeg(
        gray, quality=75, subsampling="444"
    )


def test_png_adam7_interlace_roundtrip():
    """ADAM7 interlacing: seven independently-filtered sub-images
    scattered on the pass grid — every color type, both filter modes,
    odd sizes (including dimensions with empty passes)."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_png,
        write_png,
    )

    rng = np.random.RandomState(17)
    for shape in [(9, 11), (8, 8, 3), (1, 1), (3, 2, 4), (16, 5, 2), (2, 13)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        want = a if a.ndim == 3 else a[:, :, None]
        for mode in ("none", "cycle"):
            blob = write_png(a, filter_mode=mode, interlace=True)
            assert blob[8 + 8 + 12] == 1  # IHDR interlace byte
            np.testing.assert_array_equal(parse_png(blob), want)


def test_bmp_16_and_32_bit():
    """Hand-built 32-bit BGRX and 16-bit X1R5G5B5 BMPs decode: alpha
    dropped, 5-bit channels replicated to 8-bit, bottom-up order."""
    import struct

    def bmp(width, height, bits, rows):
        dib = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bits, 0, len(rows),
            0, 0, 0, 0,
        )
        off = 14 + len(dib)
        head = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
        return head + dib + rows

    # 32-bit, 2x2, bottom-up: rows are BGRX
    rows32 = (
        bytes([10, 20, 30, 255]) + bytes([40, 50, 60, 0])  # bottom row
        + bytes([1, 2, 3, 9]) + bytes([4, 5, 6, 7])  # top row
    )
    got = parse_bmp(bmp(2, 2, 32, rows32))
    np.testing.assert_array_equal(
        got,
        np.array(
            [[[3, 2, 1], [6, 5, 4]], [[30, 20, 10], [60, 50, 40]]],
            dtype=np.uint8,
        ),
    )

    # 16-bit 555: red 31, green 16, blue 5 in one pixel; width 1 rows
    # pad to 4 bytes
    pix = (31 << 10) | (16 << 5) | 5
    rows16 = struct.pack("<H", pix) + b"\x00\x00"
    got = parse_bmp(bmp(1, 1, 16, rows16))
    def rep(c):
        return (c << 3) | (c >> 2)
    np.testing.assert_array_equal(
        got[0, 0], np.array([rep(31), rep(16), rep(5)], dtype=np.uint8)
    )


def test_alaw_wav_roundtrip_codebook_identity_and_bounds():
    """G.711 A-law: encode is the exact inverse image of the decode
    table (all 256 codes), the container round-trips through parse_wav
    with audio_format=6, and quantization error obeys the segment
    bound."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _ALAW_TABLE,
        alaw_encode,
        parse_wav,
        write_wav_alaw,
    )

    # codebook identity: encode(decode(c)) == c for every code
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_encode(_ALAW_TABLE[codes]), codes)

    rng = np.random.RandomState(5)
    xs = np.concatenate(
        [
            rng.randint(-32768, 32768, 500),
            np.array([0, 1, -1, 8, -8, 256, -256, 32767, -32768]),
        ]
    ).astype(np.int16)
    got = alaw_encode(xs)
    blob = write_wav_alaw(xs, sample_rate=8000)
    rate, nch, samples = parse_wav(blob)
    assert (rate, nch) == (8000, 1)
    assert np.array_equal(samples[:, 0], _ALAW_TABLE[got])

    # segment bound: |decode(encode(x)) - x| < 2^(seg+4) step
    dec = _ALAW_TABLE[got].astype(np.int64)
    err = np.abs(dec - xs.astype(np.int64))
    seg = np.maximum(
        (np.floor(np.log2(np.maximum(np.abs(xs.astype(np.int64)), 1)))
         .astype(np.int64) - 7),
        0,
    )
    assert np.all(err <= (1 << (seg + 4)))


def test_wav_24_and_32_bit_pcm_roundtrip():
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_wav,
        write_wav,
    )

    rng = np.random.RandomState(7)
    x24 = rng.randint(-(1 << 23), 1 << 23, (300, 2)).astype(np.int32)
    rate, nch, got = parse_wav(write_wav(x24, 16000, bits=24))
    assert (rate, nch) == (16000, 2)
    assert got.dtype == np.int32 and np.array_equal(got, x24)

    x32 = rng.randint(-(1 << 31), (1 << 31) - 1, (200, 1)).astype(np.int32)
    rate, _nch, got = parse_wav(write_wav(x32, 8000))
    assert np.array_equal(got, x32)

    with pytest.raises(ValueError, match="24-bit"):
        write_wav(np.array([[1 << 23]], dtype=np.int32), bits=24)


def test_wav_extensible_subformat_resolves():
    """WAVE_FORMAT_EXTENSIBLE: the fmt tag is 0xFFFE and the real
    format hides in the SubFormat GUID — how real-world 24-bit PCM is
    usually tagged."""
    import struct

    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_wav,
        write_wav,
    )

    x = np.arange(-100, 100, dtype=np.int32) * 1000
    blob = bytearray(write_wav(x, 8000, bits=24))
    # rewrite the 16-byte fmt chunk as a 40-byte extensible one
    i = blob.index(b"fmt ")
    base = blob[i + 8 : i + 24]
    ext = struct.pack("<HHI", 22, 24, 0) + struct.pack("<H", 1) + b"\0" * 14
    newfmt = b"fmt " + struct.pack("<I", 40) + b"\xfe\xff" + base[2:] + ext
    out = bytes(blob[:i]) + newfmt + bytes(blob[i + 24 :])
    # fix RIFF size (+24 bytes of fmt growth)
    out = (
        out[:4]
        + struct.pack("<I", struct.unpack_from("<I", out, 4)[0] + 24)
        + out[8:]
    )
    rate, nch, got = parse_wav(out)
    assert (rate, nch) == (8000, 1)
    assert np.array_equal(got[:, 0], x)


def test_id3_extended_headers_skipped():
    """v2.3 (plain size excluding itself) and v2.4 (syncsafe size
    including the fixed part) extended headers are skipped; frames
    after them parse normally."""
    from asid_v2_data_pipeline_spark.functions.id3 import (
        parse_id3,
        write_id3,
    )

    for major in (3, 4):
        blob = bytearray(
            write_id3({"TIT2": "hello", "TALB": "world"}, major=major)
        )
        size0 = (
            (blob[6] << 21) | (blob[7] << 14) | (blob[8] << 7) | blob[9]
        )
        if major == 3:
            ext = (6).to_bytes(4, "big") + b"\0\0" + b"\0\0\0\0"  # 4+6
        else:
            ext = bytes([0, 0, 0, 10]) + bytes([1, 0]) + b"\0\0\0\0"  # 10
        tag = ext + bytes(blob[10:])
        new_size = size0 + len(ext)
        hdr = bytes(blob[:5]) + bytes([blob[5] | 0x40]) + bytes(
            [
                (new_size >> 21) & 0x7F,
                (new_size >> 14) & 0x7F,
                (new_size >> 7) & 0x7F,
                new_size & 0x7F,
            ]
        )
        out = parse_id3(hdr + tag)
        assert out["TIT2"] == "hello" and out["TALB"] == "world", major
        assert out["_tag_bytes"] == 10 + new_size


@pytest.mark.parametrize("depth", [1, 2, 4, 16])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_bit_depths_roundtrip(depth, interlace):
    """Sub-byte grayscale (big-endian-first packed rows) and 16-bit
    (network order) PNGs round-trip through all five filters at the
    spec's bpp offset, plain and Adam7."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_png,
        write_png,
    )

    rng = np.random.RandomState(depth * 7 + interlace)
    h, w = 13, 11  # odd dims: ragged packing + uneven Adam7 passes
    if depth == 16:
        px = rng.randint(0, 1 << 16, (h, w, 3)).astype(np.uint16)
    else:
        px = rng.randint(0, 1 << depth, (h, w)).astype(np.uint8)
    blob = write_png(px, depth=depth, interlace=interlace)
    got = parse_png(blob)
    want = px if px.ndim == 3 else px[:, :, None]
    assert got.dtype == want.dtype
    assert np.array_equal(got, want)


def test_png_depth_validation():
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import write_png

    with pytest.raises(ValueError, match="exceed"):
        write_png(np.array([[4]], dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="grayscale"):
        write_png(np.zeros((2, 2, 3), dtype=np.uint8), depth=4)


def test_ima_adpcm_wav_roundtrip():
    """IMA/DVI ADPCM (WAV format 17): REAL 4:1 audio compression — the
    encoder tracks the decoder's reconstruction exactly (no drift), so
    the quantization error per sample is bounded by the running step
    size; blocks re-seed the predictor, the fact chunk truncates the
    final block's padding, and a hand-computed nibble fixture pins the
    state machine."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _IMA_STEPS,
        ima_adpcm_decode_block,
        ima_adpcm_encode,
        parse_wav,
        write_wav_ima,
    )

    # hand-pinned state machine: pred=0, index=0 (step 7); nibble 5
    # -> diff = 7>>3 + 7>>2 + 0 = 0+1... compute independently:
    # diff = (7>>3) + (7>>2)*[bit0] ... canonical: 0 + 1(step>>2,bit0)
    #        + 3(step>>1,bit2? no) -> nibble 5 = bits 0and2: diff=0+?:
    # decode table walk done longhand in the assert below
    blk = bytes([0, 0, 0, 0, 0x05])  # pred 0, idx 0, one byte of codes
    out = ima_adpcm_decode_block(blk, 3)
    step = int(_IMA_STEPS[0])  # 7
    d5 = (step >> 3) + (step >> 2) + step  # nibble 5 = bits 0+2 -> +1 +7
    assert out[0] == 0 and out[1] == d5
    # second nibble 0 at the updated index
    i2 = max(0, min(88, 0 + 4))  # index table[5&7] = 4
    assert out[2] == out[1] + (int(_IMA_STEPS[i2]) >> 3)

    # smooth tone: reconstruction tracks within the step bound and the
    # container round-trips (multi-block: 1000 samples, 256-byte align)
    t = np.arange(1000)
    x = (np.sin(t / 9.0) * 9000).astype(np.int16)
    blob = write_wav_ima(x, 8000, block_align=256)
    rate, nch, got = parse_wav(blob)
    assert (rate, nch) == (8000, 1)
    assert got.shape == (1000, 1)
    assert len(blob) < x.nbytes  # it actually compresses (4:1-ish)
    err = np.abs(got[:, 0].astype(np.int64) - x.astype(np.int64))
    # the first few samples are the classic IMA attack transient (the
    # step index adapts up from 0); after adaptation the error stays
    # within the running step size
    assert err.mean() < 200 and err[16:].max() < 2000

    # payload-level round-trip sanity: re-decoding the encoder's own
    # blocks reproduces the decoder-tracked predictions exactly
    data, spb = ima_adpcm_encode(x, 256)
    first = ima_adpcm_decode_block(data[:256], spb)
    assert np.array_equal(first[:, 0], got[: spb, 0])


def test_ima_adpcm_stereo_roundtrip():
    """Stereo IMA: per-channel headers + codes interleaved in 4-byte
    groups; channels carry independent predictors/step indexes."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_wav,
        write_wav_ima,
    )

    t = np.arange(700)
    x = np.stack(
        [
            (np.sin(t / 9.0) * 9000).astype(np.int16),
            (np.cos(t / 5.0) * 3000).astype(np.int16),
        ],
        axis=1,
    )
    blob = write_wav_ima(x, 16000, block_align=256)
    rate, nch, got = parse_wav(blob)
    assert (rate, nch) == (16000, 2)
    assert got.shape == (700, 2)
    err = np.abs(got.astype(np.int64) - x.astype(np.int64))
    assert err.mean() < 200 and err[16:].max() < 2000
    # channels are independent: a mono encode of channel 0 must equal
    # the stereo decode's channel 0 exactly (same state machine walk)
    _r, _c, mono = parse_wav(write_wav_ima(x[:, 0], 16000, block_align=132))
    # (different block size -> different reseed points; just bound it)
    assert np.abs(
        mono[:, 0].astype(np.int64) - x[:, 0].astype(np.int64)
    ).mean() < 200


def test_property_id3_random_tag_roundtrip():
    """Hypothesis: random frame texts (incl. non-ASCII that forces
    UTF-16 0xFF bytes through real unsynchronization escape insertion)
    x version x encoding x unsync all parse back exactly, with the
    tag/audio split intact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from asid_v2_data_pipeline_spark.functions.id3 import (
        parse_id3,
        write_id3,
    )

    text = st.text(
        alphabet=st.characters(
            min_codepoint=0x20,
            max_codepoint=0xFFEF,
            categories=("L", "N", "P", "S", "Z"),
        ),
        min_size=0,
        max_size=24,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        title=text,
        album=text,
        major=st.sampled_from([2, 3, 4]),
        encoding=st.sampled_from([0, 1, 3]),
        unsync=st.booleans(),
        n_audio=st.integers(0, 16),
    )
    def check(title, album, major, encoding, unsync, n_audio):
        if encoding == 0:
            # Latin-1 cannot carry the fullwidth range; restrict
            title = "".join(c for c in title if ord(c) < 0x7F)
            album = "".join(c for c in album if ord(c) < 0x7F)
        frames = {"TIT2": title, "TALB": album}
        audio = bytes(range(255, 255 - n_audio, -1))  # 0xFF-leading
        blob = write_id3(
            frames,
            major=major,
            encoding=encoding,
            unsync=unsync,
            audio=audio,
        )
        tags = parse_id3(blob)
        assert tags["_version"][0] == major
        assert tags["TIT2"] == title
        assert tags["TALB"] == album
        assert blob[tags["_tag_bytes"] :] == audio

    check()


def test_gif_animation_composition():
    """Animated GIF: full-frame sequences round-trip exactly through
    the identity palette; sub-rectangle updates compose onto the
    canvas; transparent indices keep the underlying pixels; disposal 3
    restores the previous canvas."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_gif_frames,
        write_gif_anim,
    )

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, 256, (8, 8)).astype(np.uint8) for _ in range(4)
    ]
    got = parse_gif_frames(
        write_gif_anim(frames, pal, [10, 20, 30, 40])
    )
    assert [d for d, _ in got] == [10, 20, 30, 40]
    for (d, rgb), f in zip(got, frames):
        np.testing.assert_array_equal(rgb[:, :, 0], f)

    base = frames[0]
    patch = rng.randint(0, 256, (4, 4)).astype(np.uint8)
    got = parse_gif_frames(
        write_gif_anim(
            [base, patch], pal, [5, 5], rects=[(0, 0), (2, 3)],
            screen=(8, 8),
        )
    )
    want = base.copy()
    want[3:7, 2:6] = patch
    np.testing.assert_array_equal(got[1][1][:, :, 0], want)

    f2 = patch.copy()
    f2[0, :] = 7  # transparent index keeps the canvas
    got = parse_gif_frames(
        write_gif_anim(
            [base, f2], pal, [5, 5], rects=[(0, 0), (0, 0)],
            screen=(8, 8), transparent=7,
        )
    )
    want = base.copy()
    sel = f2 != 7
    want[:4, :4][sel] = f2[sel]
    np.testing.assert_array_equal(got[1][1][:4, :4, 0], want[:4, :4])

    got = parse_gif_frames(
        write_gif_anim(
            [base, patch, base], pal, [1, 1, 1],
            rects=[(0, 0), (0, 0), (0, 0)], screen=(8, 8), disposal=3,
        )
    )
    np.testing.assert_array_equal(got[2][1][:, :, 0], base)


def test_gif_multi_palette_composes_in_rgb():
    """ADVICE r7: frames carrying DIFFERENT local color tables must
    compose in RGB — leftover pixels from an earlier frame keep the
    colors of THEIR palette, and a small later palette must not be
    indexed by the earlier frame's larger indices."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_gif_frames,
        write_gif_anim,
    )

    # frame 0: full 8x8 under a 4-entry palette, uses index 3 (red-ish)
    pal_a = np.array(
        [[0, 0, 0], [10, 20, 30], [40, 50, 60], [200, 0, 0]], np.uint8
    )
    f0 = np.full((8, 8), 3, np.uint8)
    # frame 1: a 2x2 patch under a DIFFERENT 2-entry palette
    pal_b = np.array([[0, 0, 255], [0, 255, 0]], np.uint8)
    f1 = np.array([[0, 1], [1, 0]], np.uint8)
    blob = write_gif_anim(
        [f0, f1],
        np.zeros((2, 3), np.uint8),  # global table: background only
        [5, 5],
        rects=[(0, 0), (3, 3)],
        screen=(8, 8),
        local_palettes=[pal_a, pal_b],
    )
    got = parse_gif_frames(blob)
    # composed frame 1: patch in pal_b colors, everything else still
    # pal_a's red — the old index-canvas composition would have mapped
    # index 3 through the 2-entry pal_b (IndexError / wrong colors)
    rgb = got[1][1]
    np.testing.assert_array_equal(rgb[3:5, 3:5], pal_b[f1])
    np.testing.assert_array_equal(rgb[0, 0], pal_a[3])
    np.testing.assert_array_equal(rgb[7, 7], pal_a[3])


def test_bmp_rle8_truncated_delta_raises_valueerror():
    """ADVICE r7: a BI_RLE8 stream cut inside a delta escape's (dx,dy)
    operands raises the module's ValueError, not IndexError."""
    import struct

    import numpy as np
    import pytest

    from asid_v2_data_pipeline_spark.functions.codecs import parse_bmp

    def blob(rle):
        pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
        dib = struct.pack(
            "<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(rle), 0, 0, 256, 0
        )
        off = 14 + len(dib) + len(pal)
        head = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
        return head + dib + pal + rle

    # delta escape (0, 2) with only dx present — dy is cut off
    with pytest.raises(ValueError, match="truncated"):
        parse_bmp(blob(bytes([2, 7, 0, 2, 1])))
    # absolute mode promising 3 literals but carrying only 1
    with pytest.raises(ValueError, match="truncated"):
        parse_bmp(blob(bytes([0, 3, 5])))
    # intact stream still decodes
    got = parse_bmp(blob(bytes([2, 7, 0, 2, 1, 0, 0, 1])))
    assert got.shape == (2, 4, 3)


def test_id3_compressed_frames_roundtrip():
    """VERDICT r7 task 5: zlib-compressed frame bodies — v2.4 (format
    bits 0x08|0x01, syncsafe data-length indicator) and v2.3 (0x80,
    plain 4-byte size) — decode through the existing encoding/unsync
    matrix; encryption bits still raise; a size-indicator mismatch is
    malformed, not silently wrong."""
    import struct
    import zlib

    import pytest

    from asid_v2_data_pipeline_spark.functions.id3 import (
        parse_id3,
        write_id3,
    )

    frames = {"TIT2": "hýllo wörld" * 20, "TPE1": "bänd"}
    for major in (3, 4):
        for enc_id in (0, 1, 2, 3):
            if major == 3 and enc_id in (2, 3):
                continue  # v2.4-only encodings
            for unsync in (False, True):
                blob = write_id3(
                    frames, major=major, encoding=enc_id,
                    unsync=unsync, compress=True, audio=b"\xff\xfb!",
                )
                plain = write_id3(
                    frames, major=major, encoding=enc_id,
                    unsync=unsync, audio=b"\xff\xfb!",
                )
                assert len(blob) < len(plain)  # it really compressed
                tags = parse_id3(blob)
                assert tags["TIT2"] == "hýllo wörld" * 20
                assert tags["TPE1"] == "bänd"
                assert blob[tags["_tag_bytes"]:] == b"\xff\xfb!"

    with pytest.raises(ValueError, match="2.2"):
        write_id3(frames, major=2, compress=True)

    # encrypted frames stay raised (v2.4 bit 0x04, v2.3 bit 0x40)
    b4 = bytearray(write_id3({"TIT2": "x"}, major=4))
    b4[10 + 9] |= 0x04
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_id3(bytes(b4))
    b3 = bytearray(write_id3({"TIT2": "x"}, major=3))
    b3[10 + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_id3(bytes(b3))

    # compression flag without the mandatory data-length indicator
    b4 = bytearray(write_id3({"TIT2": "x"}, major=4))
    b4[10 + 9] |= 0x08
    with pytest.raises(ValueError, match="data length"):
        parse_id3(bytes(b4))

    # size-indicator mismatch is detected
    body = bytes([3]) + "t".encode()
    comp = zlib.compress(body)
    wrong = (
        b"TIT2"
        + bytes([0, 0, 0, len(comp) + 4])
        + bytes([0, 0x08 | 0x01])
        + bytes([0, 0, 0, len(body) + 1])  # wrong syncsafe size
        + comp
    )
    tag = wrong + b"\x00" * 8
    blob = b"ID3" + bytes([4, 0, 0]) + bytes(
        [0, 0, len(tag) >> 7, len(tag) & 0x7F]
    ) + tag
    with pytest.raises(ValueError, match="mismatch"):
        parse_id3(blob)


def test_png_randomized_roundtrip_matrix():
    """Seeded randomized matrix (VERDICT r10 task 2): PNG must round
    trip EXACTLY across every (depth, channels, filter mode,
    interlace) combination at random shapes incl. 1-pixel edges and
    widths that leave partial bytes at sub-byte depths.  Fixed seed:
    failures reproduce."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_png,
        write_png,
    )

    rng = np.random.RandomState(77)
    for trial in range(40):
        depth = int(rng.choice([1, 2, 4, 8, 8, 16]))
        ch = 1 if depth in (1, 2, 4) else int(rng.randint(1, 5))
        h = int(rng.randint(1, 41))
        w = int(rng.randint(1, 41))
        hi = (1 << depth) if depth <= 8 else 65536
        shape = (h, w) if ch == 1 else (h, w, ch)
        x = rng.randint(0, hi, shape)
        x = x.astype(np.uint16 if depth == 16 else np.uint8)
        fm = str(rng.choice(["none", "cycle"]))
        il = bool(rng.randint(0, 2))
        lvl = int(rng.choice([1, 6, 9]))
        got = parse_png(
            write_png(x, filter_mode=fm, level=lvl, interlace=il,
                      depth=depth)
        )
        want = x if ch == 1 else x
        assert np.array_equal(np.squeeze(got), np.squeeze(want)), (
            f"trial {trial}: depth={depth} ch={ch} {h}x{w} fm={fm} "
            f"il={il} lvl={lvl}"
        )


def test_gif_randomized_roundtrip_matrix():
    """Seeded randomized matrix (VERDICT r10 task 2): static GIFs at
    random palette widths (LZW min code size 2..8), interlace and
    local-palette paths — exact palette-lookup round trip; animated
    GIFs with random sub-rectangle updates, disposal 1/3 and a
    transparent index, checked against an INDEPENDENT in-test canvas
    compositor (differential model, not the parser's own output).
    Fixed seed: failures reproduce."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_gif,
        parse_gif_frames,
        write_gif,
        write_gif_anim,
    )

    rng = np.random.RandomState(99)
    for trial in range(25):
        kbits = int(rng.randint(1, 9))
        npal = 1 << kbits
        pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
        h = int(rng.randint(1, 33))
        w = int(rng.randint(1, 33))
        idx = rng.randint(0, npal, (h, w)).astype(np.uint8)
        il = bool(rng.randint(0, 2))
        lp = bool(rng.randint(0, 2))
        got = parse_gif(write_gif(idx, pal, interlace=il, local_palette=lp))
        assert np.array_equal(got, pal[idx]), (
            f"trial {trial}: npal={npal} {h}x{w} il={il} lp={lp}"
        )

    for trial in range(12):
        kbits = int(rng.randint(2, 9))
        npal = 1 << kbits
        pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
        H = int(rng.randint(6, 21))
        W = int(rng.randint(6, 21))
        nfr = int(rng.randint(2, 6))
        disposal = int(rng.choice([1, 3]))
        transparent = int(rng.randint(0, npal)) if rng.randint(0, 2) else None
        frames = [rng.randint(0, npal, (H, W)).astype(np.uint8)]
        rects = [(0, 0)]
        for _ in range(nfr - 1):
            fh = int(rng.randint(1, H + 1))
            fw = int(rng.randint(1, W + 1))
            frames.append(rng.randint(0, npal, (fh, fw)).astype(np.uint8))
            rects.append(
                (int(rng.randint(0, W - fw + 1)),
                 int(rng.randint(0, H - fh + 1)))
            )
        delays = [int(rng.randint(1, 100)) for _ in range(nfr)]
        blob = write_gif_anim(
            frames, pal, delays, rects=rects, screen=(H, W),
            disposal=disposal, transparent=transparent,
        )
        got = parse_gif_frames(blob)
        # independent compositor: disposal 1 leaves the frame in
        # place, disposal 3 restores the pre-frame canvas; a
        # transparent index never overwrites
        canvas = np.zeros((H, W), dtype=np.int64)
        if transparent is not None:
            # frame 0 may itself carry transparent pixels over the
            # (unspecified) initial canvas; skip those trials' frame 0
            # check by seeding the canvas with the parser-independent
            # convention "background = index 0"
            canvas[:] = 0
        for fi in range(nfr):
            x, y = rects[fi]
            fh, fw = frames[fi].shape
            before = canvas.copy()
            region = canvas[y : y + fh, x : x + fw]
            if transparent is None:
                region[:] = frames[fi]
            else:
                sel = frames[fi] != transparent
                region[sel] = frames[fi][sel]
            assert got[fi][0] == delays[fi]
            np.testing.assert_array_equal(
                got[fi][1], pal[canvas], err_msg=(
                    f"trial {trial} frame {fi}: disposal={disposal} "
                    f"transparent={transparent} rects={rects}"
                ),
            )
            if disposal == 3:
                canvas = before


def test_ima_adpcm_randomized_matrix():
    """Seeded randomized matrix (VERDICT r10 task 2): random channel
    counts, block aligns (block re-seed boundaries land everywhere in
    the signal) and lengths that end mid-block.  The container decode
    is checked against an INDEPENDENT in-test nibble walker over the
    raw payload bytes (headers, 4-byte channel interleave, step table
    walk) — a differential model of the whole format, not a bound.
    Fixed seed: failures reproduce."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _ima_step,
        ima_adpcm_encode,
        parse_wav,
        write_wav_ima,
    )

    def model_decode(data: bytes, spb: int, ch: int, n: int) -> np.ndarray:
        """Scalar reference: parse each block independently."""
        ba = 4 * ch + (spb - 1) * ch // 2
        out = []
        for b0 in range(0, len(data), ba):
            blk = data[b0 : b0 + ba]
            preds, idxs = [], []
            for c in range(ch):
                o = 4 * c
                preds.append(
                    int.from_bytes(blk[o : o + 2], "little", signed=True)
                )
                idxs.append(blk[o + 2])
            samples = [[p] for p in preds]
            body = blk[4 * ch :]
            # nibbles per channel, 4-byte groups interleaved
            nibs = [[] for _ in range(ch)]
            for g0 in range(0, len(body), 4 * ch):
                for c in range(ch):
                    for byte in body[g0 + 4 * c : g0 + 4 * c + 4]:
                        nibs[c].append(byte & 0x0F)
                        nibs[c].append(byte >> 4)
            for c in range(ch):
                pred, index = preds[c], idxs[c]
                for nib in nibs[c][: spb - 1]:
                    pred, index = _ima_step(pred, index, nib)
                    samples[c].append(pred)
            out.append(np.stack([np.array(s) for s in samples], axis=1))
        return np.concatenate(out, axis=0)[:n]

    rng = np.random.RandomState(55)
    for trial in range(20):
        ch = int(rng.choice([1, 2]))
        ba = int(rng.choice([64, 128, 132, 256, 512]))
        if ch == 2 and ba % 8:
            ba = 128
        n = int(rng.randint(1, 901))
        kind = int(rng.randint(0, 3))
        if kind == 0:
            x = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
        elif kind == 1:
            t = np.arange(n)[:, None] + np.arange(ch)[None, :]
            x = (np.sin(t / 7.0) * 12000).astype(np.int16)
        else:
            x = np.zeros((n, ch), dtype=np.int16)
            x[:: max(1, n // 7)] = 31000
        blob = write_wav_ima(x, 8000, block_align=ba)
        rate, nch, got = parse_wav(blob)
        assert (rate, nch, got.shape) == (8000, ch, (n, ch))
        data, spb = ima_adpcm_encode(x, ba)
        want = model_decode(data, spb, ch, n)
        assert np.array_equal(got.astype(np.int64), want), (
            f"trial {trial}: ch={ch} ba={ba} n={n} kind={kind}"
        )
        # block headers carry the first sample of each block exactly
        starts = np.arange(0, n, spb)
        np.testing.assert_array_equal(got[starts], x[starts])


def test_wav_randomized_roundtrip_matrix():
    """Seeded randomized matrix (r10, extending VERDICT task 2 beyond
    the five named families): PCM WAV at every depth (8/16/24/32-bit),
    random channel counts and lengths incl. odd data sizes that force
    the RIFF pad byte, plus the G.711 mu-law/A-law compressed paths
    checked against their own codebook round trip.  Fixed seed:
    failures reproduce."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        alaw_encode,
        mulaw_encode,
        parse_wav,
        write_wav,
        write_wav_alaw,
        write_wav_mulaw,
    )

    rng = np.random.RandomState(31)
    for trial in range(24):
        bits = int(rng.choice([8, 16, 24, 32]))
        ch = int(rng.randint(1, 5))
        n = int(rng.randint(1, 700))
        rate = int(rng.choice([8000, 16000, 44100]))
        if bits == 8:
            x = rng.randint(0, 256, (n, ch)).astype(np.uint8)
        elif bits == 16:
            x = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
        elif bits == 24:
            x = rng.randint(-(1 << 23), 1 << 23, (n, ch)).astype(np.int32)
        else:
            x = rng.randint(
                -(1 << 31), (1 << 31) - 1, (n, ch), dtype=np.int64
            ).astype(np.int32)
        blob = write_wav(x, rate, bits=24 if bits == 24 else None)
        r, c, got = parse_wav(blob)
        assert (r, c) == (rate, ch)
        assert np.array_equal(got, x.astype(got.dtype)), (
            f"trial {trial}: bits={bits} ch={ch} n={n}"
        )

    for trial in range(8):
        n = int(rng.randint(1, 500))
        x = rng.randint(-32768, 32768, n).astype(np.int16)
        for enc, writer in (
            (mulaw_encode, write_wav_mulaw),
            (alaw_encode, write_wav_alaw),
        ):
            _r, _c, got = parse_wav(writer(x, 8000))
            # G.711 is lossy: decode must equal decode(encode) of the
            # codebook — i.e. re-encoding the decoded samples is a
            # fixed point of the codec
            again = enc(got[:, 0])
            assert np.array_equal(enc(x), again), f"g711 trial {trial}"


def test_mkv_randomized_roundtrip_matrix():
    """Seeded randomized matrix (r10): Matroska mux/demux across
    random track counts, frame counts/sizes (incl. empty payloads),
    cluster groupings and all four lacing modes — payloads, absolute
    timestamps, keyframe flags and track routing must survive exactly.
    Fixed seed: failures reproduce."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.ebml import (
        MkvTrack,
        parse_mkv,
        write_mkv,
    )

    rng = np.random.RandomState(13)
    for trial in range(20):
        lace = rng.choice([None, "xiph", "fixed", "ebml"])
        ntracks = 1 if lace is not None else int(rng.randint(1, 4))
        tracks = [
            MkvTrack(
                i + 1,
                "video" if i % 2 == 0 else "audio",
                f"V_TEST{i}" if i % 2 == 0 else f"A_TEST{i}",
                width=16,
                height=8,
                sampling_hz=8000.0,
                channels=1,
            )
            for i in range(ntracks)
        ]
        nfr = int(rng.randint(1, 25))
        cluster_every = int(rng.choice([1, 2, 4, 7]))
        frames = []
        if lace is not None:
            # lacing contract: one track, shared ts/keyframe per
            # cluster -> give every frame in a cluster the same ts
            size = int(rng.randint(0, 40))
            for i in range(nfr):
                ts = (i // cluster_every) * 80
                payload = (
                    rng.bytes(size)
                    if lace == "fixed"
                    else rng.bytes(int(rng.randint(0, 300)))
                )
                frames.append((1, ts, True, payload))
        else:
            ts = 0
            for i in range(nfr):
                ts += int(rng.randint(0, 50))
                tno = int(rng.randint(1, ntracks + 1))
                frames.append(
                    (tno, ts, bool(rng.randint(0, 2)),
                     rng.bytes(int(rng.randint(0, 300))))
                )
        blob = write_mkv(
            frames, tracks, cluster_every=cluster_every,
            lace_mode=None if lace is None else str(lace),
        )
        got = parse_mkv(blob)
        assert sorted(got.tracks) == [t.number for t in tracks]
        assert len(got.frames) == nfr, (
            f"trial {trial}: lace={lace} nfr={nfr} "
            f"cluster_every={cluster_every}"
        )
        for (tn, ts, kf, pl), (gtn, gts, gkf, gpl) in zip(
            frames, got.frames
        ):
            assert (tn, ts, kf) == (gtn, gts, gkf), f"trial {trial}"
            assert bytes(pl) == bytes(gpl), f"trial {trial}"


def test_jpeg_fuzz_malformed_streams_fail_loudly():
    """Seeded fuzz over both modes (baseline + progressive, 4:4:4 +
    4:2:0, with restarts): every truncation and byte flip either
    decodes or raises ValueError/NotImplementedError — never an
    IndexError/KeyError/OverflowError/struct.error escape, never a
    hang.  (r10: this hunt fixed six loud-failure gaps — DHT/DQT/DRI/
    SOF segment bounds, DC category range, unknown scan component and
    undefined table ids.)"""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
        write_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blobs = [
        write_jpeg_progressive(px, 70),
        write_jpeg(px, 70, restart_interval=2),
        write_jpeg_progressive(
            px, 70, subsampling="420", restart_interval=3
        ),
        write_jpeg(g, 30),
        write_jpeg_progressive(g, 95),
    ]
    for blob in blobs:
        for cut in range(2, len(blob), 9):
            try:
                parse_jpeg(bytes(blob[:cut]))
            except (ValueError, NotImplementedError):
                pass
        for _ in range(600):
            b = bytearray(blob)
            i = int(rng.integers(2, len(b)))
            b[i] ^= int(rng.integers(1, 256))
            try:
                parse_jpeg(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_all_parsers_fuzz_fail_loudly():
    """Seeded truncation + byte-flip fuzz over EVERY parser of
    untrusted bytes (r10): corrupt payloads raise ValueError or
    NotImplementedError — never IndexError/struct.error/zlib.error
    escapes (the admission funnels gate on ValueError to quarantine
    bad documents instead of failing the Spark task), and never a
    hang (the LZW min-code-size fix: a flipped byte used to allocate
    a 2^231-entry root table)."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions import codecs as C
    from asid_v2_data_pipeline_spark.functions import ebml as E
    from asid_v2_data_pipeline_spark.functions import flac as FL
    from asid_v2_data_pipeline_spark.functions import id3 as I
    from asid_v2_data_pipeline_spark.functions import mp3 as M

    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    g = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 8), dtype=np.uint8)
    x16 = rng.integers(-30000, 30000, (300, 2)).astype(np.int16)
    fr = [{"kbps": 128, "scfsi": 0, "granules": [
        {"block_type": 0, "spectrum": [0] * 576, "big_values": 0,
         "count1": 0, "scalefacs": [0] * 21, "preflag": 0,
         "scalefac_scale": 0, "table_select": [0, 0, 0]}
        for _ in range(2)]} for _ in range(2)]
    cases = [
        (C.write_png(px), C.parse_png),
        (C.write_png(g, interlace=True), C.parse_png),
        (C.write_gif(idx, pal, interlace=True), C.parse_gif),
        (C.write_gif_anim([idx, idx], pal, [5, 5]), C.parse_gif_frames),
        (C.write_bmp(px), C.parse_bmp),
        (C.write_wav(x16, 8000), C.parse_wav),
        (C.write_wav_ima(x16[:, 0], 8000), C.parse_wav),
        (C.write_wav_ms(x16, 8000), C.parse_wav),
        (C.write_aiff(x16, 8000), C.parse_aiff),
        (FL.write_flac(x16, block_size=64), FL.parse_flac),
        (E.write_mkv(
            [(1, 0, True, b"abcdef"), (1, 0, True, b"ghijkl")],
            [E.MkvTrack(1, "video", "V_X", width=4, height=4)],
            lace_mode="xiph", cluster_every=2), E.parse_mkv),
        (I.write_id3({"TIT2": "hello", "TALB": "world"}), I.parse_id3),
        (I.write_id3({"TIT2": "x" * 120}, compress=True), I.parse_id3),
        (M.write_mp3_l3_general(fr), M.parse_mp3_l3),
    ]
    for blob, parse in cases:
        blob = bytearray(blob)
        for cut in range(1, len(blob), max(1, len(blob) // 60)):
            try:
                parse(bytes(blob[:cut]))
            except (ValueError, NotImplementedError):
                pass
        for _ in range(250):
            b = bytearray(blob)
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            try:
                parse(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_jpeg_16bit_quant_tables_decode():
    """r10: DQT precision 1 (16-bit big-endian entries) parses; a
    stream whose 8-bit table is re-emitted as 16-bit entries decodes
    IDENTICALLY (the dequantizer is width-agnostic), and values past
    255 are preserved."""
    import struct as _s

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _ZIGZAG,
        parse_jpeg,
        write_jpeg,
    )

    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    blob = bytearray(write_jpeg(px, quality=40))
    # locate the 8-bit DQT and rewrite it as a pq=1 table
    at = blob.find(b"\xff\xdb")
    assert at >= 0
    seglen = _s.unpack(">H", blob[at + 2 : at + 4])[0]
    assert seglen == 67  # 2 + 1 + 64 (one 8-bit table)
    entries = bytes(blob[at + 5 : at + 5 + 64])
    wide = b"".join(_s.pack(">H", v) for v in entries)
    new_seg = _s.pack(">H", 2 + 1 + 128) + bytes([0x10]) + wide
    blob2 = bytes(blob[:at + 2]) + new_seg + bytes(blob[at + 2 + seglen:])
    np.testing.assert_array_equal(
        parse_jpeg(blob2), parse_jpeg(bytes(blob))
    )
    # malformed precision nibble raises
    bad = bytearray(blob)
    bad[at + 4] = 0x20
    with pytest.raises(ValueError, match="DQT precision"):
        parse_jpeg(bytes(bad))


def test_ms_adpcm_randomized_matrix():
    """r10: MS-ADPCM (WAV format 2) — the other ubiquitous legacy
    4-bit codec.  Seeded random channel counts, block aligns and
    lengths; container decode checked against an INDEPENDENT in-test
    walker over the raw block bytes (field-grouped headers, per-nibble
    channel interleave, the 7 public coefficient pairs and the
    adaptation table), plus the exact-header-samples and fact-crop
    contracts."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _MSA_ADAPT,
        _MSA_COEF1,
        _MSA_COEF2,
        ms_adpcm_encode,
        parse_wav,
        write_wav_ms,
    )

    def model_decode(data, spb, ch, n):
        out = []
        # the writer emits fixed-size blocks: align = payload/nblocks
        nblocks = max(1, (n + spb - 1) // spb)
        ba = len(data) // nblocks
        for b0 in range(0, nblocks * ba, ba):
            blk = data[b0 : b0 + ba]
            preds = list(blk[:ch])
            get = lambda o, c: int.from_bytes(
                blk[o + 2 * c : o + 2 * c + 2], "little", signed=True
            )
            deltas = [get(ch, c) for c in range(ch)]
            s1 = [get(3 * ch, c) for c in range(ch)]
            s2 = [get(5 * ch, c) for c in range(ch)]
            rows = np.zeros((spb, ch), np.int64)
            rows[0], rows[1] = s2, s1
            k = 0
            for byte in blk[7 * ch :]:
                for nib in (byte >> 4, byte & 0x0F):
                    if k >= (spb - 2) * ch:
                        break
                    c = k % ch
                    pred = (
                        s1[c] * _MSA_COEF1[preds[c]]
                        + s2[c] * _MSA_COEF2[preds[c]]
                    ) >> 8
                    s = nib - 16 if nib >= 8 else nib
                    v = max(-32768, min(32767, pred + deltas[c] * s))
                    rows[2 + k // ch, c] = v
                    s2[c], s1[c] = s1[c], v
                    deltas[c] = max(16, (_MSA_ADAPT[nib] * deltas[c]) >> 8)
                    k += 1
            out.append(rows)
        return np.concatenate(out)[:n]

    rng = np.random.RandomState(41)
    for trial in range(16):
        ch = int(rng.choice([1, 2]))
        ba = int(rng.choice([64, 128, 256, 400]))
        n = int(rng.randint(2, 900))
        kind = int(rng.randint(0, 3))
        if kind == 0:
            x = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
        elif kind == 1:
            t = np.arange(n)[:, None] + np.arange(ch)[None, :]
            x = (np.sin(t / 7.0) * 12000).astype(np.int16)
        else:
            x = np.zeros((n, ch), dtype=np.int16)
            x[:: max(1, n // 9)] = -31000
        blob = write_wav_ms(x, 8000, block_align=ba)
        rate, nch, got = parse_wav(blob)
        assert (rate, nch, got.shape) == (8000, ch, (n, ch))
        data, spb = ms_adpcm_encode(x, ba)
        want = model_decode(data, spb, ch, n)
        assert np.array_equal(got.astype(np.int64), want), (
            f"trial {trial}: ch={ch} ba={ba} n={n} kind={kind}"
        )
        # block headers carry the first two samples of each block raw
        starts = np.arange(0, n, spb)
        np.testing.assert_array_equal(got[starts], x[starts])
        # smooth signals track within the adaptive step
        if kind == 1:
            err = np.abs(got.astype(np.int64) - x.astype(np.int64))
            assert err.mean() < 300


def test_ms_adpcm_through_the_audio_funnel(spark):
    """The admission funnel decodes MS-ADPCM WAVs with zero dispatch
    changes (RIFF magic -> parse_wav -> format 2), and corrupt
    predictor indices quarantine."""
    import numpy as np
    import pandas as pd

    from asid_v2_data_pipeline_spark.functions.codecs import write_wav_ms
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_audio_stats_admitting,
    )

    t = np.arange(600)
    x = (np.sin(t / 9.0) * 9000).astype(np.int16)
    blob = write_wav_ms(x, 8000)
    bad = bytearray(blob)
    at = blob.find(b"data") + 8
    bad[at] = 0x09  # predictor index 9 > 6 -> ValueError
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "payload": [blob, bytes(bad)]}
        )
    )
    rows = {
        r["media_id"]: r
        for r in decode_audio_stats_admitting(media, 20000, 256, 8)
        .collect()
    }
    assert rows[1]["error"] is None and rows[1]["n_frames"] == 600
    assert rows[2]["error"] == "ValueError"


def test_wav_float_formats_roundtrip():
    """r10: WAVE_FORMAT_IEEE_FLOAT (3) — float32 and float64 samples
    round trip bit-exactly (lossless container), mono and stereo,
    incl. NaN/inf payload values and odd lengths."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_wav,
        write_wav,
    )

    rng = np.random.RandomState(8)
    for dt in (np.float32, np.float64):
        for ch in (1, 2):
            x = rng.randn(333, ch).astype(dt)
            x[0, 0] = np.inf
            x[1, 0] = np.nan
            r, c, got = parse_wav(write_wav(x, 48000))
            assert (r, c) == (48000, ch)
            assert got.dtype == dt and got.shape == (333, ch)
            np.testing.assert_array_equal(
                np.nan_to_num(got, nan=7.0), np.nan_to_num(x, nan=7.0)
            )


def test_jpeg_four_component_roundtrip():
    """r10: 4-component JPEG (the CMYK container shape, Adobe
    transform-0 semantics — channels stored without color transform).
    Each channel decodes exactly equal to its standalone grayscale
    pipeline, baseline == progressive, and the generalized default
    scan script covers all four components."""
    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg,
        write_jpeg_progressive,
    )

    rng = np.random.RandomState(12)
    px = rng.randint(0, 256, (24, 17, 4)).astype(np.uint8)
    for q in (40, 85):
        base = parse_jpeg(write_jpeg(px, q))
        assert base.shape == (24, 17, 4)
        np.testing.assert_array_equal(
            parse_jpeg(write_jpeg_progressive(px, q)), base
        )
        for c in range(4):
            np.testing.assert_array_equal(
                base[..., c], parse_jpeg(write_jpeg(px[..., c], q))
            )


def test_aiff_roundtrip_and_f80_rates():
    """r10: AIFF (big-endian IFF) round-trips 16-bit mono/stereo PCM
    exactly, including the 80-bit extended-float sampleRate field
    across rates that exercise different exponents; AIFF-C and
    non-16-bit depths are disclosed boundaries."""
    import struct as _s

    import numpy as np
    import pytest as _pt

    from asid_v2_data_pipeline_spark.functions.codecs import (
        _f80_decode,
        _f80_encode,
        parse_aiff,
        write_aiff,
    )

    rng = np.random.default_rng(61)
    for shape in ((200,), (77, 2), (5, 4)):
        pcm = rng.integers(-32768, 32768, shape).astype(np.int16)
        for rate in (1, 8000, 11025, 44100, 48000, 192000):
            r, nch, s = parse_aiff(write_aiff(pcm, rate))
            exp = pcm[:, None] if pcm.ndim == 1 else pcm
            assert r == rate and nch == exp.shape[1]
            assert (s == exp).all()
    for rate in (1, 7, 8000, 44100, 96000, 12345678):
        assert _f80_decode(_f80_encode(rate)) == rate
    blob = bytearray(write_aiff(np.zeros(40, np.int16), 8000))
    blob[8:12] = b"AIFC"
    with _pt.raises(NotImplementedError, match="AIFF-C"):
        parse_aiff(bytes(blob))
    # 8-bit depth disclosed
    good = bytearray(write_aiff(np.zeros(40, np.int16), 8000))
    at = bytes(good).find(b"COMM") + 8 + 6
    good[at : at + 2] = _s.pack(">h", 8)
    with _pt.raises(NotImplementedError):
        parse_aiff(bytes(good))


def test_jpeg_lossless_randomized_matrix():
    """r10: SOF3 lossless — seeded matrix over shapes × all seven
    Annex-H predictors × point transforms × 8/16-bit precision ×
    gray/RGB; the round trip must return (px >> Pt) << Pt exactly
    (bit-exact for Pt=0)."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg_lossless,
    )

    rng = np.random.default_rng(71)
    for trial in range(40):
        h = int(rng.integers(1, 20))
        w = int(rng.integers(1, 20))
        ch = (None, 3)[int(rng.integers(0, 2))]
        shape = (h, w) if ch is None else (h, w, 3)
        prec = (8, 16)[int(rng.integers(0, 2))]
        dt = np.uint8 if prec == 8 else np.uint16
        # mix smooth and noisy content so diff categories vary
        if rng.integers(0, 2):
            px = rng.integers(0, 1 << prec, shape).astype(dt)
        else:
            base = np.add.outer(
                np.arange(h) * 3, np.arange(w)
            ) % (1 << prec)
            px = np.broadcast_to(
                base[..., None] if ch else base, shape
            ).astype(dt)
        pred = int(rng.integers(1, 8))
        pt = int(rng.integers(0, 3))
        got = parse_jpeg(write_jpeg_lossless(px, pred, pt))
        exp = ((px.astype(np.int64) >> pt) << pt).astype(dt)
        assert got.dtype == dt and got.shape == px.shape
        assert (got == exp).all(), f"trial {trial}"


def test_jpeg_lossless_fuzz_fail_loudly():
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.codecs import (
        parse_jpeg,
        write_jpeg_lossless,
    )

    rng = np.random.default_rng(73)
    px = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    blob = write_jpeg_lossless(px, predictor=5, point_transform=1)
    for cut in range(2, len(blob), max(1, len(blob) // 80)):
        try:
            parse_jpeg(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(2, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_jpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass
