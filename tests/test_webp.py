"""WebP lossless (VP8L): seeded randomized round-trip matrices across
every stream feature (simple + normal prefix codes, color cache,
LZ77, meta-Huffman groups, SUBTRACT_GREEN / PREDICTOR / COLOR /
COLOR_INDEXING transforms incl. pixel bundling), container framing,
disclosed boundaries, strictness, and the r10 fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.webp import (
    _BitReader,
    _BitWriter,
    _prefix_decode_value,
    _prefix_encode_value,
    parse_vp8l,
    parse_webp,
    write_vp8l,
    write_webp,
)

_COMBOS = [
    {},
    {"use_lz77": False},
    {"cache_bits": 1},
    {"cache_bits": 8},
    {"subtract_green": True},
    {"predictor_bits": 2},
    {"predictor_bits": 4},
    {"color_bits": 2},
    {"palette": True},
    {"palette": True, "cache_bits": 2},
    {"meta_bits": 2},
    {"meta_bits": 2, "cache_bits": 5},
    {"subtract_green": True, "predictor_bits": 2, "cache_bits": 4,
     "meta_bits": 2},
    {"color_bits": 3, "predictor_bits": 2, "cache_bits": 3},
]


def _pixels(rng, shape, kind, palette):
    if palette:
        pal = rng.integers(0, 256, (int(rng.integers(2, 17)), 4)).astype(np.uint8)
        return pal[rng.integers(0, len(pal), shape)]
    if kind == 0:
        return rng.integers(0, 256, (*shape, 4)).astype(np.uint8)
    if kind == 1:
        return np.full((*shape, 4), int(rng.integers(0, 256)), np.uint8)
    if kind == 2:  # small deltas: predictor/diff friendly
        return (rng.integers(0, 3, (*shape, 4)).cumsum(axis=1) % 256).astype(np.uint8)
    # few colors: cache/LZ77 heavy
    pal = rng.integers(0, 256, (3, 4)).astype(np.uint8)
    return pal[rng.integers(0, 3, shape)]


def test_roundtrip_matrix():
    rng = np.random.default_rng(73)
    for kw in _COMBOS:
        for shape in ((1, 1), (8, 8), (13, 7), (5, 32)):
            for kind in range(4):
                px = _pixels(rng, shape, kind, kw.get("palette"))
                got = parse_webp(write_webp(px, **kw))
                assert got.shape == px.shape and (got == px).all(), (
                    kw, shape, kind,
                )


def test_prefix_value_coding():
    for v in list(range(1, 70)) + [127, 128, 500, 4096]:
        code, extra, ebits = _prefix_encode_value(v)
        assert 0 <= code < 40
        bw = _BitWriter()
        bw.write(extra, ebits)
        br = _BitReader(bw.bytes() + b"\x00" * 4)
        assert _prefix_decode_value(code, br) == v


def test_container_framing():
    px = np.arange(16, dtype=np.uint8).reshape(2, 2, 4)
    b = write_webp(px)
    assert b[:4] == b"RIFF" and b[8:12] == b"WEBP" and b[12:16] == b"VP8L"
    assert (parse_vp8l(b[20 : 20 + struct.unpack('<I', b[16:20])[0]]) ==
            parse_webp(b)).all()


def test_alpha_hint_and_dims():
    px = np.zeros((3, 300, 4), np.uint8)
    px[..., 3] = 255
    got = parse_webp(write_webp(px))
    assert got.shape == (3, 300, 4)


def test_disclosed_boundaries():
    with pytest.raises(ValueError):
        parse_webp(b"RIFF\x04\x00\x00\x00WAVE")
    # lossy VP8 chunk -> disclosed boundary, loud
    body = b"VP8 " + struct.pack("<I", 2) + b"\x00\x00"
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    with pytest.raises(NotImplementedError, match="lossy"):
        parse_webp(data)


def test_strictness():
    good = write_vp8l(np.arange(64, dtype=np.uint8).reshape(2, 8, 4))
    with pytest.raises(ValueError):
        parse_vp8l(b"\x2e" + good[1:])  # bad signature
    bad_ver = bytearray(good)
    bad_ver[4] ^= 0x80  # version bits live at bit 37..39
    try:
        parse_vp8l(bytes(bad_ver))
    except (ValueError, NotImplementedError):
        pass
    for cut in range(1, len(good)):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_vp8l(good[:cut])
    with pytest.raises(ValueError):
        write_vp8l(np.zeros((2, 2, 3), np.uint8))  # not RGBA


def test_fuzz_never_hangs():
    rng = np.random.default_rng(79)
    base = write_vp8l(
        rng.integers(0, 256, (8, 8, 4)).astype(np.uint8), cache_bits=4
    )
    for _ in range(800):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = parse_vp8l(bytes(mutated))
            assert out.ndim == 3 and out.shape[2] == 4
        except (ValueError, NotImplementedError):
            pass


def test_dimension_allocation_guard():
    """r11 ADVICE: a ~10-byte stream claiming 16384x16384 must raise
    before allocating ~2 GB (same 64M-pixel cap as qoi/tga/pnm)."""
    with pytest.raises(ValueError, match="64M"):
        parse_vp8l(b"\x2f" + b"\xff" * 9)


# --- VP8 lossy / VP8X metadata layer (r13) -------------------------------------


def test_vp8_frame_header_roundtrip_matrix():
    from asid_v2_data_pipeline_spark.functions.webp import (
        parse_vp8_frame_header,
        write_vp8_frame_stub,
    )

    rng = np.random.default_rng(131)
    for trial in range(60):
        w = int(rng.integers(1, 0x4000))
        h = int(rng.integers(1, 0x4000))
        v = int(rng.integers(0, 4))
        show = bool(rng.integers(0, 2))
        xs, ys = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        part0 = bytes(rng.integers(0, 256, int(rng.integers(0, 200))).astype(np.uint8))
        blob = write_vp8_frame_stub(
            w, h, part0, version=v, show_frame=show, xscale=xs, yscale=ys
        )
        got = parse_vp8_frame_header(blob)
        assert got == {
            "key_frame": True,
            "version": v,
            "show_frame": show,
            "part0_size": len(part0),
            "width": w,
            "height": h,
            "xscale": xs,
            "yscale": ys,
        }, trial


def test_webp_meta_container_forms():
    from asid_v2_data_pipeline_spark.functions.webp import (
        parse_webp_meta,
        write_vp8_frame_stub,
        write_webp,
        write_webp_extended,
        write_webp_lossy,
    )

    m = parse_webp_meta(write_webp_lossy(320, 240, b"p" * 11, version=3))
    assert (m["fmt"], m["width"], m["height"], m["version"]) == (
        "lossy", 320, 240, 3,
    )
    px = np.arange(8 * 8 * 4, dtype=np.uint8).reshape(8, 8, 4)
    ml = parse_webp_meta(write_webp(px))
    assert (ml["fmt"], ml["width"], ml["height"]) == ("lossless", 8, 8)
    x = write_webp_extended(
        640, 480,
        (b"VP8 ", write_vp8_frame_stub(320, 240, b"q" * 5)),
        ((b"ICCP", b"icc"), (b"EXIF", b"ex"), (b"XMP ", b"xm")),
    )
    mx = parse_webp_meta(x)
    assert mx["fmt"] == "extended" and (mx["width"], mx["height"]) == (640, 480)
    assert mx["has_icc"] and mx["has_exif"] and mx["has_xmp"]
    assert not mx["has_alpha"] and not mx["has_anim"]
    assert mx["n_chunks"] == 5 and mx["image"]["width"] == 320


def test_webp_meta_strictness():
    from asid_v2_data_pipeline_spark.functions.webp import (
        parse_vp8_frame_header,
        parse_webp_meta,
        write_vp8_frame_stub,
        write_webp_extended,
        write_webp_lossy,
    )

    good = write_webp_lossy(64, 32, b"r" * 9)
    # every truncation raises (loud-failure fuzz contract)
    for cut in range(len(good)):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_webp_meta(good[:cut])
    # bad start code
    b = bytearray(write_vp8_frame_stub(64, 32, b""))
    b[3] ^= 0xFF
    with pytest.raises(ValueError, match="start code"):
        parse_vp8_frame_header(bytes(b))
    # reserved version
    b = bytearray(write_vp8_frame_stub(64, 32, b""))
    b[0] |= 0x0E  # version bits -> 7
    with pytest.raises(ValueError, match="version"):
        parse_vp8_frame_header(bytes(b))
    # first partition overruns
    b = bytearray(write_vp8_frame_stub(64, 32, b"s" * 4))
    b[2] = 0xFF  # inflate part0_size
    with pytest.raises(ValueError, match="partition"):
        parse_vp8_frame_header(bytes(b))
    # interframe leading chunk rejected in a WebP container
    inter = bytearray(write_vp8_frame_stub(64, 32, b""))
    inter[0] |= 1  # frame_type = inter
    blob = b"RIFF" + struct.pack("<I", 4 + 8 + len(inter)) + b"WEBP" + (
        b"VP8 " + struct.pack("<I", len(inter)) + bytes(inter)
    )
    with pytest.raises(ValueError, match="keyframe"):
        parse_webp_meta(blob)
    # VP8X flag/chunk cross-check both ways
    x = bytearray(
        write_webp_extended(
            64, 32,
            (b"VP8 ", write_vp8_frame_stub(64, 32, b"")),
            ((b"EXIF", b"ee"),),
        )
    )
    at = bytes(x).find(b"VP8X") + 8
    x[at] &= ~0x08 & 0xFF  # clear EXIF flag, chunk still present
    with pytest.raises(ValueError, match="mismatch"):
        parse_webp_meta(bytes(x))
    x[at] |= 0x08 | 0x04  # EXIF back + phantom XMP flag
    with pytest.raises(ValueError, match="mismatch"):
        parse_webp_meta(bytes(x))
    # VP8X reserved bits must be zero
    x[at] = 0x08 | 0x01
    with pytest.raises(ValueError, match="reserved"):
        parse_webp_meta(bytes(x))


def test_webp_meta_fuzz_never_hangs():
    from asid_v2_data_pipeline_spark.functions.webp import (
        parse_webp_meta,
        write_vp8_frame_stub,
        write_webp_extended,
    )

    rng = np.random.default_rng(137)
    base = write_webp_extended(
        99, 77,
        (b"VP8 ", write_vp8_frame_stub(64, 32, b"t" * 13)),
        ((b"EXIF", b"exif"), (b"XMP ", b"xmp!")),
    )
    for _ in range(800):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = parse_webp_meta(bytes(mutated))
            assert out["fmt"] in ("lossy", "lossless", "extended")
        except (ValueError, NotImplementedError):
            pass


def test_webp_anim_roundtrip_matrix():
    from asid_v2_data_pipeline_spark.functions.webp import (
        parse_webp_anim,
        write_vp8_frame_stub,
        write_webp_animated,
    )

    rng = np.random.default_rng(139)
    for trial in range(40):
        cw, chh = int(rng.integers(64, 256)), int(rng.integers(64, 256))
        frames = []
        for i in range(int(rng.integers(1, 6))):
            w, h = int(rng.integers(1, 33)), int(rng.integers(1, 33))
            frames.append(
                {
                    "x": 2 * int(rng.integers(0, (cw - w) // 2 + 1)),
                    "y": 2 * int(rng.integers(0, (chh - h) // 2 + 1)),
                    "image": (
                        b"VP8 ",
                        write_vp8_frame_stub(w, h, b"f" * int(rng.integers(0, 20))),
                    ),
                    "duration": int(rng.integers(0, 1 << 24)),
                    "blend": bool(rng.integers(0, 2)),
                    "dispose": bool(rng.integers(0, 2)),
                }
            )
        loop = int(rng.integers(0, 1 << 16))
        m = parse_webp_anim(
            write_webp_animated(cw, chh, frames, loop_count=loop)
        )
        assert m["n_frames"] == len(frames) and m["loop_count"] == loop
        assert m["total_duration"] == sum(f["duration"] for f in frames)
        for got, want in zip(m["frames"], frames):
            assert (got["x"], got["y"]) == (want["x"], want["y"]), trial
            assert (got["duration"], got["blend"], got["dispose"]) == (
                want["duration"], want["blend"], want["dispose"],
            )


def test_webp_anim_strictness():
    from asid_v2_data_pipeline_spark.functions.webp import (
        parse_webp_anim,
        write_vp8_frame_stub,
        write_webp_animated,
    )

    f = {"x": 0, "y": 0, "image": (b"VP8 ", write_vp8_frame_stub(16, 8, b"x")),
         "duration": 50}
    good = write_webp_animated(64, 32, [f], loop_count=2)
    for cut in range(len(good)):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_webp_anim(good[:cut])
    # ANMF dims disagreeing with the embedded frame header
    b = bytearray(good)
    at = bytes(b).find(b"ANMF") + 8
    b[at + 6] ^= 0x01  # frame width minus one
    with pytest.raises(ValueError, match="disagree"):
        parse_webp_anim(bytes(b))
    # frame rect pushed outside the canvas
    b = bytearray(good)
    b[at] = 200  # x -> 400 > canvas 64
    with pytest.raises(ValueError, match="canvas"):
        parse_webp_anim(bytes(b))
    # reserved ANMF flag bits
    b = bytearray(good)
    b[at + 15] |= 0x80
    with pytest.raises(ValueError, match="reserved"):
        parse_webp_anim(bytes(b))
    # a non-animated file is rejected up front
    from asid_v2_data_pipeline_spark.functions.webp import write_webp_lossy

    with pytest.raises(ValueError, match="ANIM"):
        parse_webp_anim(write_webp_lossy(8, 8, b""))
    # writer guards
    with pytest.raises(ValueError, match="even"):
        write_webp_animated(64, 32, [dict(f, x=3)])
    with pytest.raises(ValueError, match="canvas"):
        write_webp_animated(8, 8, [f])
    with pytest.raises(ValueError, match="loop"):
        write_webp_animated(64, 32, [f], loop_count=1 << 16)
    with pytest.raises(ValueError, match="frame"):
        write_webp_animated(64, 32, [])


def test_webp_anim_fuzz_never_hangs():
    from asid_v2_data_pipeline_spark.functions.webp import (
        parse_webp_anim,
        write_vp8_frame_stub,
        write_webp_animated,
    )

    rng = np.random.default_rng(149)
    base = write_webp_animated(
        96, 48,
        [
            {"x": 0, "y": 0, "duration": 30,
             "image": (b"VP8 ", write_vp8_frame_stub(32, 16, b"a" * 5))},
            {"x": 16, "y": 8, "duration": 40, "blend": True,
             "image": (b"VP8 ", write_vp8_frame_stub(24, 12, b"b" * 3))},
        ],
        loop_count=1,
    )
    for _ in range(800):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = parse_webp_anim(bytes(mutated))
            assert out["n_frames"] >= 1
        except (ValueError, NotImplementedError):
            pass
