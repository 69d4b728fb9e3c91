"""Vorbis I header parsing (identification + comment + setup) and a
deterministic spec-legal header writer — the bounded Vorbis spike
adjudicated in round 11 (VERDICT r10 task 5).

Scope.  Unlike MP3's big-value Huffman tables, Vorbis ships its
codebooks IN-STREAM (the setup header), so nothing here is in the
untranscribable-table class.  This module implements the complete
INTEGER structural half of the codec:

- identification header: version/channels/rate/bitrates/blocksizes;
- comment header: vendor + ``KEY=value`` tags (the curation-relevant
  metadata a crawled ``.ogg`` carries);
- setup header, parsed in full: codebooks (ordered and unordered
  length lists, sparse entries, Huffman Kraft-sum validation, VQ
  lookup types 0/1/2 with ``float32_unpack``/``lookup1_values``
  semantics), time transforms, floor configs (types 0 and 1 with
  the full class/partition/X-list layout), residue configs (types
  0..2 with cascade bitmaps and per-stage books), channel mappings
  (coupling steps, submap wiring) and modes — every index
  cross-validated against the section it points into.

The PACKET decode (floor curve synthesis, residue VQ accumulation,
inverse MDCT, windowing) is adjudicated OUT as a reasoned boundary —
see SCALE.md §Vorbis: it is float-domain signal reconstruction whose
cost (a spec-legal encoder must be built too, since fixtures are
synthesized in-sandbox) is far out of proportion to Vorbis's share of
crawled audio, and it breaks the integer value-hash oracle pattern
every other audio family uses.  Everything a training-data pipeline
extracts from a Vorbis file short of PCM — stream parameters, tags,
codebook/floor/residue topology — is parsed here, for real.

Bit order: Vorbis packs LSB-first within bytes (the opposite of FLAC
and MP3).  Fuzz contract (SCALE.md round 10): malformed input raises
``ValueError`` — never ``IndexError``/``MemoryError`` escapes, never
unbounded allocation (all counts validated against remaining bits
before use).  Reference has no media containers
(``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.
"""

from __future__ import annotations

_VORBIS = b"vorbis"
_SYNC_BCV = 0x564342
_MAX_TAGS = 4096
_MAX_CODEBOOK_ENTRIES = 1 << 24


class _BitReader:
    """LSB-first bit reader over a packet."""

    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n < 0 or self.pos + n > 8 * len(self.data):
            raise ValueError("vorbis: bitstream truncated")
        out = 0
        for i in range(n):
            p = self.pos + i
            out |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        self.pos += n
        return out

    def flag(self) -> bool:
        return bool(self.read(1))


class _BitWriter:
    """LSB-first bit writer (fixture synthesis)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        if v < 0 or n < 0 or (n < 64 and v >> n):
            raise ValueError(f"vorbis: {v} does not fit {n} bits")
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def flag(self, b: bool) -> None:
        self.write(1 if b else 0, 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def ilog(x: int) -> int:
    """Vorbis ilog: position of the highest set bit (ilog(0)=0)."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def float32_unpack(x: int) -> float:
    """Vorbis packed float: 21-bit mantissa, 10-bit excess-788
    exponent, sign bit."""
    mant = x & 0x1FFFFF
    exp = (x >> 21) & 0x3FF
    sign = -1.0 if x & 0x80000000 else 1.0
    return sign * mant * 2.0 ** (exp - 788)


def float32_pack(mant: int, exp: int, neg: bool = False) -> int:
    if not 0 <= mant < 1 << 21 or not 0 <= exp < 1 << 10:
        raise ValueError("vorbis: float pack out of range")
    return (0x80000000 if neg else 0) | (exp << 21) | mant


def lookup1_values(entries: int, dim: int) -> int:
    """Largest v with v**dim <= entries (spec §3.2.1 VQ lattice)."""
    v = 0
    while (v + 1) ** dim <= entries:
        v += 1
    return v


# --- header framing -----------------------------------------------------------


def _check_header(packet: bytes, ptype: int) -> _BitReader:
    if len(packet) < 7 or packet[0] != ptype or packet[1:7] != _VORBIS:
        raise ValueError(
            f"vorbis: bad header packet (want type {ptype})"
        )
    br = _BitReader(packet)
    br.pos = 7 * 8
    return br


def parse_identification(packet: bytes) -> dict:
    br = _check_header(packet, 1)
    version = br.read(32)
    if version != 0:
        raise ValueError(f"vorbis: unsupported version {version}")
    channels = br.read(8)
    rate = br.read(32)
    if channels == 0 or rate == 0:
        raise ValueError("vorbis: zero channels or rate")
    bitrate_max = br.read(32)
    bitrate_nominal = br.read(32)
    bitrate_min = br.read(32)
    bs0 = 1 << br.read(4)
    bs1 = 1 << br.read(4)
    if not (64 <= bs0 <= 8192 and 64 <= bs1 <= 8192 and bs0 <= bs1):
        raise ValueError("vorbis: illegal blocksizes")
    if not br.flag():
        raise ValueError("vorbis: identification framing bit unset")
    return {
        "version": version,
        "channels": channels,
        "sample_rate": rate,
        "bitrate_max": bitrate_max,
        "bitrate_nominal": bitrate_nominal,
        "bitrate_min": bitrate_min,
        "blocksize_0": bs0,
        "blocksize_1": bs1,
    }


def parse_comments(packet: bytes) -> dict:
    br = _check_header(packet, 3)
    vlen = br.read(32)
    if vlen > len(packet):
        raise ValueError("vorbis: vendor length exceeds packet")
    vendor = bytes(br.read(8) for _ in range(vlen)).decode(
        "utf-8", errors="strict"
    )
    n = br.read(32)
    if n > _MAX_TAGS:
        raise ValueError("vorbis: implausible tag count")
    tags: dict[str, str] = {}
    for _ in range(n):
        ln = br.read(32)
        if ln > len(packet):
            raise ValueError("vorbis: tag length exceeds packet")
        s = bytes(br.read(8) for _ in range(ln)).decode(
            "utf-8", errors="strict"
        )
        if "=" not in s:
            raise ValueError("vorbis: tag without '='")
        k, v = s.split("=", 1)
        tags[k.upper()] = v
    if not br.flag():
        raise ValueError("vorbis: comment framing bit unset")
    return {"vendor": vendor, "tags": tags}


# --- setup: codebooks ---------------------------------------------------------


def _parse_codebook(br: _BitReader) -> dict:
    if br.read(24) != _SYNC_BCV:
        raise ValueError("vorbis: codebook sync lost")
    dims = br.read(16)
    entries = br.read(24)
    if dims == 0 or entries == 0 or entries > _MAX_CODEBOOK_ENTRIES:
        raise ValueError("vorbis: empty or implausible codebook")
    lengths: list[int] = [0] * entries  # 0 = unused
    if br.flag():  # ordered
        cur_len = br.read(5) + 1
        i = 0
        while i < entries:
            num = br.read(ilog(entries - i))
            if i + num > entries:
                raise ValueError("vorbis: ordered lengths overrun")
            for k in range(num):
                lengths[i + k] = cur_len
            i += num
            cur_len += 1
            if cur_len > 32:
                raise ValueError("vorbis: codeword length > 32")
    else:
        sparse = br.flag()
        for i in range(entries):
            if sparse and not br.flag():
                continue
            lengths[i] = br.read(5) + 1
    used = [ln for ln in lengths if ln]
    if not used:
        raise ValueError("vorbis: codebook with no used entries")
    # Kraft check: a decodable Huffman tree must not be
    # over-subscribed; single-entry books are the spec's special case
    kraft = sum(1 << (32 - ln) for ln in used)
    if len(used) > 1 and kraft > 1 << 32:
        raise ValueError("vorbis: over-subscribed codebook")
    lookup = br.read(4)
    out = {
        "dims": dims,
        "entries": entries,
        "lengths": lengths,
        "lookup_type": lookup,
        "underspecified": len(used) > 1 and kraft < 1 << 32,
    }
    if lookup == 0:
        return out
    if lookup not in (1, 2):
        raise ValueError(f"vorbis: reserved lookup type {lookup}")
    minimum = float32_unpack(br.read(32))
    delta = float32_unpack(br.read(32))
    value_bits = br.read(4) + 1
    sequence_p = br.flag()
    if lookup == 1:
        quantvals = lookup1_values(entries, dims)
    else:
        quantvals = entries * dims
    if quantvals * value_bits > 8 * len(br.data):
        raise ValueError("vorbis: VQ table exceeds packet")
    mults = [br.read(value_bits) for _ in range(quantvals)]
    out.update(
        minimum=minimum,
        delta=delta,
        value_bits=value_bits,
        sequence_p=sequence_p,
        quantvals=quantvals,
        multiplicands=mults,
    )
    return out


# --- setup: floors / residues / mappings / modes ------------------------------


def _parse_floor(br: _BitReader, n_books: int) -> dict:
    ftype = br.read(16)
    if ftype == 0:
        order = br.read(8)
        rate = br.read(16)
        bark_map_size = br.read(16)
        amplitude_bits = br.read(6)
        amplitude_offset = br.read(8)
        nb = br.read(4) + 1
        books = [br.read(8) for _ in range(nb)]
        if any(b >= n_books for b in books):
            raise ValueError("vorbis: floor0 book out of range")
        if order == 0:
            raise ValueError("vorbis: floor0 zero order")
        return {
            "type": 0,
            "order": order,
            "rate": rate,
            "bark_map_size": bark_map_size,
            "amplitude_bits": amplitude_bits,
            "amplitude_offset": amplitude_offset,
            "books": books,
        }
    if ftype != 1:
        raise ValueError(f"vorbis: reserved floor type {ftype}")
    partitions = br.read(5)
    part_classes = [br.read(4) for _ in range(partitions)]
    max_class = max(part_classes, default=-1)
    classes = []
    for _ in range(max_class + 1):
        dim = br.read(3) + 1
        subbits = br.read(2)
        master = br.read(8) if subbits else None
        if master is not None and master >= n_books:
            raise ValueError("vorbis: floor1 masterbook out of range")
        subs = []
        for _ in range(1 << subbits):
            b = br.read(8) - 1  # -1 = unused
            if b >= n_books:
                raise ValueError("vorbis: floor1 subbook out of range")
            subs.append(b)
        classes.append(
            {"dim": dim, "subclass_bits": subbits,
             "masterbook": master, "subclass_books": subs}
        )
    multiplier = br.read(2) + 1
    rangebits = br.read(4)
    xs = [0, 1 << rangebits]
    for pc in part_classes:
        for _ in range(classes[pc]["dim"]):
            xs.append(br.read(rangebits))
    if len(xs) > 65:
        raise ValueError("vorbis: floor1 X list too long")
    if len(set(xs)) != len(xs):
        raise ValueError("vorbis: floor1 duplicate X values")
    return {
        "type": 1,
        "partition_classes": part_classes,
        "classes": classes,
        "multiplier": multiplier,
        "rangebits": rangebits,
        "x_list": xs,
    }


def _parse_residue(br: _BitReader, n_books: int) -> dict:
    rtype = br.read(16)
    if rtype > 2:
        raise ValueError(f"vorbis: reserved residue type {rtype}")
    begin = br.read(24)
    end = br.read(24)
    part_size = br.read(24) + 1
    classifications = br.read(6) + 1
    classbook = br.read(8)
    if classbook >= n_books:
        raise ValueError("vorbis: residue classbook out of range")
    cascades = []
    for _ in range(classifications):
        low = br.read(3)
        high = br.read(5) if br.flag() else 0
        cascades.append((high << 3) | low)
    books: list[list[int | None]] = []
    for c in cascades:
        row: list[int | None] = []
        for stage in range(8):
            if c & (1 << stage):
                b = br.read(8)
                if b >= n_books:
                    raise ValueError(
                        "vorbis: residue book out of range"
                    )
                row.append(b)
            else:
                row.append(None)
        books.append(row)
    return {
        "type": rtype,
        "begin": begin,
        "end": end,
        "partition_size": part_size,
        "classifications": classifications,
        "classbook": classbook,
        "cascades": cascades,
        "books": books,
    }


def _parse_mapping(br: _BitReader, channels: int,
                   n_floors: int, n_residues: int) -> dict:
    mtype = br.read(16)
    if mtype != 0:
        raise ValueError(f"vorbis: reserved mapping type {mtype}")
    submaps = br.read(4) + 1 if br.flag() else 1
    steps = []
    if br.flag():
        n_steps = br.read(8) + 1
        bits = ilog(channels - 1)
        for _ in range(n_steps):
            mag = br.read(bits)
            ang = br.read(bits)
            if mag == ang or mag >= channels or ang >= channels:
                raise ValueError("vorbis: bad coupling step")
            steps.append((mag, ang))
    if br.read(2) != 0:
        raise ValueError("vorbis: mapping reserved bits set")
    if submaps > 1:
        mux = [br.read(4) for _ in range(channels)]
        if any(m >= submaps for m in mux):
            raise ValueError("vorbis: mux exceeds submap count")
    else:
        mux = [0] * channels
    wiring = []
    for _ in range(submaps):
        br.read(8)  # unused time config
        fl = br.read(8)
        rs = br.read(8)
        if fl >= n_floors or rs >= n_residues:
            raise ValueError("vorbis: submap floor/residue out of range")
        wiring.append((fl, rs))
    return {
        "submaps": submaps,
        "coupling_steps": steps,
        "mux": mux,
        "submap_floor_residue": wiring,
    }


def parse_setup(packet: bytes, channels: int) -> dict:
    br = _check_header(packet, 5)
    n_books = br.read(8) + 1
    codebooks = [_parse_codebook(br) for _ in range(n_books)]
    # time transforms: placeholders, must be zero
    for _ in range(br.read(6) + 1):
        if br.read(16) != 0:
            raise ValueError("vorbis: nonzero time transform")
    floors = [
        _parse_floor(br, n_books) for _ in range(br.read(6) + 1)
    ]
    residues = [
        _parse_residue(br, n_books) for _ in range(br.read(6) + 1)
    ]
    mappings = [
        _parse_mapping(br, channels, len(floors), len(residues))
        for _ in range(br.read(6) + 1)
    ]
    modes = []
    for _ in range(br.read(6) + 1):
        blockflag = br.flag()
        if br.read(16) != 0 or br.read(16) != 0:
            raise ValueError("vorbis: nonzero window/transform type")
        mapping = br.read(8)
        if mapping >= len(mappings):
            raise ValueError("vorbis: mode mapping out of range")
        modes.append({"blockflag": blockflag, "mapping": mapping})
    if not br.flag():
        raise ValueError("vorbis: setup framing bit unset")
    return {
        "codebooks": codebooks,
        "floors": floors,
        "residues": residues,
        "mappings": mappings,
        "modes": modes,
    }


def parse_vorbis_headers(packets: list[bytes]) -> dict:
    """Parse the three Vorbis header packets (identification, comment,
    setup) into one info dict — everything a curation pipeline
    extracts from a Vorbis stream short of PCM."""
    if len(packets) < 3:
        raise ValueError("vorbis: need three header packets")
    info = parse_identification(packets[0])
    info.update(parse_comments(packets[1]))
    info["setup"] = parse_setup(packets[2], info["channels"])
    return info


# --- writer (fixture synthesis) -----------------------------------------------


def write_identification(
    channels: int,
    rate: int,
    bitrate_nominal: int = 0,
    blocksize_0: int = 256,
    blocksize_1: int = 2048,
) -> bytes:
    w = _BitWriter()
    w.write(0, 32)
    w.write(channels, 8)
    w.write(rate, 32)
    w.write(0, 32)
    w.write(bitrate_nominal, 32)
    w.write(0, 32)
    w.write(blocksize_0.bit_length() - 1, 4)
    w.write(blocksize_1.bit_length() - 1, 4)
    w.flag(True)
    return b"\x01" + _VORBIS + w.bytes()


def write_comments(
    tags: dict[str, str], vendor: str = "asid-v2-spark fixture"
) -> bytes:
    w = _BitWriter()
    vb = vendor.encode("utf-8")
    w.write(len(vb), 32)
    for b in vb:
        w.write(b, 8)
    w.write(len(tags), 32)
    for k in sorted(tags):
        s = f"{k}={tags[k]}".encode("utf-8")
        w.write(len(s), 32)
        for b in s:
            w.write(b, 8)
    w.flag(True)
    return b"\x03" + _VORBIS + w.bytes()


def _write_codebook(
    w: _BitWriter,
    dims: int,
    lengths: list[int],
    lookup: int = 0,
    ordered: bool = False,
    sparse: bool = False,
    value_bits: int = 4,
) -> None:
    w.write(_SYNC_BCV, 24)
    w.write(dims, 16)
    w.write(len(lengths), 24)
    w.flag(ordered)
    if ordered:
        cur = lengths[0]
        w.write(cur - 1, 5)
        i = 0
        while i < len(lengths):
            j = i
            while j < len(lengths) and lengths[j] == cur:
                j += 1
            w.write(j - i, ilog(len(lengths) - i))
            i = j
            cur += 1
    else:
        w.flag(sparse)
        for ln in lengths:
            if sparse:
                w.flag(ln > 0)
                if ln > 0:
                    w.write(ln - 1, 5)
            else:
                w.write(ln - 1, 5)
    w.write(lookup, 4)
    if lookup:
        w.write(float32_pack(1, 788), 32)  # minimum = 1.0
        w.write(float32_pack(1, 788), 32)  # delta = 1.0
        w.write(value_bits - 1, 4)
        w.flag(False)
        if lookup == 1:
            quantvals = lookup1_values(len(lengths), dims)
        else:
            quantvals = len(lengths) * dims
        for i in range(quantvals):
            w.write(i % (1 << value_bits), value_bits)


def write_setup(channels: int = 1) -> bytes:
    """A complete spec-legal setup header: three codebooks (unordered
    dense with a VQ type-1 lattice, ordered, sparse), one floor1, one
    residue2, one mapping, two modes."""
    w = _BitWriter()
    w.write(3 - 1, 8)
    _write_codebook(w, 2, [1, 3, 3, 3, 4, 4], lookup=1)
    _write_codebook(w, 1, [2, 2, 3, 4, 4, 3], ordered=False)
    _write_codebook(w, 1, [1, 0, 2, 0, 2], sparse=True)
    # time transforms
    w.write(0, 6)
    w.write(0, 16)
    # one floor, type 1, minimal but legal
    w.write(0, 6)
    w.write(1, 16)
    w.write(1, 5)  # partitions = 1
    w.write(0, 4)  # class of partition 0
    w.write(1 - 1, 3)  # class dim 1
    w.write(0, 2)  # no subclasses
    w.write(0 + 1, 8)  # subclass book 0 (stored +1)
    w.write(2 - 1, 2)  # multiplier
    w.write(4, 4)  # rangebits
    w.write(7, 4)  # one X value (rangebits wide)
    # one residue, type 2
    w.write(0, 6)
    w.write(2, 16)
    w.write(0, 24)  # begin
    w.write(4, 24)  # end
    w.write(2 - 1, 24)  # partition size
    w.write(1 - 1, 6)  # classifications
    w.write(1, 8)  # classbook
    w.write(1, 3)  # cascade low bits: stage 0
    w.flag(False)
    w.write(2, 8)  # stage-0 book
    # one mapping, type 0
    w.write(0, 6)
    w.write(0, 16)
    w.flag(False)  # one submap
    if channels > 1:
        w.flag(True)
        w.write(0, 8)  # one coupling step
        bits = ilog(channels - 1)
        w.write(0, bits)
        w.write(1, bits)
    else:
        w.flag(False)
    w.write(0, 2)
    w.write(0, 8)  # time config
    w.write(0, 8)  # floor 0
    w.write(0, 8)  # residue 0
    # two modes (short and long block)
    w.write(1, 6)
    w.flag(False)
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)
    w.flag(True)
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)
    w.flag(True)  # framing
    return b"\x05" + _VORBIS + w.bytes()


def write_vorbis_headers(
    channels: int,
    rate: int,
    tags: dict[str, str],
    bitrate_nominal: int = 0,
    vendor: str = "asid-v2-spark fixture",
) -> list[bytes]:
    return [
        write_identification(channels, rate, bitrate_nominal),
        write_comments(tags, vendor),
        write_setup(channels),
    ]


# --- Ogg mapping --------------------------------------------------------------


def write_ogg_vorbis(
    channels: int,
    rate: int,
    tags: dict[str, str],
    n_audio_packets: int = 0,
    bitrate_nominal: int = 0,
    serial: int = 1,
) -> bytes:
    """Mux the Vorbis header triple (plus optional placeholder audio
    packets, undecodable by design — see the module docstring) into
    an Ogg stream per the Vorbis-in-Ogg mapping (ident alone on the
    BOS page; granule = PCM sample position)."""
    from .ogg import write_ogg

    hdrs = write_vorbis_headers(
        channels, rate, tags, bitrate_nominal
    )
    packets = [(hdrs[0], 0), (hdrs[1], 0), (hdrs[2], 0)]
    for i in range(n_audio_packets):
        packets.append((bytes([i & 0x7E]), (i + 1) * 128))
    return write_ogg(packets, serial=serial)


def parse_ogg_vorbis(data: bytes) -> dict:
    """Extract Vorbis stream info from an Ogg container: the first
    logical stream whose BOS packet is a Vorbis identification
    header.  Returns the ``parse_vorbis_headers`` dict plus
    ``n_audio_packets`` and ``last_granule``."""
    from .ogg import parse_ogg

    streams = parse_ogg(data)
    for serial in sorted(streams):
        packets = streams[serial]
        if packets and packets[0][1][:7] == b"\x01" + _VORBIS:
            info = parse_vorbis_headers([p for _, p in packets[:3]])
            info["n_audio_packets"] = max(0, len(packets) - 3)
            info["last_granule"] = max(
                (g for g, _ in packets), default=0
            )
            return info
    raise ValueError("ogg-vorbis: no Vorbis logical stream")
