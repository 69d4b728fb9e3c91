"""Pure-Python minimal HDF5 reader + writer for netCDF-4 containers.

The reference ingests scenes with ``netCDF4.Dataset(path)``
(/root/reference/asip_v2/build_dataset.py:28), which reads *either*
container generation — classic CDF-1/2 or the netCDF-4/HDF5 format.
``netcdf_classic.py`` covers the former; this module covers the HDF5
side so ``decode_netcdf_scene`` / ``format("netcdf")`` accept real
netCDF-4 scene files too, with no third-party dependency.  Everything
here derives from the public HDF5 File Format Specification (v3) and
the public netCDF-4 dataset conventions (_FillValue attribute,
DIMENSION_SCALE/NAME dimension markers).

Read scope (asserted, raises clearly outside it):

- superblock versions 0/1 (HDF5 1.8 "earliest", what the netCDF4
  library writes by default) and 2/3 (1.10+ "latest");
- object headers v1 and v2 (``OHDR``), with continuation blocks;
- old-style groups (symbol-table message -> B-tree v1 -> SNOD -> local
  heap), new-style compact groups (Link messages), AND (round 6) dense
  groups and dense attributes: fractal heaps (root direct block, or a
  root indirect block of direct children) with v2-B-tree name indexes
  (root-leaf trees) — the storage real 1.8+ writers switch to above
  the max-compact thresholds; round 7 completes the family: filtered
  heaps, nested indirect blocks, huge (incl. filtered, via type-2
  B-tree records) and tiny heap objects, multi-level v2 B-trees;
- datatypes: fixed-point, IEEE float, fixed-length strings (either
  endianness); object-reference attributes resolve to the referenced
  object's PATH and vlen-sequence attributes decode through the global
  heap (r8 — ``DIMENSION_LIST``, netCDF-4's dimension mapping, now
  reads as dimension names); region-reference / compound values parse
  as ``None``;
- dataspaces v1/v2; fill-value message v1/v2/3; attribute message
  v1/2/3 (compact storage);
- data layout message v3: compact, contiguous, and chunked with the
  B-tree-v1 chunk index; missing chunks / unallocated datasets fill
  with the dataset fill value;
- filter pipeline v1/v2 with deflate (zlib), shuffle, fletcher32,
  nbit and integer scaleoffset (r8; cd_values positions per the HDF5
  library's public H5Znbit.c / H5Zscaleoffset.c, real-byte round-trip
  tested against the writer twin — byte-conformance vs libhdf5 output
  is untestable in this container, disclosed in the decoders) — i.e.
  gzip/nbit/scaleoffset-compressed netCDF-4 variables decode; szip
  stays raised (patent-encumbered tables).

The writer emits fixture files in both generations — ``style=
"earliest"`` (superblock v0 + v1 object headers + symbol-table group)
and ``style="latest"`` (superblock v3 + OHDR v2 + link-message group,
Jenkins lookup3 checksums) — with contiguous or chunked layouts and
optional shuffle+deflate, plus netCDF-4-style dimension-scale stub
datasets so the reader's "not a netCDF variable" filtering is
exercised by real bytes.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"
_M32 = 0xFFFFFFFF

# netCDF default fill values (public netcdf.h), keyed by numpy kind+size
NC4_DEFAULT_FILL = {
    ("i", 1): -127,
    ("i", 2): -32767,
    ("i", 4): -2147483647,
    ("i", 8): -9223372036854775806,
    ("u", 1): 255,
    ("u", 2): 65535,
    ("u", 4): 4294967295,
    ("u", 8): 18446744073709551614,
    ("f", 4): 9.9692099683868690e36,
    ("f", 8): 9.9692099683868690e36,
}

# the exact public netCDF-4 marker for a dimension without a variable
_DIM_SCALE_NAME = "This is a netCDF dimension but not a netCDF variable"


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M32


def lookup3(data: bytes, initval: int = 0) -> int:
    """Bob Jenkins' lookup3 ``hashlittle`` — the HDF5 metadata checksum
    (public domain algorithm; HDF5 spec appendix "Checksum")."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & _M32
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & _M32
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & _M32
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & _M32
        a = (a - c) & _M32
        a ^= _rot(c, 4)
        c = (c + b) & _M32
        b = (b - a) & _M32
        b ^= _rot(a, 6)
        a = (a + c) & _M32
        c = (c - b) & _M32
        c ^= _rot(b, 8)
        b = (b + a) & _M32
        a = (a - c) & _M32
        a ^= _rot(c, 16)
        c = (c + b) & _M32
        b = (b - a) & _M32
        b ^= _rot(a, 19)
        a = (a + c) & _M32
        c = (c - b) & _M32
        c ^= _rot(b, 4)
        b = (b + a) & _M32
        i += 12
        length -= 12
    if length == 0:
        return c
    tail = data[i:] + b"\x00" * (12 - length)
    a = (a + int.from_bytes(tail[0:4], "little")) & _M32
    b = (b + int.from_bytes(tail[4:8], "little")) & _M32
    c = (c + int.from_bytes(tail[8:12], "little")) & _M32
    c ^= b
    c = (c - _rot(b, 14)) & _M32
    a ^= c
    a = (a - _rot(c, 11)) & _M32
    b ^= a
    b = (b - _rot(a, 25)) & _M32
    c ^= b
    c = (c - _rot(b, 16)) & _M32
    a ^= c
    a = (a - _rot(c, 4)) & _M32
    b ^= a
    b = (b - _rot(a, 14)) & _M32
    c ^= b
    c = (c - _rot(b, 24)) & _M32
    return c


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _enc_size(n: int) -> int:
    """Bytes needed to store a count with maximum value ``n`` (the
    spec's 'size of number of records' fields)."""
    return max(1, (n.bit_length() + 7) // 8)


def _btree_v2_sizes(
    node_size: int, rec_size: int, so: int, depth: int
) -> tuple[list[int], list[int]]:
    """v2 B-tree capacity arithmetic (HDF5 File Format Spec III.A.2):
    per-depth maximum record counts ``caps[d]`` and maximum subtree
    totals ``tots[d]`` for nodes at depth ``d`` (0 = leaf), up to
    ``depth``.  These determine the child-pointer field widths inside
    internal nodes — reader and fixture writer share this function so
    the byte layout can never drift between them."""
    # leaf/internal overhead: 4 signature + 1 version + 1 type + 4 checksum
    leaf_cap = (node_size - 10) // rec_size
    caps = [leaf_cap]
    tots = [leaf_cap]
    for d in range(1, depth + 1):
        ptr = so + _enc_size(caps[d - 1]) + (
            _enc_size(tots[d - 1]) if d > 1 else 0
        )
        cap = (node_size - 10 - ptr) // (rec_size + ptr)
        if cap < 1:
            raise ValueError(
                f"v2 B-tree node size {node_size} too small for internal "
                f"nodes at depth {d}"
            )
        caps.append(cap)
        tots.append(cap + (cap + 1) * tots[d - 1])
    return caps, tots


@dataclass
class _Dataset:
    name: str
    shape: tuple[int, ...]
    dtype: np.dtype
    attrs: dict = field(default_factory=dict)
    layout: tuple = ()  # ("contiguous", addr, size) | ("chunked", btree, cdims) | ("compact", bytes)
    fill: bytes | None = None
    filters: list = field(default_factory=list)


class _H5Ref:
    """An unresolved HDF5 object reference (a file address) — replaced
    with the referenced object's path after the full group walk."""

    __slots__ = ("addr",)

    def __init__(self, addr: int):
        self.addr = addr


class HDF5File:
    """Parsed minimal-HDF5 file (read-only, from bytes).  Exposes
    ``root_attrs`` and ``datasets`` (path -> :class:`_Dataset`, root
    children unprefixed, nested groups joined with ``/``)."""

    def __init__(self, payload: bytes):
        if payload[:8] != HDF5_MAGIC:
            raise ValueError(f"not an HDF5 file (magic {payload[:8]!r})")
        self._buf = payload
        root = self._superblock()
        self.root_attrs: dict = {}
        self.datasets: dict[str, _Dataset] = {}
        self._addr_names: dict[int, str] = {}
        self._walk_group(root, prefix="", is_root=True, seen=set())
        # object references resolve to PATHS once every object has been
        # walked (DIMENSION_LIST -> dimension-scale names); unknown
        # addresses stay as raw ints rather than raising
        self.root_attrs = self._resolve_refs(self.root_attrs)
        for ds in self.datasets.values():
            ds.attrs = self._resolve_refs(ds.attrs)

    def _resolve_refs(self, value):
        """Replace :class:`_H5Ref` placeholders (recursively, through
        lists) with the referenced object's path."""
        if isinstance(value, _H5Ref):
            return self._addr_names.get(value.addr, value.addr)
        if isinstance(value, list):
            return [self._resolve_refs(v) for v in value]
        if isinstance(value, dict):
            return {k: self._resolve_refs(v) for k, v in value.items()}
        return value

    # --- primitives ---------------------------------------------------
    def _u(self, pos: int, n: int) -> int:
        return int.from_bytes(self._buf[pos : pos + n], "little")

    def _addr(self, pos: int) -> int | None:
        v = self._u(pos, self._so)
        return None if v == (1 << (8 * self._so)) - 1 else v

    def _superblock(self) -> int:
        b = self._buf
        ver = b[8]
        if ver in (0, 1):
            self._so, self._sl = b[13], b[14]
            pos = 24 if ver == 0 else 28
            pos += 4 * self._so  # base, free-space, eof, driver-info
            # root group symbol table entry: name offset, OH address, ...
            oh = self._addr(pos + self._so)
            if oh is None:
                raise ValueError("superblock: undefined root address")
            return oh
        if ver in (2, 3):
            self._so, self._sl = b[9], b[10]
            pos = 12 + 3 * self._so  # base, extension, eof
            oh = self._addr(pos)
            if oh is None:
                raise ValueError("superblock: undefined root address")
            return oh
        raise ValueError(f"unsupported superblock version {ver}")

    # --- object headers ----------------------------------------------
    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, body) messages of the object header at ``addr``,
        continuations resolved, v1 and v2 headers alike."""
        b = self._buf
        if b[addr : addr + 4] == b"OHDR":
            return self._messages_v2(addr)
        if b[addr] != 1:
            raise ValueError(f"unsupported object header version {b[addr]}")
        nmsgs = self._u(addr + 2, 2)
        hdrsize = self._u(addr + 8, 4)
        blocks = [(addr + 16, hdrsize)]
        out: list[tuple[int, bytes]] = []
        while blocks and len(out) < nmsgs:
            start, size = blocks.pop(0)
            pos, end = start, start + size
            while pos + 8 <= end and len(out) < nmsgs:
                mtype = self._u(pos, 2)
                msize = self._u(pos + 2, 2)
                body = b[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                if mtype == 0x0010:  # continuation: raw messages block
                    cont = int.from_bytes(body[: self._so], "little")
                    clen = int.from_bytes(
                        body[self._so : self._so + self._sl], "little"
                    )
                    blocks.append((cont, clen))
                elif mtype != 0x0000:  # NIL
                    out.append((mtype, body))
        return out

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes]]:
        b = self._buf
        flags = b[addr + 5]
        pos = addr + 6
        if flags & 0x20:
            pos += 16  # four timestamps
        if flags & 0x10:
            pos += 4  # max-compact / min-dense attribute phase change
        csize_bytes = 1 << (flags & 0x03)
        chunk0 = self._u(pos, csize_bytes)
        pos += csize_bytes
        corder = 2 if flags & 0x04 else 0
        blocks = [(pos, chunk0)]
        out: list[tuple[int, bytes]] = []
        while blocks:
            start, size = blocks.pop(0)
            pos, end = start, start + size
            while pos + 4 + corder <= end:
                mtype = b[pos]
                msize = self._u(pos + 1, 2)
                pos += 4 + corder
                body = b[pos : pos + msize]
                pos += msize
                if mtype == 0x10:
                    cont = int.from_bytes(body[: self._so], "little")
                    clen = int.from_bytes(
                        body[self._so : self._so + self._sl], "little"
                    )
                    # OCHK signature + trailing checksum bracket the block
                    blocks.append((cont + 4, clen - 8))
                elif mtype != 0x00:
                    out.append((mtype, body))
        return out

    # --- message decoders --------------------------------------------
    def _dtype(self, body: bytes):
        cls, size = body[0] & 0x0F, self._u4(body, 4)
        bits = body[1] | (body[2] << 8) | (body[3] << 16)
        order = ">" if bits & 1 else "<"
        if cls == 0:
            return np.dtype(f"{order}{'i' if bits & 8 else 'u'}{size}")
        if cls == 1:
            return np.dtype(f"{order}f{size}")
        if cls == 3:
            return np.dtype(f"S{size}")
        if cls == 7:
            # reference: type in bits 0-3 — 0 = object reference
            # (region references -> None)
            return ("ref", size) if (bits & 0x0F) == 0 else None
        if cls == 9 and (bits & 0x0F) == 1:
            return "vlen_str"  # variable-length string (global heap)
        if cls == 9 and (bits & 0x0F) == 0:
            # vlen SEQUENCE: the base datatype message follows the
            # 8-byte header (r8 — DIMENSION_LIST is a vlen sequence of
            # object references, netCDF-4's dimension mapping)
            base = self._dtype(body[8:])
            if isinstance(base, np.dtype) or (
                isinstance(base, tuple) and base[0] == "ref"
            ):
                return ("vlen_seq", base)
            return None
        return None  # region ref / compound / nested vlen: value -> None

    @staticmethod
    def _u4(b: bytes, pos: int) -> int:
        return int.from_bytes(b[pos : pos + 4], "little")

    def _dataspace(self, body: bytes) -> tuple[int, ...]:
        ver, rank = body[0], body[1]
        pos = 8 if ver == 1 else 4
        return tuple(
            int.from_bytes(body[pos + i * self._sl : pos + (i + 1) * self._sl], "little")
            for i in range(rank)
        )

    def _fill(self, body: bytes) -> bytes | None:
        ver = body[0]
        if ver in (1, 2):
            if ver == 2 and body[3] != 1:
                return None
            n = self._u4(body, 4)
            return bytes(body[8 : 8 + n]) if n else None
        if ver == 3:
            if body[1] & 0x20:
                n = self._u4(body, 2)
                return bytes(body[6 : 6 + n]) if n else None
            return None
        raise ValueError(f"unsupported fill-value message version {ver}")

    def _filters(self, body: bytes) -> list[tuple[int, int, tuple[int, ...]]]:
        ver, nf = body[0], body[1]
        pos = 8 if ver == 1 else 2
        out = []
        for _ in range(nf):
            fid = int.from_bytes(body[pos : pos + 2], "little")
            pos += 2
            if ver == 1 or fid >= 256:
                nlen = int.from_bytes(body[pos : pos + 2], "little")
                pos += 2
            else:
                nlen = 0
            flags = int.from_bytes(body[pos : pos + 2], "little")
            ncdv = int.from_bytes(body[pos + 2 : pos + 4], "little")
            pos += 4
            if nlen:
                pad = (nlen + 7) // 8 * 8 if ver == 1 else nlen
                pos += pad
            cd = tuple(
                self._u4(body, pos + 4 * i) for i in range(ncdv)
            )
            pos += 4 * ncdv
            if ver == 1 and ncdv % 2:
                pos += 4
            out.append((fid, flags, cd))
        return out

    def _attribute(self, body: bytes) -> tuple[str, object]:
        ver = body[0]
        nsz = int.from_bytes(body[2:4], "little")
        dtsz = int.from_bytes(body[4:6], "little")
        dssz = int.from_bytes(body[6:8], "little")
        if ver == 1:
            pos = 8
            name = body[pos : pos + nsz].split(b"\x00")[0].decode()
            pos += (nsz + 7) // 8 * 8
            dt = self._dtype(body[pos : pos + dtsz])
            pos += (dtsz + 7) // 8 * 8
            shape = self._dataspace(body[pos : pos + dssz])
            pos += (dssz + 7) // 8 * 8
        elif ver in (2, 3):
            if ver == 2 and body[1] & 0x03:
                return ("", None)  # shared datatype/dataspace: skip
            pos = 8 + (1 if ver == 3 else 0)
            name = body[pos : pos + nsz].split(b"\x00")[0].decode()
            pos += nsz
            dt = self._dtype(body[pos : pos + dtsz])
            pos += dtsz
            shape = self._dataspace(body[pos : pos + dssz])
            pos += dssz
        else:
            raise ValueError(f"unsupported attribute message version {ver}")
        if dt is None:
            return (name, None)
        n = int(np.prod(shape)) if shape else 1
        if dt == "vlen_str":
            # per element: length (4) + global-heap collection address
            # (O) + object index (4) — netCDF4's NC_STRING attributes
            esz = 8 + self._so
            vals = []
            for i in range(n):
                off = pos + i * esz
                ln = self._u4(body, off)
                gaddr = int.from_bytes(
                    body[off + 4 : off + 4 + self._so], "little"
                )
                idx = self._u4(body, off + 4 + self._so)
                vals.append(
                    self._gheap_object(gaddr, idx)[:ln].decode(
                        "utf-8", "replace"
                    )
                )
            return (name, vals[0] if n == 1 else vals)
        if isinstance(dt, tuple) and dt[0] == "ref":
            rs = dt[1]
            refs = [
                _H5Ref(
                    int.from_bytes(
                        body[pos + i * rs : pos + (i + 1) * rs], "little"
                    )
                )
                for i in range(n)
            ]
            # collapse only truly SCALAR dataspaces — a rank-1 size-1
            # DIMENSION_LIST is still a list-of-lists
            return (name, refs[0] if not shape else refs)
        if isinstance(dt, tuple) and dt[0] == "vlen_seq":
            base = dt[1]
            esz = 8 + self._so
            out: list = []
            for i in range(n):
                off = pos + i * esz
                ln = self._u4(body, off)
                gaddr = int.from_bytes(
                    body[off + 4 : off + 4 + self._so], "little"
                )
                idx = self._u4(body, off + 4 + self._so)
                raw = self._gheap_object(gaddr, idx)
                if isinstance(base, tuple):  # ("ref", size)
                    bs = base[1]
                    out.append(
                        [
                            _H5Ref(
                                int.from_bytes(
                                    raw[j * bs : (j + 1) * bs], "little"
                                )
                            )
                            for j in range(ln)
                        ]
                    )
                else:
                    out.append(np.frombuffer(raw, dtype=base, count=ln))
            return (name, out[0] if not shape else out)
        raw = body[pos : pos + n * dt.itemsize]
        if dt.kind == "S":
            return (name, raw.split(b"\x00")[0].decode("utf-8", "replace"))
        vals = np.frombuffer(raw, dtype=dt, count=n)
        return (name, vals[0] if n == 1 else vals)

    def _gheap_object(self, addr: int, want_idx: int) -> bytes:
        """Object ``want_idx`` from the global heap collection at
        ``addr`` (signature ``GCOL``): walk the object run — index (2),
        refcount (2), reserved (4), size (L), data 8-aligned."""
        b = self._buf
        if b[addr : addr + 4] != b"GCOL":
            raise ValueError("bad global heap collection signature")
        total = self._u(addr + 8, self._sl)
        pos, end = addr + 8 + self._sl, addr + total
        while pos + 8 + self._sl <= end:
            idx = self._u(pos, 2)
            size = self._u(pos + 8, self._sl)
            data_at = pos + 8 + self._sl
            if idx == want_idx:
                return bytes(b[data_at : data_at + size])
            if idx == 0:  # free-space object terminates the run
                break
            pos = data_at + (size + 7) // 8 * 8
        raise ValueError(f"global heap object {want_idx} not found")

    # --- fractal heap + v2 B-tree (dense attribute / link storage) ----
    def _fractal_heap(self, addr: int):
        """Managed-object fetcher for the fractal heap headered at
        ``addr``: returns ``get(heap_id) -> bytes``.  Supports a root
        direct block, root indirect blocks, NESTED indirect blocks
        (rows past the maximum-direct row recurse into child indirect
        blocks whose span halves back down the doubling table), and
        FILTERED heaps (direct blocks stored through the I/O filter
        pipeline declared in the header — the stored size travels in
        the header for a root direct block and in each indirect-block
        entry otherwise).  Huge/tiny objects raise clearly."""
        b = self._buf
        if b[addr : addr + 4] != b"FRHP":
            raise ValueError("bad fractal heap header signature")
        so, sl = self._so, self._sl
        pos = addr + 5
        id_len = self._u(pos, 2)
        filter_len = self._u(pos + 2, 2)
        flags = b[pos + 4]
        pos += 4 + 1 + 4  # id len, filter len, flags, max managed size
        pos += sl  # next huge id
        huge_btree = self._addr(pos)
        pos += so
        pos += sl + so  # free space, free-space manager
        # managed space, allocated, block iterator, managed count,
        # huge size, huge count, tiny size, tiny count
        pos += 8 * sl
        table_width = self._u(pos, 2)
        start_block = self._u(pos + 2, sl)
        max_direct = self._u(pos + 2 + sl, sl)
        max_heap_bits = self._u(pos + 2 + 2 * sl, 2)
        pos += 2 + 2 * sl + 2 + 2  # width, start, maxdirect, maxbits, startrows
        root_addr = self._addr(pos)
        cur_rows = self._u(pos + so, 2)
        pos += so + 2
        filters: list[tuple[int, int, tuple[int, ...]]] = []
        root_filtered_size = None
        if filter_len:
            if cur_rows == 0:  # root is a direct block: stored size + mask
                root_filtered_size = self._u(pos, sl)
                pos += sl + 4
            filters = self._filters(bytes(b[pos : pos + filter_len]))
        off_size = (max_heap_bits + 7) // 8
        len_size = id_len - 1 - off_size
        if len_size <= 0:
            raise ValueError("inconsistent fractal heap id length")
        checksummed = bool(flags & 0x02)

        # every direct block as (block_offset, size, logical_bytes)
        blocks: list[tuple[int, int, bytes]] = []

        def row_size(r: int) -> int:
            return start_block if r < 2 else start_block << (r - 1)

        max_direct_rows = (
            max_direct.bit_length() - start_block.bit_length() + 2
        )

        def read_direct(daddr: int, size: int, stored: int | None) -> None:
            if filters:
                raw = bytes(b[daddr : daddr + stored])
                for fid, _fl, cd in reversed(filters):
                    raw = _defilter(fid, cd, raw)
                image = raw
            else:
                image = bytes(b[daddr : daddr + size])
            if image[:4] != b"FHDB":
                raise ValueError("bad fractal heap direct block signature")
            boff = int.from_bytes(
                image[5 + so : 5 + so + off_size], "little"
            )
            blocks.append((boff, size, image))

        def read_indirect(iaddr: int, nrows: int) -> None:
            if b[iaddr : iaddr + 4] != b"FHIB":
                raise ValueError(
                    "bad fractal heap indirect block signature"
                )
            p = iaddr + 5 + so + off_size
            for r in range(nrows):
                for _w in range(table_width):
                    caddr = self._addr(p)
                    p += so
                    if r < max_direct_rows:
                        stored = None
                        if filters:
                            stored = self._u(p, sl)
                            p += sl + 4  # filtered size + filter mask
                        if caddr is not None:
                            read_direct(caddr, row_size(r), stored)
                    elif caddr is not None:
                        # child indirect block spanning row_size(r):
                        # width*start*2^(n-1) bytes -> n rows
                        span = row_size(r)
                        child_rows = (
                            span // (table_width * start_block)
                        ).bit_length()
                        read_indirect(caddr, child_rows)

        if root_addr is None:
            return lambda _hid: (_ for _ in ()).throw(
                ValueError("empty fractal heap")
            )
        if cur_rows == 0:
            read_direct(root_addr, start_block, root_filtered_size)
        else:
            read_indirect(root_addr, cur_rows)

        hdr_size = 5 + so + off_size + (4 if checksummed else 0)

        huge_records: dict[int, tuple[int, int]] | None = None

        def get(heap_id: bytes) -> bytes:
            nonlocal huge_records
            vt = heap_id[0]
            hid_type = (vt >> 4) & 0x03
            if hid_type == 2:
                # TINY object: the data lives INSIDE the heap id —
                # normal form (id len <= 18): low 4 bits = length - 1
                ln = (vt & 0x0F) + 1
                if 1 + ln > len(heap_id):
                    raise ValueError("tiny heap id longer than the id")
                return bytes(heap_id[1 : 1 + ln])
            if hid_type == 1:
                # HUGE object, indirectly accessed (the only form a
                # short id can carry): the id is a key into the heap's
                # huge-object v2 B-tree.  Unfiltered heaps use type-1
                # records (address, length, ID); filtered heaps use
                # type-2 (address, FILTERED length, filter mask, memory
                # size, ID) and the stored bytes pass back through the
                # heap's I/O pipeline
                if huge_btree is None:
                    raise ValueError(
                        "huge heap id but the heap has no huge-object "
                        "B-tree"
                    )
                if huge_records is None:
                    huge_records = {}
                    for rec in self._btree_v2_records(huge_btree):
                        a0 = int.from_bytes(rec[:so], "little")
                        ln0 = int.from_bytes(rec[so : so + sl], "little")
                        if filters:
                            # type-2: + filter mask (4), memory size (sl)
                            mask = int.from_bytes(
                                rec[so + sl : so + sl + 4], "little"
                            )
                            mem = int.from_bytes(
                                rec[so + sl + 4 : so + 2 * sl + 4],
                                "little",
                            )
                            bid = int.from_bytes(
                                rec[so + 2 * sl + 4 : so + 3 * sl + 4],
                                "little",
                            )
                            huge_records[bid] = (a0, ln0, mask, mem)
                        else:
                            bid = int.from_bytes(
                                rec[so + sl : so + 2 * sl], "little"
                            )
                            huge_records[bid] = (a0, ln0, 0, None)
                    # records are keyed by ID; collisions impossible
                bid = int.from_bytes(heap_id[1:], "little")
                if bid not in huge_records:
                    raise ValueError(f"huge heap object {bid} not found")
                a0, ln0, mask, mem = huge_records[bid]
                raw = bytes(b[a0 : a0 + ln0])
                if filters:
                    for fi, (fid, _fl, cd) in enumerate(
                        reversed(filters)
                    ):
                        if not (mask >> (len(filters) - 1 - fi)) & 1:
                            raw = _defilter(fid, cd, raw)
                    if mem is not None and len(raw) != mem:
                        raise ValueError(
                            "filtered huge object memory-size mismatch"
                        )
                return raw
            if hid_type != 0:
                raise ValueError(f"unknown fractal heap id type {hid_type}")
            obj_off = int.from_bytes(heap_id[1 : 1 + off_size], "little")
            obj_len = int.from_bytes(
                heap_id[1 + off_size : 1 + off_size + len_size], "little"
            )
            for boff, size, image in blocks:
                if boff <= obj_off < boff + size:
                    start = obj_off - boff
                    return image[start : start + obj_len]
            raise ValueError(f"fractal heap object at {obj_off} not found")

        # objects never land inside a block header; expose for sanity
        get.header_size = hdr_size  # type: ignore[attr-defined]
        return get

    def _btree_v2_records(self, addr: int) -> list[bytes]:
        """All raw records of the v2 B-tree headered at ``addr`` (used
        for the dense-storage name indexes), in key order — MULTI-LEVEL
        trees included: internal ``BTIN`` nodes interleave records with
        child pointers (address + child record count [+ subtree total
        below internal children]), whose field widths derive from the
        node-size capacity arithmetic (HDF5 File Format Spec III.A.2;
        shared with the fixture writer via ``_btree_v2_sizes``)."""
        b = self._buf
        if b[addr : addr + 4] != b"BTHD":
            raise ValueError("bad v2 B-tree header signature")
        node_size = self._u(addr + 6, 4)
        rec_size = self._u(addr + 10, 2)
        depth = self._u(addr + 12, 2)
        # +14/+15: split / merge percents
        root = self._addr(addr + 16)
        nrec = self._u(addr + 16 + self._so, 2)
        if root is None or nrec == 0:
            return []
        caps, tots = _btree_v2_sizes(node_size, rec_size, self._so, depth)
        out: list[bytes] = []

        def walk(naddr: int, d: int, n: int) -> None:
            if d == 0:
                if b[naddr : naddr + 4] != b"BTLF":
                    raise ValueError("bad v2 B-tree leaf signature")
                pos = naddr + 6
                out.extend(
                    bytes(b[pos + i * rec_size : pos + (i + 1) * rec_size])
                    for i in range(n)
                )
                return
            if b[naddr : naddr + 4] != b"BTIN":
                raise ValueError("bad v2 B-tree internal node signature")
            rpos = naddr + 6
            ppos = rpos + n * rec_size
            n_size = _enc_size(caps[d - 1])
            tot_size = _enc_size(tots[d - 1]) if d > 1 else 0
            ptr = self._so + n_size + tot_size
            kids = []
            for i in range(n + 1):
                at = ppos + i * ptr
                caddr = self._addr(at)
                cnrec = self._u(at + self._so, n_size)
                kids.append((caddr, cnrec))
            for i, (caddr, cnrec) in enumerate(kids):
                if caddr is None:
                    raise ValueError("undefined v2 B-tree child pointer")
                walk(caddr, d - 1, cnrec)
                if i < n:
                    out.append(
                        bytes(
                            b[rpos + i * rec_size : rpos + (i + 1) * rec_size]
                        )
                    )

        walk(root, depth, nrec)
        return out

    def _dense_attributes(self, body: bytes) -> dict:
        """Attributes stored densely (attribute-info message 0x0015):
        v2-B-tree name index -> 8-byte heap IDs -> attribute messages in
        the fractal heap.  Real netCDF-4 writers switch to this above
        the max-compact threshold in 1.8+ ("latest") files."""
        pos = 2 + (2 if body[1] & 0x01 else 0)
        heap_addr = self._addr_from(body, pos)
        btree_addr = self._addr_from(body, pos + self._so)
        if heap_addr is None:
            return {}
        if btree_addr is None:
            raise ValueError(
                "dense attribute storage without a name index"
            )
        heap = self._fractal_heap(heap_addr)
        out = {}
        for rec in self._btree_v2_records(btree_addr):
            # type-8 record: heap id (8), message flags (1), corder (4),
            # name hash (4)
            name, value = self._attribute(heap(rec[:8]))
            if name:
                out[name] = value
        return out

    def _dense_links(self, body: bytes) -> list[tuple[str, int]]:
        """Links stored densely (link-info message 0x0002): v2-B-tree
        name index -> 7-byte heap IDs -> link messages in the fractal
        heap (the "dense group" storage of 1.8+ files)."""
        pos = 2 + (8 if body[1] & 0x01 else 0)
        heap_addr = self._addr_from(body, pos)
        btree_addr = self._addr_from(body, pos + self._so)
        if heap_addr is None:
            return []
        if btree_addr is None:
            raise ValueError("dense group storage without a name index")
        heap = self._fractal_heap(heap_addr)
        out = []
        for rec in self._btree_v2_records(btree_addr):
            # type-5 record: name hash (4), heap id (7)
            link = self._link(heap(rec[4:11]))
            if link is not None:
                out.append(link)
        return out

    def _addr_from(self, body: bytes, pos: int) -> int | None:
        v = int.from_bytes(body[pos : pos + self._so], "little")
        return None if v == (1 << (8 * self._so)) - 1 else v

    # --- group walking ------------------------------------------------
    def _walk_group(self, addr: int, prefix: str, is_root: bool, seen: set):
        if addr in seen:
            return
        seen.add(addr)
        self._addr_names[addr] = prefix.rstrip("/") or "/"
        msgs = self._messages(addr)
        by_type: dict[int, list[bytes]] = {}
        for t, body in msgs:
            by_type.setdefault(t, []).append(body)

        attrs = dict(
            self._attribute(b) for b in by_type.get(0x000C, [])
        )
        attrs.pop("", None)
        for body in by_type.get(0x0015, []):  # attribute info: dense attrs
            attrs.update(self._dense_attributes(body))

        if 0x0008 in by_type:  # data layout -> dataset
            self._add_dataset(prefix, by_type, attrs)
            return
        if is_root:
            self.root_attrs = attrs
        children: list[tuple[str, int]] = []
        for body in by_type.get(0x0011, []):  # old-style symbol table
            btree = int.from_bytes(body[: self._so], "little")
            heap = int.from_bytes(body[self._so : 2 * self._so], "little")
            children.extend(self._symbol_table(btree, heap))
        for body in by_type.get(0x0006, []):  # new-style link message
            link = self._link(body)
            if link is not None:
                children.append(link)
        for body in by_type.get(0x0002, []):  # link info: dense links
            children.extend(self._dense_links(body))
        for name, child_addr in children:
            path = f"{prefix}{name}"
            self._walk_group(child_addr, path + "/", False, seen)

    def _link(self, body: bytes) -> tuple[str, int] | None:
        flags = body[1]
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[pos]
            pos += 1
        if flags & 0x04:
            pos += 8
        if flags & 0x10:
            pos += 1
        nbytes = 1 << (flags & 0x03)
        nlen = int.from_bytes(body[pos : pos + nbytes], "little")
        pos += nbytes
        name = body[pos : pos + nlen].decode()
        pos += nlen
        if ltype != 0:
            return None  # soft/external links: skip
        return (name, int.from_bytes(body[pos : pos + self._so], "little"))

    def _symbol_table(self, btree: int, heap: int) -> list[tuple[str, int]]:
        b = self._buf
        if b[heap : heap + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        heap_data = self._u(heap + 8 + 2 * self._sl, self._so)

        def name_at(off: int) -> str:
            end = b.index(b"\x00", heap_data + off)
            return b[heap_data + off : end].decode()

        out: list[tuple[str, int]] = []

        def walk(node_addr: int):
            if b[node_addr : node_addr + 4] == b"SNOD":
                nsyms = self._u(node_addr + 6, 2)
                pos = node_addr + 8
                for _ in range(nsyms):
                    off = self._u(pos, self._so)
                    oh = self._u(pos + self._so, self._so)
                    out.append((name_at(off), oh))
                    pos += 2 * self._so + 24
                return
            if b[node_addr : node_addr + 4] != b"TREE":
                raise ValueError("bad group B-tree node signature")
            entries = self._u(node_addr + 6, 2)
            pos = node_addr + 8 + 2 * self._so  # skip left/right siblings
            for _ in range(entries):
                pos += self._sl  # key
                walk(self._u(pos, self._so))
                pos += self._so

        walk(btree)
        return out

    # --- datasets -----------------------------------------------------
    def _add_dataset(self, prefix: str, by_type: dict, attrs: dict):
        name = prefix.rstrip("/")
        dt = self._dtype(by_type[0x0003][0])
        if not isinstance(dt, np.dtype):
            return  # reference/vlen datasets: not scene data
        shape = self._dataspace(by_type[0x0001][0])
        layout = by_type[0x0008][0]
        ver = layout[0]
        if ver != 3:
            raise ValueError(
                f"data layout message version {ver} not supported "
                "(only v3 compact/contiguous/chunked)"
            )
        cls = layout[1]
        if cls == 0:
            n = int.from_bytes(layout[2:4], "little")
            lay = ("compact", bytes(layout[4 : 4 + n]))
        elif cls == 1:
            addr = int.from_bytes(layout[2 : 2 + self._so], "little")
            size = int.from_bytes(
                layout[2 + self._so : 2 + self._so + self._sl], "little"
            )
            lay = ("contiguous", addr, size)
        elif cls == 2:
            dim = layout[2]
            btree = int.from_bytes(layout[3 : 3 + self._so], "little")
            cdims = tuple(
                self._u4(layout, 3 + self._so + 4 * i) for i in range(dim)
            )
            lay = ("chunked", btree, cdims)
        else:
            raise ValueError(f"unknown layout class {cls}")
        fill = None
        for body in by_type.get(0x0005, []):
            fill = self._fill(body) or fill
        filters = []
        for body in by_type.get(0x000B, []):
            filters = self._filters(body)
        self.datasets[name] = _Dataset(
            name, shape, dt, attrs, lay, fill, filters
        )

    def _fill_scalar(self, ds: _Dataset):
        if ds.fill is not None and len(ds.fill) == ds.dtype.itemsize:
            return np.frombuffer(ds.fill, dtype=ds.dtype)[0]
        return np.zeros((), dtype=ds.dtype)[()]  # HDF5 default fill = 0

    def read(self, name: str) -> np.ndarray:
        """Dataset as a native-order numpy array (missing chunks /
        unallocated data -> the dataset's HDF5 fill value)."""
        ds = self.datasets[name]
        kind = ds.layout[0]
        n = int(np.prod(ds.shape)) if ds.shape else 1
        if n > (1 << 31):
            # the decode materializes the array, so any legitimate
            # dataset fits in memory; a corrupt dataspace dim would
            # otherwise turn np.full into a petabyte allocation
            # (r10 fuzz: flipped dim bytes hung the process)
            raise ValueError(
                f"{name}: implausible element count {n} "
                "(corrupt dataspace?)"
            )
        if kind == "compact":
            return (
                np.frombuffer(ds.layout[1], dtype=ds.dtype, count=n)
                .reshape(ds.shape)
                .astype(ds.dtype.newbyteorder("="))
            )
        if kind == "contiguous":
            addr = ds.layout[1]
            if addr >= (1 << (8 * self._so)) - 1:
                arr = np.full(ds.shape, self._fill_scalar(ds), dtype=ds.dtype)
                return arr.astype(ds.dtype.newbyteorder("="))
            arr = np.frombuffer(self._buf, dtype=ds.dtype, count=n, offset=addr)
            return arr.reshape(ds.shape).astype(ds.dtype.newbyteorder("="))
        _, btree, cdims = ds.layout
        chunk_shape = cdims[:-1]
        out = np.full(ds.shape, self._fill_scalar(ds), dtype=ds.dtype)
        undef = (1 << (8 * self._so)) - 1
        if btree != undef:
            for coords, addr, size, mask in self._chunks(btree, len(cdims)):
                raw = self._buf[addr : addr + size]
                for i, (fid, _fl, cd) in enumerate(reversed(ds.filters)):
                    if mask & (1 << (len(ds.filters) - 1 - i)):
                        continue
                    raw = _defilter(fid, cd, raw)
                chunk = np.frombuffer(
                    raw, dtype=ds.dtype, count=int(np.prod(chunk_shape))
                ).reshape(chunk_shape)
                sel_out, sel_chunk = [], []
                for d, c0 in enumerate(coords[:-1]):
                    hi = min(c0 + chunk_shape[d], ds.shape[d])
                    sel_out.append(slice(c0, hi))
                    sel_chunk.append(slice(0, hi - c0))
                out[tuple(sel_out)] = chunk[tuple(sel_chunk)]
        return out.astype(ds.dtype.newbyteorder("="))

    def _chunks(self, node_addr: int, dim: int):
        b = self._buf
        if b[node_addr : node_addr + 4] != b"TREE":
            raise ValueError("bad chunk B-tree node signature")
        level = b[node_addr + 5]
        entries = self._u(node_addr + 6, 2)
        pos = node_addr + 8 + 2 * self._so
        for _ in range(entries):
            size = self._u4(b, pos)
            mask = self._u4(b, pos + 4)
            coords = tuple(
                self._u(pos + 8 + 8 * i, 8) for i in range(dim)
            )
            pos += 8 + 8 * dim
            child = self._u(pos, self._so)
            pos += self._so
            if level == 0:
                yield (coords, child, size, mask)
            else:
                yield from self._chunks(child, dim)


def _unpack_msb(raw: bytes, start_byte: int, nelmts: int, nbits: int) -> np.ndarray:
    """Unpack ``nelmts`` values of ``nbits`` bits each, packed MSB-first
    from ``raw[start_byte:]`` — the bit layout both H5Znbit and
    H5Zscaleoffset stream their packed elements in.  Returns uint64."""
    if nbits == 0:
        return np.zeros(nelmts, dtype=np.uint64)
    need = (nelmts * nbits + 7) // 8
    if len(raw) - start_byte < need:
        raise ValueError("HDF5 filter: packed stream truncated")
    bits = np.unpackbits(
        np.frombuffer(raw, np.uint8, count=need, offset=start_byte)
    )[: nelmts * nbits].reshape(nelmts, nbits)
    w = (np.uint64(1) << np.arange(nbits - 1, -1, -1, dtype=np.uint64))
    return bits.astype(np.uint64) @ w


def _pack_msb(vals: np.ndarray, nbits: int) -> bytes:
    """Inverse of :func:`_unpack_msb` (writer side)."""
    if nbits == 0 or vals.size == 0:
        return b""
    v = vals.astype(np.uint64)
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def _nbit_decode(cd: tuple[int, ...], raw: bytes) -> bytes:
    """N-bit filter (id 5) — stores only each element's ``precision``
    significant bits starting at bit ``offset``, packed MSB-first.
    ``cd`` follows H5Znbit.c's atomic layout: (total_parms, do_comp,
    nelmts, class, size, order, precision, offset); only the atomic
    integer class is supported (what netCDF-4 emits).  Byte-level
    conformance with libhdf5 output is untestable in this container
    (no hdf5 libs) — the writer/decoder pair round-trips real bytes
    and the transform itself is the documented one."""
    if len(cd) < 8:
        raise ValueError("nbit: short client data")
    _total, do_comp, nelmts, cls, size, _order, prec, off = cd[:8]
    if cls != 1:
        raise NotImplementedError("nbit: only atomic datatypes")
    if size not in (1, 2, 4, 8) or prec + off > 8 * size or prec < 1:
        raise ValueError("nbit: bad precision/offset for element size")
    if not do_comp:
        return raw
    vals = _unpack_msb(raw, 0, nelmts, prec) << np.uint64(off)
    return vals.astype(f"<u{size}").tobytes()


def _scaleoffset_decode(cd: tuple[int, ...], raw: bytes) -> bytes:
    """Scale-offset filter (id 6), integer path — per-chunk min is
    subtracted and the residuals stored in ``minbits`` bits each.
    ``cd`` follows H5Zscaleoffset.c's parameter order: (scale_type,
    scale_factor, nelmts, class, size, sign, order, fill_defined, ...);
    the compressed chunk leads with a 4-byte LE ``minbits`` + 8-byte LE
    ``minval`` header, then the MSB-first packed residuals.  Only the
    integer class without a defined fill value is supported (the
    netCDF-4 shape); float D-scaling raises.  Same conformance note as
    :func:`_nbit_decode`."""
    if len(cd) < 8:
        raise ValueError("scaleoffset: short client data")
    scale_type, _factor, nelmts, cls, size, sign, _order, filavail = cd[:8]
    if cls != 0 or scale_type != 0:
        raise NotImplementedError(
            "scaleoffset: only integer H5Z_SO_INT supported"
        )
    if filavail:
        raise NotImplementedError("scaleoffset: fill-value path")
    if size not in (1, 2, 4, 8):
        raise ValueError("scaleoffset: bad element size")
    if len(raw) < 12:
        raise ValueError("scaleoffset: truncated header")
    minbits = int.from_bytes(raw[0:4], "little")
    minval_u = int.from_bytes(raw[4:12], "little")
    if minbits > 8 * size:
        raise ValueError("scaleoffset: minbits exceeds element width")
    if minbits == 8 * size:  # incompressible chunk: verbatim copy
        return raw[12 : 12 + nelmts * size]
    packed = _unpack_msb(raw, 12, nelmts, minbits)
    mask = (1 << (8 * size)) - 1
    out = (packed + np.uint64(minval_u & mask)) & np.uint64(mask)
    del sign  # reconstruction is two's-complement either way
    return out.astype(f"<u{size}").tobytes()


def _nbit_encode(cd: tuple[int, ...], blob: bytes) -> bytes:
    """Writer twin of :func:`_nbit_decode` (real-byte fixtures)."""
    _t, _do, nelmts, _c, size, _o, prec, off = cd[:8]
    a = np.frombuffer(blob, f"<u{size}").astype(np.uint64)
    full = (1 << (8 * size)) - 1
    window = ((1 << prec) - 1) << off
    if int((a & np.uint64(full ^ window)).max(initial=0)):
        raise ValueError("nbit: values carry bits outside the window")
    return _pack_msb((a >> np.uint64(off)), prec)


def _scaleoffset_encode(cd: tuple[int, ...], blob: bytes) -> bytes:
    """Writer twin of :func:`_scaleoffset_decode`."""
    _st, factor, nelmts, _c, size, sign, _o, _f = cd[:8]
    kind = "i" if sign else "u"
    sv = np.frombuffer(blob, f"<{kind}{size}").astype(np.int64)
    minval = int(sv.min(initial=0))
    resid = (sv - minval).astype(np.uint64)
    span = int(resid.max(initial=0))
    minbits = min(factor if factor > 0 else span.bit_length(), 8 * size)
    if factor > 0 and factor < 8 * size and span >= (1 << factor):
        raise ValueError("scaleoffset: data exceeds the fixed scale_factor")
    full = (1 << (8 * size)) - 1
    if minbits == 8 * size:  # incompressible: verbatim after the header
        return minbits.to_bytes(4, "little") + bytes(8) + blob
    return (
        minbits.to_bytes(4, "little")
        + (minval & full).to_bytes(8, "little")
        + _pack_msb(resid, minbits)
    )


def _defilter(fid: int, cd: tuple[int, ...], raw: bytes) -> bytes:
    if fid == 1:  # deflate
        return zlib.decompress(raw)
    if fid == 2:  # shuffle: byte-transpose with element size cd[0]
        es = cd[0] if cd else 1
        if es <= 1 or len(raw) % es:
            return raw
        a = np.frombuffer(raw, dtype=np.uint8).reshape(es, -1)
        return a.T.tobytes()
    if fid == 3:  # fletcher32: payload + 4 checksum bytes
        return raw[:-4]
    if fid == 5:  # nbit (VERDICT r7 task 4)
        return _nbit_decode(cd, raw)
    if fid == 6:  # scaleoffset (VERDICT r7 task 4)
        return _scaleoffset_decode(cd, raw)
    raise ValueError(f"unsupported HDF5 filter id {fid}")


# --------------------------------------------------------------------------
# netCDF-4 adapter (the ClassicNetCDF twin for HDF5 containers)
# --------------------------------------------------------------------------


class HDF5NetCDF:
    """netCDF-4 view of an HDF5 payload: ``variables`` excludes pure
    dimension-scale stubs (the public "not a netCDF variable" NAME
    marker); ``masked`` applies the _FillValue/missing_value -> NaN
    convention exactly like :class:`ClassicNetCDF`."""

    def __init__(self, payload: bytes):
        self._f = HDF5File(payload)
        self.attrs = self._f.root_attrs
        self.variables = {
            name: ds
            for name, ds in self._f.datasets.items()
            if not str(ds.attrs.get("NAME", "")).startswith(_DIM_SCALE_NAME)
        }

    def shape(self, name: str) -> tuple[int, ...]:
        return self.variables[name].shape

    def raw(self, name: str) -> np.ndarray:
        return self._f.read(name)

    def masked(self, name: str) -> np.ndarray:
        ds = self.variables[name]
        arr = self.raw(name)
        if ds.dtype.kind not in "iuf":
            raise TypeError("masked() is for numeric variables")
        fill = ds.attrs.get("_FillValue", ds.attrs.get("missing_value"))
        if fill is None:
            fill = NC4_DEFAULT_FILL[(ds.dtype.kind, ds.dtype.itemsize)]
        fill_arr = np.asarray(fill).astype(arr.dtype)
        out = arr.astype(np.float64)
        mask = arr == fill_arr
        if ds.dtype.kind == "f":
            mask |= np.isnan(out)
        out[mask] = np.nan
        return out


# --------------------------------------------------------------------------
# writer (fixtures for both container generations)
# --------------------------------------------------------------------------

_UNDEF8 = b"\xff" * 8


def _np_dtype_msg(dt: np.dtype) -> bytes:
    dt = dt.newbyteorder("<")
    if dt.kind in "iu":
        cv = 0x10  # class 0 (fixed-point), version 1
        bits = 0x08 if dt.kind == "i" else 0x00
        props = struct.pack("<HH", 0, dt.itemsize * 8)
    elif dt.kind == "f":
        cv = 0x11  # class 1 (float), version 1
        # LE order (bit0=0), implied-MSB mantissa norm (bits 4-5 = 2),
        # sign bit location in bits 8-15 — the IEEE layout h5py writes
        bits = (2 << 4) | ((31 if dt.itemsize == 4 else 63) << 8)
        if dt.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    elif dt.kind == "S":
        cv = 0x13  # class 3 (string), version 1
        bits = 0
        props = b""
    else:
        raise ValueError(f"unsupported fixture dtype {dt}")
    return (
        bytes([cv, bits & 0xFF, (bits >> 8) & 0xFF, (bits >> 16) & 0xFF])
        + struct.pack("<I", dt.itemsize)
        + props
    )


def _dataspace_msg(shape: tuple[int, ...]) -> bytes:
    body = bytes([1, len(shape), 0]) + b"\x00" * 5
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _fill_msg(fill: bytes | None) -> bytes:
    if fill is None:
        return bytes([2, 2, 0, 0])
    return bytes([2, 2, 0, 1]) + struct.pack("<I", len(fill)) + fill


def _attr_msg_v1(name: str, value) -> bytes:
    if isinstance(value, str):
        raw = value.encode()
        dt = np.dtype(f"S{len(raw)}")
        data = raw
        shape: tuple[int, ...] = ()
    else:
        a = np.atleast_1d(np.asarray(value))
        dt = a.dtype.newbyteorder("<")
        data = a.astype(dt).tobytes()
        shape = () if np.asarray(value).ndim == 0 else a.shape
    nm = name.encode() + b"\x00"
    dtm = _np_dtype_msg(dt)
    dsm = _dataspace_msg(shape)

    def pad8(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 8)

    return (
        bytes([1, 0])
        + struct.pack("<HHH", len(nm), len(dtm), len(dsm))
        + pad8(nm)
        + pad8(dtm)
        + pad8(dsm)
        + data
    )


def _v1_header(messages: list[tuple[int, bytes]]) -> bytes:
    blocks = []
    for mtype, body in messages:
        body = body + b"\x00" * (-len(body) % 8)
        blocks.append(
            struct.pack("<HHB3x", mtype, len(body), 0) + body
        )
    msgs = b"".join(blocks)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(msgs)) + msgs


def _v2_header(messages: list[tuple[int, bytes]]) -> bytes:
    blocks = []
    for mtype, body in messages:
        blocks.append(struct.pack("<BHB", mtype, len(body), 0) + body)
    msgs = b"".join(blocks)
    head = b"OHDR" + bytes([2, 0x02]) + struct.pack("<I", len(msgs))
    return head + msgs + struct.pack("<I", lookup3(head + msgs))


def _chunk_grid(shape, cshape):
    grids = [range(0, s, c) for s, c in zip(shape, cshape)]
    out = [()]
    for g in grids:
        out = [t + (v,) for t in out for v in g]
    return out


def _attr_msg_v1_vlen(name: str, ln: int, gaddr: int, idx: int) -> bytes:
    """Attribute message whose value is a VARIABLE-LENGTH string — the
    layout netCDF4's NC_STRING attributes use: datatype class 9
    (vlen/string), data = (length, global-heap address, object index)."""
    nm = name.encode() + b"\x00"
    # class 9 v1, bits: vlen-type=string(1); base type: 1-byte string
    base = bytes([0x13, 0, 0, 0]) + struct.pack("<I", 1)
    dtm = (
        bytes([0x19, 0x01, 0, 0]) + struct.pack("<I", 16) + base
    )
    dsm = _dataspace_msg(())

    def pad8(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 8)

    data = struct.pack("<IQI", ln, gaddr, idx)
    return (
        bytes([1, 0])
        + struct.pack("<HHH", len(nm), len(dtm), len(dsm))
        + pad8(nm)
        + pad8(dtm)
        + pad8(dsm)
        + data
    )


def _attr_msg_v1_dimlist(gaddr: int, entries: list[int]) -> bytes:
    """DIMENSION_LIST attribute — netCDF-4's dimension mapping: a
    vlen SEQUENCE (class 9, type 0) of OBJECT REFERENCES (class 7),
    one element per dimension, each holding one reference into the
    global heap (the heap object is the dimension-scale dataset's
    8-byte header address)."""
    nm = b"DIMENSION_LIST\x00"
    base = bytes([0x17, 0, 0, 0]) + struct.pack("<I", 8)
    dtm = bytes([0x19, 0x00, 0, 0]) + struct.pack("<I", 16) + base
    dsm = _dataspace_msg((len(entries),))

    def pad8(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 8)

    data = b"".join(
        struct.pack("<IQI", 1, gaddr, idx) for idx in entries
    )
    return (
        bytes([1, 0])
        + struct.pack("<HHH", len(nm), len(dtm), len(dsm))
        + pad8(nm)
        + pad8(dtm)
        + pad8(dsm)
        + data
    )


def _attr_msg_v3(name: str, value, vlen_ref=None) -> bytes:
    """Version-3 attribute message (the layout 1.8+ writers use, and
    what dense attribute storage stores in the fractal heap).
    ``vlen_ref=(ln, gaddr, idx)`` emits a variable-length-string value
    through the global heap instead of a fixed string."""
    nm = name.encode() + b"\x00"
    if vlen_ref is not None:
        ln, gaddr, idx = vlen_ref
        base = bytes([0x13, 0, 0, 0]) + struct.pack("<I", 1)
        dtm = bytes([0x19, 0x01, 0, 0]) + struct.pack("<I", 16) + base
        dsm = _dataspace_msg(())
        data = struct.pack("<IQI", ln, gaddr, idx)
    else:
        if isinstance(value, str):
            raw = value.encode()
            dt = np.dtype(f"S{len(raw)}")
            data = raw
            shape: tuple[int, ...] = ()
        else:
            a = np.atleast_1d(np.asarray(value))
            dt = a.dtype.newbyteorder("<")
            data = a.astype(dt).tobytes()
            shape = () if np.asarray(value).ndim == 0 else a.shape
        dtm = _np_dtype_msg(dt)
        dsm = _dataspace_msg(shape)
    return (
        bytes([3, 0])
        + struct.pack("<HHH", len(nm), len(dtm), len(dsm))
        + bytes([0])  # name character-set encoding: ASCII
        + nm
        + dtm
        + dsm
        + data
    )


# dense-storage heap geometry (the values H5A/H5G configure): width 4,
# max direct block 64 KiB, 32-bit heap offsets -> 8-byte attribute heap
# IDs (offset 4 + length 3) and 7-byte link heap IDs (offset 4 + len 2)
_FH_WIDTH = 4
_FH_MAX_DIRECT = 65536
_FH_MAX_HEAP_BITS = 32


def _fheap_pack(
    sizes: list[int], start_block: int, hdr_size: int,
    max_direct: int = _FH_MAX_DIRECT,
) -> tuple[list[dict], list[int], int, dict]:
    """First-fit packing of object sizes into doubling-table direct
    blocks, INCLUDING rows past the maximum-direct row, which nest
    under child indirect blocks (each spanning what a direct block of
    that row would, with its own doubling table restarting at the
    start size).  Returns ``(blocks, heap_offsets, root_rows,
    children)``: ``blocks`` = dicts with ``key`` (stable tag suffix),
    ``boff``, ``size``, ``row`` (root-table row or None), ``parent``
    (None or the (row, slot) of the child indirect block);
    ``children`` maps (row, slot) -> {"rows", "boff", "slots": [block
    key or None per slot]}.  Every block's first ``hdr_size`` bytes
    belong to its header (heap offsets include headers, like the real
    format)."""

    def row_size(r: int) -> int:
        return start_block if r < 2 else start_block << (r - 1)

    max_rows = max_direct.bit_length() - start_block.bit_length() + 2

    def slot_stream():
        """(parent, root_row, key, size) for every direct-block slot in
        table order; parent is None for root-table slots."""
        r = 0
        while True:
            if r < max_rows:
                for w in range(_FH_WIDTH):
                    yield None, r, f"{r * _FH_WIDTH + w}", row_size(r)
            else:
                span = row_size(r)
                child_rows = (
                    span // (_FH_WIDTH * start_block)
                ).bit_length()
                if child_rows > max_rows:
                    raise ValueError(
                        "fixture attributes exceed the two-level heap "
                        "the writer emits"
                    )
                for w in range(_FH_WIDTH):
                    for cr in range(child_rows):
                        for cw in range(_FH_WIDTH):
                            yield (
                                (r, w),
                                r,
                                f"c{r}.{w}.{cr * _FH_WIDTH + cw}",
                                row_size(cr),
                            )
            r += 1

    blocks: list[dict] = []
    offsets: list[int] = []
    children: dict = {}
    stream = slot_stream()
    boff = 0
    pos = 0

    def open_next() -> None:
        nonlocal boff, pos
        parent, r, key, size = next(stream)
        if parent is not None and parent not in children:
            span = row_size(parent[0])
            children[parent] = {
                "rows": (span // (_FH_WIDTH * start_block)).bit_length(),
                "boff": boff,
                "slots": {},
            }
        blocks.append(
            {"key": key, "boff": boff, "size": size, "row": r,
             "parent": parent}
        )
        if parent is not None:
            children[parent]["slots"][key] = True
        boff += size
        pos = hdr_size

    open_next()
    for s in sizes:
        if s + hdr_size > max_direct:
            raise ValueError("object larger than the maximum direct block")
        # advance to the first block with room; rows double, so any
        # object <= max_direct - hdr_size fits eventually
        while pos + s > blocks[-1]["size"]:
            open_next()
        offsets.append(blocks[-1]["boff"] + pos)
        pos += s
    root_rows = 0 if len(blocks) == 1 else blocks[-1]["row"] + 1
    return blocks, offsets, root_rows, children


def _fheap_id(off: int, length: int, id_len: int) -> bytes:
    off_size = _FH_MAX_HEAP_BITS // 8
    len_size = id_len - 1 - off_size
    return (
        bytes([0])  # version 0, type 0 = managed
        + off.to_bytes(off_size, "little")
        + length.to_bytes(len_size, "little")
    )


# version-1 filter-pipeline body declaring a single deflate(6) filter —
# what a filtered fixture heap carries as its I/O filter information
_HEAP_FILTER_INFO = (
    bytes([1, 1]) + b"\x00" * 6
    + struct.pack("<HHHH", 1, 0, 1, 1)
    + struct.pack("<I", 6)
    + b"\x00" * 4  # ver-1 pad for odd client-data count
)


def _frhp(
    a, tag: str, id_len: int, start_block: int,
    total_space: int, n_objs: int, root_rows: int,
    max_direct: int = _FH_MAX_DIRECT,
    filter_info: bytes = b"",
    root_filtered_size: int | None = None,
    max_managed_obj: int | None = None,
    huge: tuple[str, int, int] | None = None,
) -> bytes:
    """Fractal heap header; ``root_rows=0`` means the root block is the
    single direct block, else the FHIB with that many rows.  A filtered
    heap carries its pipeline in ``filter_info`` (and, when the root is
    a direct block, that block's stored size + filter mask).  ``huge``
    = (btree tag, count, total size) when objects above the
    max-managed threshold live behind the huge-object v2 B-tree."""
    n_huge, huge_size = (huge[1], huge[2]) if huge else (0, 0)
    body = b"FRHP" + bytes([0])
    body += struct.pack("<HHB", id_len, len(filter_info), 0)
    body += struct.pack("<I", max_managed_obj or max_direct)
    body += struct.pack("<Q", n_huge + 1)  # next huge id
    body += struct.pack("<Q", a(huge[0])) if huge else _UNDEF8
    body += struct.pack("<Q", 0) + _UNDEF8  # free space, fs manager
    body += struct.pack("<QQQQ", total_space, total_space, total_space, n_objs)
    body += struct.pack("<QQQQ", huge_size, n_huge, 0, 0)
    body += struct.pack("<H", _FH_WIDTH)
    body += struct.pack("<QQ", start_block, max_direct)
    body += struct.pack("<HH", _FH_MAX_HEAP_BITS, 1)  # max bits, start rows
    root_tag = f"fhdb:{tag}:0" if root_rows == 0 else f"fhib:{tag}"
    body += struct.pack("<Q", a(root_tag))
    body += struct.pack("<H", root_rows)
    if filter_info:
        if root_rows == 0:
            body += struct.pack("<QI", root_filtered_size or 0, 0)
        body += filter_info
    return body + struct.pack("<I", lookup3(body))


def _btlf(btype: int, records: list[bytes]) -> bytes:
    body = b"BTLF" + bytes([0, btype]) + b"".join(records)
    return body + struct.pack("<I", lookup3(body))


def _put_btree_v2(
    put, a, tag: str, btype: int, rec_size: int,
    records: list[bytes], node_size: int,
) -> None:
    """Emit a v2 B-tree (header + nodes) for ``records`` (already in
    key order) — MULTI-LEVEL when they exceed one leaf: internal BTIN
    nodes hold separator records between children, with child-pointer
    field widths from the same capacity arithmetic the reader uses
    (``_btree_v2_sizes``)."""
    n = len(records)
    depth = 0
    caps, tots = _btree_v2_sizes(node_size, rec_size, 8, 0)
    while n > tots[depth]:
        depth += 1
        caps, tots = _btree_v2_sizes(node_size, rec_size, 8, depth)
    counter = [0]

    def build(recs: list[bytes], d: int) -> tuple[str, int, int]:
        """Write the subtree for ``recs`` at depth ``d``; returns
        (node tag, record count in node, total records in subtree)."""
        i = counter[0]
        counter[0] += 1
        ntag = f"bt2n:{tag}:{d}:{i}"
        if d == 0:
            put(ntag, _btlf(btype, recs))
            return ntag, len(recs), len(recs)
        k = -(-(len(recs) + 1) // (tots[d - 1] + 1))  # children needed
        base, rem = divmod(len(recs) - (k - 1), k)
        kids = []
        seps = []
        pos = 0
        for ci in range(k):
            take = base + (1 if ci < rem else 0)
            kids.append(build(recs[pos : pos + take], d - 1))
            pos += take
            if ci < k - 1:
                seps.append(recs[pos])
                pos += 1
        body = b"BTIN" + bytes([0, btype]) + b"".join(seps)
        n_size = _enc_size(caps[d - 1])
        tot_size = _enc_size(tots[d - 1]) if d > 1 else 0
        for ktag, knrec, ktotal in kids:
            body += struct.pack("<Q", a(ktag))
            body += knrec.to_bytes(n_size, "little")
            if d > 1:
                body += ktotal.to_bytes(tot_size, "little")
        put(ntag, body + struct.pack("<I", lookup3(body)))
        total = len(seps) + sum(kt for _t, _n, kt in kids)
        return ntag, len(seps), total

    root_tag, root_nrec, total = build(records, depth)
    body = b"BTHD" + bytes([0, btype])
    body += struct.pack("<IHH", node_size, rec_size, depth)
    body += bytes([100, 40])  # split / merge percents
    body += struct.pack("<Q", a(root_tag))
    body += struct.pack("<HQ", root_nrec, total)
    put(f"bthd:{tag}", body + struct.pack("<I", lookup3(body)))


def write_hdf5_netcdf4(
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]],
    gatts: dict | None = None,
    style: str = "earliest",
    layout: str = "contiguous",
    chunks: tuple[int, ...] | None = None,
    compress: str | None = None,
    vlen_strings: bool = False,
    dense_attrs: bool = False,
    dense_links: bool = False,
    dense_block_size: int = 512,
    heap_filter: bool = False,
    heap_max_direct: int | None = None,
    btree_node_size: int = 2048,
    huge_threshold: int | None = None,
    nbit_precision: int | None = None,
    nbit_offset: int = 0,
    so_factor: int = 0,
    dimension_list: bool = False,
) -> bytes:
    """Minimal netCDF-4/HDF5 fixture writer (root group only).

    ``style="earliest"`` = superblock v0, v1 object headers,
    symbol-table group (the netCDF4 library's default output);
    ``style="latest"`` = superblock v3, OHDR v2, link-message group.
    ``layout`` is ``contiguous`` or ``chunked`` (``chunks`` defaults to
    ceil(shape/2) so edge-partial chunks are exercised); ``compress``
    is a ``+``-chain over {``deflate``, ``shuffle``, ``nbit``,
    ``scaleoffset``} applied in order (chunked only) — e.g.
    ``"shuffle+deflate"``, ``"nbit"``, ``"scaleoffset+deflate"``;
    ``nbit_precision``/``nbit_offset`` set the n-bit window (default:
    full width minus the top bit), ``so_factor`` fixes the
    scale-offset minbits (0 = per-chunk minimum span).
    Dimension entries become netCDF-4 dimension-scale stub datasets so
    readers must filter them out, exactly like real files.
    ``vlen_strings=True`` stores every string attribute as a
    VARIABLE-LENGTH string through a global heap collection (netCDF4's
    NC_STRING layout) instead of a fixed-length string — exercises the
    reader's GCOL path.

    ``dense_attrs=True`` stores every object's attributes DENSELY — v3
    attribute messages in a fractal heap, name-indexed by a v2 B-tree,
    referenced from an attribute-info (0x0015) message — the storage
    real 1.8+ ("latest") writers switch to above the max-compact
    threshold; attribute-rich real scenes arrive this way.
    ``dense_links=True`` does the same for the root group's links
    (link-info 0x0002 + fractal heap + v2 B-tree) instead of the
    symbol-table / compact-link-message group.  ``dense_block_size``
    is the heap's starting direct-block size: small values force a
    multi-block heap under a root indirect block, exercising the
    reader's FHIB path with real bytes.

    Round-7 structure knobs (each produces real bytes for a reader
    path attribute-heavy scenes hit): ``heap_filter=True`` deflates
    every heap direct block (a FILTERED fractal heap — pipeline in the
    header, stored sizes beside each block reference);
    ``heap_max_direct`` caps the direct-block doubling so rows past
    the cap nest under CHILD indirect blocks (two-level FHIB);
    ``btree_node_size`` shrinks the v2 B-tree node so the dense-name
    index splits into a MULTI-LEVEL tree (internal BTIN nodes);
    ``huge_threshold`` lowers the max-managed-object size so larger
    attribute messages become HUGE objects (stored at their own file
    address, mapped through the heap's huge-object v2 B-tree, type-1
    records — the storage a giant ``history`` string attribute lands
    in).
    """
    if style not in ("earliest", "latest"):
        raise ValueError("style must be 'earliest' or 'latest'")
    if layout not in ("contiguous", "chunked"):
        raise ValueError("layout must be 'contiguous' or 'chunked'")
    if compress and layout != "chunked":
        raise ValueError("compression requires chunked layout")

    # dimension-scale stubs, then data variables (netCDF-4 convention)
    objects: list[tuple[str, list[tuple[int, bytes]], dict]] = []
    seg_payloads: dict[str, bytes] = {}
    vstrings: list[bytes] = []  # global-heap payloads, 1-based index
    ref_dims: list[str] = []  # dimension refs appended AFTER vstrings
    if dimension_list and dense_attrs:
        raise ValueError(
            "dimension_list is supported on the compact-attribute path"
        )

    def dataset_msgs(name, arr, attrs, is_dim):
        arr = np.ascontiguousarray(arr)
        dt = arr.dtype.newbyteorder("<")
        data = arr.astype(dt).tobytes()
        msgs = [
            (0x0001, _dataspace_msg(arr.shape)),
            (0x0003, _np_dtype_msg(dt)),
            (0x0005, _fill_msg(None)),
        ]
        use_chunked = layout == "chunked" and not is_dim
        meta = {"shape": arr.shape, "itemsize": dt.itemsize}
        if use_chunked:
            cshape = chunks or tuple(max(1, -(-s // 2)) for s in arr.shape)
            meta["cshape"] = cshape
            filters = []
            if compress:
                nelm = int(np.prod(cshape))
                toks = compress.split("+")
                if toks == ["shuffle"]:
                    raise ValueError("shuffle must be chained with deflate")
                for tok in toks:
                    if tok == "shuffle":
                        filters.append((2, (dt.itemsize,)))
                    elif tok == "deflate":
                        filters.append((1, (6,)))
                    elif tok == "nbit":
                        if dt.kind not in "iu":
                            raise ValueError("nbit: integer datasets only")
                        prec = nbit_precision or 8 * dt.itemsize - 1
                        filters.append(
                            (5, (8, 1, nelm, 1, dt.itemsize, 0, prec,
                                 nbit_offset))
                        )
                    elif tok == "scaleoffset":
                        if dt.kind not in "iu":
                            raise ValueError(
                                "scaleoffset: integer datasets only"
                            )
                        sign = 1 if dt.kind == "i" else 0
                        filters.append(
                            (6, (0, so_factor, nelm, 0, dt.itemsize,
                                 sign, 0, 0) + (0,) * 12)
                        )
                    else:
                        raise ValueError(f"unknown compress token {tok!r}")
            meta["filters"] = filters
            if filters:
                fb = bytes([1, len(filters)]) + b"\x00" * 6
                for fid, cd in filters:
                    nm = b""
                    fb += struct.pack("<HHHH", fid, len(nm), 1, len(cd))
                    for v in cd:
                        fb += struct.pack("<I", v)
                    if len(cd) % 2:
                        fb += b"\x00" * 4
                msgs.append((0x000B, fb))
            # chunk payloads, clipped at edges then zero-padded to full
            # chunks (HDF5 stores whole chunks)
            chunk_blobs = []
            for coords in _chunk_grid(arr.shape, cshape):
                sel = tuple(
                    slice(c, min(c + cs, s))
                    for c, cs, s in zip(coords, cshape, arr.shape)
                )
                block = np.zeros(cshape, dtype=dt)
                piece = arr[sel].astype(dt)
                block[tuple(slice(0, p) for p in piece.shape)] = piece
                blob = block.tobytes()
                for fid, cd in filters:
                    if fid == 2:
                        a = np.frombuffer(blob, np.uint8).reshape(
                            -1, dt.itemsize
                        )
                        blob = a.T.tobytes()
                    elif fid == 1:
                        blob = zlib.compress(blob, 6)
                    elif fid == 5:
                        blob = _nbit_encode(cd, blob)
                    elif fid == 6:
                        blob = _scaleoffset_encode(cd, blob)
                chunk_blobs.append((coords, blob))
            meta["chunk_blobs"] = chunk_blobs
        else:
            seg_payloads[name] = data
        if dense_attrs:
            items = []
            for k, v in attrs.items():
                if vlen_strings and isinstance(v, str):
                    vstrings.append(v.encode())
                    items.append(("vlen", k, len(vstrings)))
                else:
                    items.append(("plain", k, v))
            if items:
                msgs.append(("attrinfo", name))
                meta["dense_attr_items"] = items
        else:
            for k, v in attrs.items():
                if vlen_strings and isinstance(v, str):
                    vstrings.append(v.encode())
                    msgs.append(("vlen", (k, len(vstrings))))
                else:
                    msgs.append((0x000C, _attr_msg_v1(k, v)))
        return msgs, meta

    for dname, dsize in dims.items():
        stub = np.zeros(dsize, dtype=np.float32)
        msgs, meta = dataset_msgs(
            dname,
            stub,
            {
                "CLASS": "DIMENSION_SCALE",
                "NAME": f"{_DIM_SCALE_NAME} ({dsize}).",
            },
            is_dim=True,
        )
        objects.append((dname, msgs, meta))
    for vname, (_vdims, arr, attrs) in variables.items():
        msgs, meta = dataset_msgs(vname, np.asarray(arr), attrs, is_dim=False)
        if dimension_list:
            # marker carries (dim names, their 0-based ref_dims slots);
            # the final global-heap index is len(vstrings)+1+slot, fixed
            # once all string attrs are collected (resolve() computes it)
            slots = []
            for dname in _vdims:
                if dname not in dims:
                    raise ValueError(f"unknown dimension {dname!r}")
                slots.append(len(ref_dims))
                ref_dims.append(dname)
            msgs.append(("dimlist", (tuple(_vdims), tuple(slots))))
        objects.append((vname, msgs, meta))

    gat_markers: list = []
    root_attr_items: list = []
    for k, v in (gatts or {}).items():
        if dense_attrs:
            if vlen_strings and isinstance(v, str):
                vstrings.append(v.encode())
                root_attr_items.append(("vlen", k, len(vstrings)))
            else:
                root_attr_items.append(("plain", k, v))
        elif vlen_strings and isinstance(v, str):
            vstrings.append(v.encode())
            gat_markers.append(("vlen", (k, len(vstrings))))
        else:
            gat_markers.append((0x000C, _attr_msg_v1(k, v)))
    if root_attr_items:
        gat_markers.append(("attrinfo", "/"))

    # ---- lay the file out with a running allocator, two passes so the
    # layout/btree/heap messages can carry real addresses
    def build(addrs: dict) -> tuple[bytes, dict]:
        out_addrs: dict = {}
        parts: list[bytes] = []
        off = 0

        def put(tag: str, blob: bytes) -> int:
            nonlocal off
            out_addrs[tag] = off
            parts.append(blob)
            off += len(blob)
            return out_addrs[tag]

        def a(tag: str) -> int:
            return addrs.get(tag, 0)

        def resolve(mlist):
            out = []
            for m in mlist:
                if m[0] == "vlen":
                    k, idx = m[1]
                    out.append(
                        (
                            0x000C,
                            _attr_msg_v1_vlen(
                                k,
                                len(vstrings[idx - 1]),
                                a("gheap:/"),
                                idx,
                            ),
                        )
                    )
                elif m[0] == "dimlist":
                    vdims, slots = m[1]
                    out.append(
                        (
                            0x000C,
                            _attr_msg_v1_dimlist(
                                a("gheap:/"),
                                [len(vstrings) + 1 + s for s in slots],
                            ),
                        )
                    )
                elif m[0] == "attrinfo":
                    tag = f"a:{m[1]}"
                    out.append(
                        (
                            0x0015,
                            bytes([0, 0])
                            + struct.pack(
                                "<QQ", a(f"frhp:{tag}"), a(f"bthd:{tag}")
                            ),
                        )
                    )
                elif m[0] == "linkinfo":
                    tag = f"l:{m[1]}"
                    out.append(
                        (
                            0x0002,
                            bytes([0, 0])
                            + struct.pack(
                                "<QQ", a(f"frhp:{tag}"), a(f"bthd:{tag}")
                            ),
                        )
                    )
                else:
                    out.append(m)
            return out

        def attr_bodies(items):
            out = []
            for it in items:
                if it[0] == "vlen":
                    _k, k, idx = it
                    out.append(
                        (
                            k,
                            _attr_msg_v3(
                                k,
                                None,
                                vlen_ref=(
                                    len(vstrings[idx - 1]),
                                    a("gheap:/"),
                                    idx,
                                ),
                            ),
                        )
                    )
                else:
                    _k, k, v = it
                    out.append((k, _attr_msg_v3(k, v)))
            return out

        def put_dense(tag: str, bodies, btype: int) -> None:
            """Fractal heap (+ FHIB when multi-block, nested child
            FHIBs past the max-direct row, deflated direct blocks when
            ``heap_filter``) + v2 B-tree name index (multi-level when
            the records outgrow ``btree_node_size``) for one object's
            dense attributes (btype 8) or the root group's dense links
            (btype 5)."""
            id_len = 8 if btype == 8 else 7
            hdr_size = 5 + 8 + _FH_MAX_HEAP_BITS // 8  # no checksum
            max_direct = heap_max_direct or _FH_MAX_DIRECT
            threshold = huge_threshold or max_direct
            # objects above the max-managed threshold become HUGE:
            # stored at their own file location, mapped by the heap's
            # huge-object v2 B-tree (type-1 records), referenced by a
            # type-1 heap id carrying the B-tree ID
            huge_ids: dict[int, bytes] = {}  # body index -> heap id
            huge_recs: list[bytes] = []
            for bi_, (_nm, body) in enumerate(bodies):
                if len(body) > threshold:
                    bid = len(huge_recs) + 1
                    if heap_filter:
                        # filtered heap: huge objects are stored
                        # THROUGH the pipeline and mapped by type-2
                        # records (addr, filtered len, mask, mem size)
                        stored_body = zlib.compress(body, 6)
                        put(f"huge:{tag}:{bid}", stored_body)
                        huge_recs.append(
                            struct.pack(
                                "<QQIQQ",
                                a(f"huge:{tag}:{bid}"),
                                len(stored_body),
                                0,
                                len(body),
                                bid,
                            )
                        )
                    else:
                        put(f"huge:{tag}:{bid}", body)
                        huge_recs.append(
                            struct.pack(
                                "<QQQ",
                                a(f"huge:{tag}:{bid}"),
                                len(body),
                                bid,
                            )
                        )
                    huge_ids[bi_] = bytes([0x10]) + bid.to_bytes(
                        id_len - 1, "little"
                    )
            managed = [
                (bi_, nb) for bi_, nb in enumerate(bodies)
                if bi_ not in huge_ids
            ]
            blocks, offs, root_rows, children = _fheap_pack(
                [len(body) for _bi, (_n, body) in managed],
                dense_block_size, hdr_size, max_direct,
            )
            managed_offs = {
                bi_: off for (bi_, _nb), off in zip(managed, offs)
            }
            recs = []
            for corder, (nm, body) in enumerate(bodies):
                hid = (
                    huge_ids[corder]
                    if corder in huge_ids
                    else _fheap_id(
                        managed_offs[corder], len(body), id_len
                    )
                )
                h = lookup3(nm.encode())
                if btype == 8:
                    rec = (
                        hid
                        + bytes([0])
                        + struct.pack("<II", corder, h)
                    )
                else:
                    rec = struct.pack("<I", h) + hid
                recs.append((h, rec))
            records = [r for _h, r in sorted(recs, key=lambda t: t[0])]

            # direct-block images (and their stored, possibly deflated,
            # bytes) first — the header needs the root stored size
            stored_sizes: dict[str, int] = {}
            block_blobs: dict[str, bytes] = {}
            for blk in blocks:
                size, boff = blk["size"], blk["boff"]
                blob = bytearray(size)
                head = (
                    b"FHDB"
                    + bytes([0])
                    + struct.pack("<Q", a(f"frhp:{tag}"))
                    + boff.to_bytes(_FH_MAX_HEAP_BITS // 8, "little")
                )
                blob[: len(head)] = head
                for (_bi, (nm, body)), off in zip(managed, offs):
                    if boff <= off < boff + size:
                        p0 = off - boff
                        blob[p0 : p0 + len(body)] = body
                stored = bytes(blob)
                if heap_filter:
                    stored = zlib.compress(stored, 6)
                stored_sizes[blk["key"]] = len(stored)
                block_blobs[blk["key"]] = stored
            total_space = blocks[-1]["boff"] + blocks[-1]["size"]
            if huge_recs:
                _put_btree_v2(
                    put, a, f"h:{tag}",
                    2 if heap_filter else 1,
                    36 if heap_filter else 24,
                    huge_recs, btree_node_size,
                )
            put(
                f"frhp:{tag}",
                _frhp(
                    a, tag, id_len, dense_block_size, total_space,
                    len(managed), root_rows, max_direct,
                    filter_info=_HEAP_FILTER_INFO if heap_filter else b"",
                    root_filtered_size=(
                        stored_sizes.get(blocks[0]["key"])
                        if root_rows == 0
                        else None
                    ),
                    max_managed_obj=threshold,
                    huge=(
                        (
                            f"bthd:h:{tag}",
                            len(huge_recs),
                            sum(
                                len(body)
                                for bi_, (_n, body) in enumerate(bodies)
                                if bi_ in huge_ids
                            ),
                        )
                        if huge_recs
                        else None
                    ),
                ),
            )

            def direct_entry(key: str | None) -> bytes:
                e = (
                    struct.pack("<Q", a(f"fhdb:{tag}:{key}"))
                    if key is not None
                    else _UNDEF8
                )
                if heap_filter:
                    e += struct.pack(
                        "<QI", stored_sizes.get(key, 0), 0
                    )
                return e

            if root_rows:
                max_rows = (
                    max_direct.bit_length()
                    - dense_block_size.bit_length() + 2
                )
                root_keys = {
                    b["key"]: True for b in blocks if b["parent"] is None
                }
                fhib = (
                    b"FHIB"
                    + bytes([0])
                    + struct.pack("<Q", a(f"frhp:{tag}"))
                    + (0).to_bytes(_FH_MAX_HEAP_BITS // 8, "little")
                )
                for r in range(root_rows):
                    for w in range(_FH_WIDTH):
                        if r < max_rows:
                            key = f"{r * _FH_WIDTH + w}"
                            fhib += direct_entry(
                                key if key in root_keys else None
                            )
                        elif (r, w) in children:
                            fhib += struct.pack(
                                "<Q", a(f"fhib:{tag}:c{r}.{w}")
                            )
                        else:
                            fhib += _UNDEF8
                fhib += struct.pack("<I", lookup3(fhib))
                put(f"fhib:{tag}", fhib)
                for (r, w), ch in children.items():
                    cb = (
                        b"FHIB"
                        + bytes([0])
                        + struct.pack("<Q", a(f"frhp:{tag}"))
                        + ch["boff"].to_bytes(
                            _FH_MAX_HEAP_BITS // 8, "little"
                        )
                    )
                    for cr in range(ch["rows"]):
                        for cw in range(_FH_WIDTH):
                            key = f"c{r}.{w}.{cr * _FH_WIDTH + cw}"
                            cb += direct_entry(
                                key if key in ch["slots"] else None
                            )
                    cb += struct.pack("<I", lookup3(cb))
                    put(f"fhib:{tag}:c{r}.{w}", cb)
            for blk in blocks:
                put(f"fhdb:{tag}:{blk['key']}", block_blobs[blk["key"]])
            rec_size = 17 if btype == 8 else 11
            _put_btree_v2(
                put, a, tag, btype, rec_size, records, btree_node_size
            )

        heap_payloads = list(vstrings) + [
            # each DIMENSION_LIST element references one dim-scale
            # dataset: the heap object is its 8-byte header address
            struct.pack("<Q", a(f"oh:{d}"))
            for d in ref_dims
        ]
        if heap_payloads:
            gh = b""
            for i, blob in enumerate(heap_payloads, start=1):
                gh += struct.pack("<HH4x", i, 1) + struct.pack(
                    "<Q", len(blob)
                )
                gh += blob + b"\x00" * (-len(blob) % 8)
            gcol = b"GCOL" + bytes([1]) + b"\x00" * 3
            gcol += struct.pack("<Q", 8 + 8 + len(gh)) + gh
            put("gheap:/", gcol)

        # per-dataset layout message resolved against current addrs
        headers: dict[str, bytes] = {}
        for name, msgs, meta in objects:
            mm = resolve(list(msgs))
            if "chunk_blobs" in meta:
                cdims = tuple(meta["cshape"]) + (meta["itemsize"],)
                body = bytes([3, 2, len(cdims)]) + struct.pack(
                    "<Q", a(f"btree:{name}")
                )
                for c in cdims:
                    body += struct.pack("<I", c)
                mm.insert(2, (0x0008, body))
            else:
                data = seg_payloads[name]
                body = bytes([3, 1]) + struct.pack(
                    "<QQ", a(f"data:{name}"), len(data)
                )
                mm.insert(2, (0x0008, body))
            headers[name] = (
                _v1_header(mm) if style == "earliest" else _v2_header(mm)
            )

        gat = resolve(gat_markers)
        names = [name for name, _m, _x in objects]

        if dense_links:
            root_msgs = resolve([("linkinfo", "/")]) + gat
            put(
                "oh:/",
                _v1_header(root_msgs)
                if style == "earliest"
                else _v2_header(root_msgs),
            )
        elif style == "earliest":
            # heap: 8 reserved bytes then NUL-terminated names, 8-aligned
            heap_offsets, hoff, hblob = {}, 8, b"\x00" * 8
            for n in names:
                raw = n.encode() + b"\x00"
                raw += b"\x00" * (-len(raw) % 8)
                heap_offsets[n] = hoff
                hblob += raw
                hoff += len(raw)
            root_msgs = [
                (
                    0x0011,
                    struct.pack("<QQ", a("btree:/"), a("heap:/")),
                )
            ] + gat
            put("oh:/", _v1_header(root_msgs))
            put(
                "btree:/",
                b"TREE"
                + struct.pack("<BBH", 0, 0, 1)
                + _UNDEF8 * 2
                + struct.pack("<Q", 0)
                + struct.pack("<Q", a("snod:/"))
                + struct.pack(
                    "<Q", heap_offsets[max(names)] if names else 0
                ),
            )
            put(
                "heap:/",
                b"HEAP"
                + bytes([0])
                + b"\x00" * 3
                + struct.pack("<Q", len(hblob))
                + _UNDEF8  # empty free list
                + struct.pack("<Q", a("heapdata:/")),
            )
            put("heapdata:/", hblob)
            snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
            for n in sorted(names):
                snod += struct.pack("<QQ", heap_offsets[n], a(f"oh:{n}"))
                snod += struct.pack("<I", 0) + b"\x00" * 4 + b"\x00" * 16
            put("snod:/", snod)
        else:
            root_msgs = []
            for n in names:
                raw = n.encode()
                body = (
                    bytes([1, 0, len(raw)])
                    + raw
                    + struct.pack("<Q", a(f"oh:{n}"))
                )
                root_msgs.append((0x0006, body))
            put("oh:/", _v2_header(root_msgs + gat))

        for name, _msgs, meta in objects:
            put(f"oh:{name}", headers[name])
            if "chunk_blobs" in meta:
                blobs = meta["chunk_blobs"]
                dim = len(meta["cshape"]) + 1
                keysz = 8 + 8 * dim
                node = b"TREE" + struct.pack("<BBH", 1, 0, len(blobs))
                node += _UNDEF8 * 2
                for i, (coords, blob) in enumerate(blobs):
                    node += struct.pack("<II", len(blob), 0)
                    for c in coords + (0,):
                        node += struct.pack("<Q", c)
                    node += struct.pack("<Q", a(f"chunk:{name}:{i}"))
                # trailing boundary key
                node += struct.pack("<II", 0, 0) + b"\x00" * (keysz - 8)
                put(f"btree:{name}", node)
                for i, (_c, blob) in enumerate(blobs):
                    put(f"chunk:{name}:{i}", blob)
            else:
                put(f"data:{name}", seg_payloads[name])

        if dense_attrs:
            for name, _msgs, meta in objects:
                items = meta.get("dense_attr_items")
                if items:
                    put_dense(f"a:{name}", attr_bodies(items), 8)
            if root_attr_items:
                put_dense("a:/", attr_bodies(root_attr_items), 8)
        if dense_links:
            link_bodies = []
            for n in names:
                raw = n.encode()
                link_bodies.append(
                    (
                        n,
                        bytes([1, 0, len(raw)])
                        + raw
                        + struct.pack("<Q", a(f"oh:{n}")),
                    )
                )
            put_dense("l:/", link_bodies, 5)

        body = b"".join(parts)
        if style == "earliest":
            sb = HDF5_MAGIC + bytes([0, 0, 0, 0, 0, 8, 8, 0])
            sb += struct.pack("<HHI", 4, 16, 0)
            sb += struct.pack("<Q", 0) + _UNDEF8  # base, free-space
            sb += struct.pack("<Q", 96 + len(body))  # EOF
            sb += _UNDEF8  # driver info
            sb += struct.pack("<QQ", 0, a("oh:/") )
            sb += struct.pack("<I", 0) + b"\x00" * 4 + b"\x00" * 16
            assert len(sb) == 96, len(sb)
            base = 96
        else:
            base = 48
            sb = HDF5_MAGIC + bytes([3, 8, 8, 0])
            sb += struct.pack("<QQQQ", 0, (1 << 64) - 1, base + len(body), a("oh:/"))
            sb += struct.pack("<I", lookup3(sb))
            assert len(sb) == 48, len(sb)
        shifted = {k: v + base for k, v in out_addrs.items()}
        return sb + body, shifted

    # Fixed-point allocation: messages embed addresses, so build until
    # the address map stops moving.  Two passes suffice for unfiltered
    # layouts (sizes don't depend on addresses); filtered heaps deflate
    # block CONTENT that embeds addresses, so the stored sizes — and
    # hence later addresses — can shift for another pass or two.
    _blob, addrs = build({})
    for _ in range(10):
        blob, addrs2 = build(addrs)
        if addrs == addrs2:
            return blob
        addrs = addrs2
    raise AssertionError("writer allocation did not converge")
