"""One-time migration of the reference's vaex-HDF5 artifacts to Parquet.

The reference pipeline persists every processed chunk as a vaex HDF5 export
(``lib/canparser.py:333-339``: ``vaex.from_pandas(df).export(...)``) and
reads it back in ``lib/resampler.py:113``. This engine replaces that
interchange format with Parquet (SURVEY §2.1 S2/K1), so a user holding
ALREADY-PROCESSED reference outputs needs exactly one bridge: read the
vaex HDF5 layout, write the engine's Parquet. That is a DRIVER-SIDE,
one-time step — never a distributed data path — so the implementation
optimizes for zero dependencies, not throughput.

Format coverage. vaex's HDF5 export (written through h5py with default
settings) stores each column as a contiguous little-endian numeric
dataset under ``/table/columns/<name>/data`` (older vaex: ``/columns/
<name>/data``). When ``h5py`` is importable it is used directly (full
format coverage). Otherwise :class:`_MiniH5` — a pure-stdlib+numpy
reader for the h5py-default on-disk subset, written against the PUBLIC
HDF5 File Format Specification (superblock v0, v1 object headers,
symbol-table groups with v1 B-trees and local heaps, contiguous
fixed-point/float datasets) — reads the same files with no install.
Unsupported shapes (chunked/compressed layouts, variable-length string
columns) raise with the precise reason rather than mis-reading.

``write_vaex_hdf5`` emits the same subset (one contiguous dataset per
column under ``/table/columns/<name>/data``), so users can also hand
engine outputs BACK to the reference stack; the writer doubles as the
fixture generator for the round-trip test
(``tests/test_hdf5_migrate.py``), which h5py cross-validates whenever
it is installed.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

UNDEF = 0xFFFFFFFFFFFFFFFF

# -- datatype encodings (HDF5 spec IV.A.2.d: class 0 fixed-point,
#    class 1 floating-point; little-endian, h5py defaults) -------------

_FLOAT_PROPS = {
    4: (0, 32, 23, 8, 0, 23, 127),
    8: (0, 64, 52, 11, 0, 52, 1023),
}


def _dt_message(dt: np.dtype) -> bytes:
    """Datatype message body for a little-endian numeric numpy dtype."""
    if dt.kind in ("i", "u"):
        cls_ver = (1 << 4) | 0
        signed = 0x08 if dt.kind == "i" else 0x00
        head = struct.pack("<B3BI", cls_ver, signed, 0, 0, dt.itemsize)
        return head + struct.pack("<HH", 0, dt.itemsize * 8)
    if dt.kind == "f" and dt.itemsize in _FLOAT_PROPS:
        cls_ver = (1 << 4) | 1
        boff, prec, eloc, esize, mloc, msize, bias = _FLOAT_PROPS[dt.itemsize]
        # bit field: little-endian, lo pad 0, hi pad 0, mantissa norm =
        # implied-msb (2 << 4), sign location byte follows
        sign_loc = dt.itemsize * 8 - 1
        head = struct.pack(
            "<BBBBI", cls_ver, 0x20, sign_loc, 0, dt.itemsize
        )
        return head + struct.pack(
            "<HHBBBBI", boff, prec, eloc, esize, mloc, msize, bias
        )
    raise ValueError(
        f"vaex-HDF5 bridge supports little-endian numeric columns only; "
        f"got dtype {dt} (export strings/objects separately)"
    )


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    size = struct.unpack("<I", body[4:8])[0]
    bits = body[1]
    if cls == 0:  # fixed-point
        if bits & 0x01:
            raise ValueError("unsupported HDF5 dataset: big-endian integers")
        return np.dtype(("i" if bits & 0x08 else "u") + str(size))
    if cls == 1:  # float
        if bits & 0x01:
            raise ValueError("unsupported HDF5 dataset: big-endian floats")
        if size not in (4, 8):
            raise ValueError(f"unsupported HDF5 float width {size}")
        return np.dtype(f"f{size}")
    raise ValueError(
        f"unsupported HDF5 datatype class {cls} (numeric columns only)"
    )


# -- minimal reader ----------------------------------------------------


class _MiniH5:
    """Pure-stdlib reader for the h5py-default HDF5 subset (see module
    docstring). Collects ``{'/path/to/dataset': (dtype, shape, offset)}``
    for contiguous numeric datasets; groups traverse symbol tables."""

    def __init__(self, raw: bytes):
        self.raw = raw
        if raw[:8] != b"\x89HDF\r\n\x1a\n":
            raise ValueError("not an HDF5 file (bad signature)")
        if raw[8] != 0:
            raise ValueError(
                f"unsupported HDF5 superblock version {raw[8]} (the "
                "h5py-default subset uses v0; install h5py for others)"
            )
        if raw[13] != 8 or raw[14] != 8:
            raise ValueError("unsupported HDF5: non-8-byte offsets/lengths")
        # root group symbol-table entry begins at byte 24 of the v0
        # superblock after sizes/ks/flags + base/freespace/eof/driver
        root_entry = 24 + 32
        self.datasets: dict[str, tuple[np.dtype, tuple, int]] = {}
        oh_addr = struct.unpack("<Q", raw[root_entry + 8 : root_entry + 16])[0]
        self._walk_group(oh_addr, "")

    # object header v1: version,reserved,nmsgs,refcount,hdrsize then
    # 8-aligned messages (type,size,flags,3×reserved,body)
    def _messages(self, addr: int):
        raw = self.raw
        if raw[addr] != 1:
            raise ValueError(
                f"unsupported HDF5 object header v{raw[addr]} (h5py-default"
                " subset uses v1; install h5py for v2 files)"
            )
        nmsgs = struct.unpack("<H", raw[addr + 2 : addr + 4])[0]
        size = struct.unpack("<I", raw[addr + 8 : addr + 12])[0]
        pos = addr + 16
        end = pos + size
        got = 0
        while got < nmsgs:
            if pos + 8 > end:
                raise ValueError("corrupt HDF5: object header overrun")
            mtype, msize, _flags = struct.unpack("<HHB", raw[pos : pos + 5])
            body = raw[pos + 8 : pos + 8 + msize]
            if mtype == 0x0010:  # continuation: jump the message stream
                caddr, clen = struct.unpack("<QQ", body[:16])
                pos, end = caddr, caddr + clen
                got += 1
                continue
            yield mtype, body
            got += 1
            pos += 8 + msize

    def _walk_group(self, oh_addr: int, prefix: str) -> None:
        st = None
        for mtype, body in self._messages(oh_addr):
            if mtype == 0x0011:  # symbol table: btree + heap
                st = struct.unpack("<QQ", body[:16])
        if st is None:
            self._read_dataset(oh_addr, prefix)
            return
        btree, heap = st
        heap_data = struct.unpack("<Q", self.raw[heap + 24 : heap + 32])[0]
        for child_oh, name_off in self._btree_entries(btree):
            nul = self.raw.index(b"\x00", heap_data + name_off)
            name = self.raw[heap_data + name_off : nul].decode()
            self._walk_group(child_oh, f"{prefix}/{name}")

    def _btree_entries(self, addr: int):
        raw = self.raw
        if raw[addr : addr + 4] != b"TREE":
            raise ValueError("corrupt HDF5: expected v1 B-tree node")
        level = raw[addr + 5]
        used = struct.unpack("<H", raw[addr + 6 : addr + 8])[0]
        # keys/children alternate after 2 sibling addresses
        pos = addr + 24
        for i in range(used):
            child = struct.unpack(
                "<Q", raw[pos + 8 + i * 16 : pos + 16 + i * 16]
            )[0]
            if level > 0:
                yield from self._btree_entries(child)
            else:
                yield from self._snod_entries(child)

    def _snod_entries(self, addr: int):
        raw = self.raw
        if raw[addr : addr + 4] != b"SNOD":
            raise ValueError("corrupt HDF5: expected symbol node")
        nsyms = struct.unpack("<H", raw[addr + 6 : addr + 8])[0]
        pos = addr + 8
        for _ in range(nsyms):
            name_off, oh = struct.unpack("<QQ", raw[pos : pos + 16])
            yield oh, name_off
            pos += 40

    def _read_dataset(self, oh_addr: int, path: str) -> None:
        dt = shape = data = None
        for mtype, body in self._messages(oh_addr):
            if mtype == 0x0001:  # dataspace v1
                rank = body[1]
                shape = struct.unpack(
                    "<" + "Q" * rank, body[8 : 8 + 8 * rank]
                )
            elif mtype == 0x0003:
                dt = _parse_datatype(body)
            elif mtype == 0x0008:  # data layout v3
                if body[0] != 3:
                    raise ValueError(
                        f"unsupported HDF5 data layout v{body[0]}"
                    )
                if body[1] != 1:
                    raise ValueError(
                        "unsupported HDF5 dataset: non-contiguous layout "
                        "(chunked/compressed files need h5py installed)"
                    )
                data = struct.unpack("<Q", body[2:10])[0]
        if dt is not None and shape is not None and data is not None:
            self.datasets[path] = (dt, shape, data)

    def read(self, path: str) -> np.ndarray:
        dt, shape, off = self.datasets[path]
        n = int(np.prod(shape)) if shape else 1
        return np.frombuffer(
            self.raw, dtype=dt, count=n, offset=off
        ).reshape(shape)


# -- public API --------------------------------------------------------


def read_vaex_hdf5(path: str) -> pd.DataFrame:
    """Read a vaex HDF5 export into a pandas DataFrame (driver-side).
    Uses h5py when importable; otherwise the built-in minimal reader."""
    try:
        import h5py  # noqa: F401

        return _read_with_h5py(path)
    except ImportError:
        pass
    with open(path, "rb") as f:
        raw = f.read()
    mini = _MiniH5(raw)
    cols: dict[str, np.ndarray] = {}
    for ds_path in sorted(mini.datasets):
        parts = ds_path.strip("/").split("/")
        # vaex layouts: /table/columns/<name>/data or /columns/<name>/data
        if parts[-1] == "data" and "columns" in parts[:-2]:
            cols[parts[-2]] = mini.read(ds_path)
    if not cols:
        raise ValueError(
            f"{path}: no vaex column datasets found "
            "(expected /table/columns/<name>/data)"
        )
    return pd.DataFrame(cols)


def _read_with_h5py(path: str) -> pd.DataFrame:
    import h5py

    cols: dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        root = f.get("table/columns") or f.get("columns")
        if root is None:
            raise ValueError(
                f"{path}: no vaex column group (/table/columns or /columns)"
            )
        for name, grp in root.items():
            if "data" in grp:
                cols[name] = np.asarray(grp["data"])
    return pd.DataFrame(cols)


def migrate_vaex_hdf5(
    spark,
    src_paths,
    out_dir: str,
    timestamp_cols: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Convert vaex-HDF5 files to ONE engine-convention Parquet dataset.

    ``timestamp_cols`` maps column name → epoch unit (``"s"``, ``"ms"``,
    ``"us"``, ``"ns"``) for numeric columns that carry event time (the
    reference's ``timestamp`` index exports as epoch numbers); they
    become proper timestamp columns. Returns total rows written. The
    write inherits the session's Parquet conventions (TIMESTAMP_MICROS —
    see session.py — so footer stats and pushdown work on the result)."""
    total = 0
    first = True
    for p in list(src_paths):
        pdf = read_vaex_hdf5(p)
        for col, unit in (timestamp_cols or {}).items():
            if col in pdf.columns:
                pdf[col] = pd.to_datetime(pdf[col], unit=unit)
        sdf = spark.createDataFrame(pdf)
        sdf.write.mode(mode if first else "append").parquet(out_dir)
        total += len(pdf)
        first = False
    return total


def write_vaex_hdf5(path: str, df: pd.DataFrame) -> None:
    """Write numeric columns as a vaex-layout HDF5 file
    (``/table/columns/<name>/data``) in the same h5py-default subset the
    reader supports — the reverse bridge (engine → reference stack) and
    the round-trip fixture generator."""
    cols = {
        str(c): np.ascontiguousarray(df[c].to_numpy())
        for c in df.columns
    }
    for c, arr in cols.items():
        _dt_message(arr.dtype)  # raises early on unsupported dtypes

    buf = bytearray()

    def align(n: int = 8) -> None:
        while len(buf) % n:
            buf.append(0)

    def reserve(nbytes: int) -> int:
        align()
        off = len(buf)
        buf.extend(b"\x00" * nbytes)
        return off

    def oh_v1(messages: list[tuple[int, bytes]]) -> int:
        """Append a v1 object header; returns its address."""
        align()
        body = bytearray()
        for mtype, mbody in messages:
            pad = (-len(mbody)) % 8
            body += struct.pack("<HHB3x", mtype, len(mbody) + pad, 0)
            body += mbody + b"\x00" * pad
        off = len(buf)
        buf.extend(
            struct.pack("<BxHII4x", 1, len(messages), 1, len(body))
        )
        buf.extend(body)
        return off

    max_kids = 0

    def group(children: list[tuple[str, int]]) -> int:
        """Append heap+SNOD+btree for named children (sorted); returns
        the group's object-header address."""
        nonlocal max_kids
        max_kids = max(max_kids, len(children))
        children = sorted(children)
        # local heap: offset 0 must hold the empty string
        heap_data = bytearray(b"\x00" * 8)
        offs = []
        for name, _ in children:
            offs.append(len(heap_data))
            nb = name.encode() + b"\x00"
            heap_data += nb + b"\x00" * ((-len(nb)) % 8)
        hd_addr = reserve(len(heap_data))
        buf[hd_addr : hd_addr + len(heap_data)] = heap_data
        align()
        heap_addr = len(buf)
        buf.extend(b"HEAP" + struct.pack("<B3x", 0))
        buf.extend(struct.pack("<QQQ", len(heap_data), UNDEF, hd_addr))
        # symbol node
        align()
        snod_addr = len(buf)
        buf.extend(b"SNOD" + struct.pack("<BxH", 1, len(children)))
        for (name, oh), noff in zip(children, offs):
            buf.extend(struct.pack("<QQI4x16x", noff, oh, 0))
        # btree v1, single leaf: key0="" , child, key1=last name
        align()
        bt_addr = len(buf)
        buf.extend(b"TREE" + struct.pack("<BBH", 0, 0, 1))
        buf.extend(struct.pack("<QQ", UNDEF, UNDEF))
        buf.extend(struct.pack("<QQQ", 0, snod_addr, offs[-1] if offs else 0))
        return oh_v1([(0x0011, struct.pack("<QQ", bt_addr, heap_addr))])

    # superblock placeholder (96 bytes: 24 fixed + 32 addresses + 40
    # root symbol-table entry)
    buf.extend(b"\x00" * 96)

    ds_headers: list[tuple[str, int]] = []
    for name, arr in cols.items():
        align()
        data_addr = len(buf)
        buf.extend(arr.tobytes())
        space = struct.pack("<BBB5x", 1, 1, 0) + struct.pack("<Q", arr.size)
        layout = struct.pack(
            "<BB", 3, 1
        ) + struct.pack("<QQ", data_addr, arr.nbytes)
        ds_oh = oh_v1([
            (0x0001, space),
            (0x0003, _dt_message(arr.dtype)),
            (0x0008, layout),
        ])
        col_oh = group([("data", ds_oh)])
        ds_headers.append((name, col_oh))

    columns_oh = group(ds_headers)
    table_oh = group([("columns", columns_oh)])
    root_oh = group([("table", table_oh)])

    # group leaf k sized so a single symbol node legally holds every
    # child (2k >= entries, III.A of the spec)
    leaf_k = max(4, (max_kids + 1) // 2)
    sb = struct.pack(
        "<8s4B4BHHI",
        b"\x89HDF\r\n\x1a\n", 0, 0, 0, 0, 0, 8, 8, 0, leaf_k, 16, 0,
    )
    sb += struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF)
    sb += struct.pack("<QQI4x16x", 0, root_oh, 0)
    buf[: len(sb)] = sb
    with open(path, "wb") as f:
        f.write(bytes(buf))
