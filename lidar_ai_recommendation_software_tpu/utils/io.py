"""Point-cloud file IO.

Host-side loaders feeding device arrays — the capability of the reference's
three loaders unified in one place:
  - utils/data_processing.py:8-125   (CSV/XYZ/PCD/PLY/TXT/NPY, modular)
  - app_simplified.py:23-74          (upload-stream CSV/XYZ/TXT/NPY)
  - windows_implementation/core/data_loader.py:15-447 (delimiter sniffing,
    LAS binary via struct)

Improvements over the reference (documented deviations):
  - LAS: real header parsing (point formats 0-5), true scale/offset from
    the header, no 10,000-point cap and no hardcoded 0.01 scale
    (data_loader.py:410,422 caps and fakes both "for demonstration").
  - PCD: ascii, binary AND binary_compressed (LZF) are all parsed
    (the reference's loaders handle ascii only and crash on the rest);
    fields located via the FIELDS header rather than assuming xyz-first.
  - PLY: handles binary_little_endian in addition to ASCII.
  - All text parsing is vectorised NumPy (the reference's per-line float
    loops are the slowest ingest path it has).
"""

from __future__ import annotations

import io
import os
import re
import struct
from typing import Optional, Union

import numpy as np

SUPPORTED_EXTENSIONS = ("csv", "xyz", "txt", "npy", "npz", "pcd", "ply",
                        "las")


class LoaderError(Exception):
    """Raised when a point-cloud file cannot be parsed."""


def load_points(source: Union[str, bytes, io.IOBase],
                fmt: Optional[str] = None) -> np.ndarray:
    """Load a point cloud into an (n, 3) float64 array.

    ``source`` may be a path, raw bytes, or a binary file object;
    ``fmt`` overrides extension-based format detection (needed for
    bytes/stream sources)."""
    if isinstance(source, (str, os.PathLike)):
        path = os.fspath(source)
        fmt = fmt or path.lower().rsplit(".", 1)[-1]
        with open(path, "rb") as f:
            data = f.read()
    elif isinstance(source, bytes):
        if not fmt:
            raise LoaderError("fmt required when loading from bytes")
        data = source
    else:
        if not fmt:
            raise LoaderError("fmt required when loading from a stream")
        data = source.read()
        if isinstance(data, str):
            data = data.encode()

    fmt = fmt.lower().lstrip(".")
    loaders = {
        "csv": _load_csv, "xyz": _load_text, "txt": _load_text,
        "npy": _load_npy, "npz": _load_npz, "pcd": _load_pcd,
        "ply": _load_ply, "las": _load_las, "laz": _reject_laz,
    }
    if fmt not in loaders:
        raise LoaderError(f"Unsupported file format: {fmt}")
    points = loaders[fmt](data)
    points = np.asarray(points, dtype=np.float64)
    if points.ndim != 2 or points.shape[1] < 3:
        raise LoaderError(
            f"parsed array has shape {points.shape}, need (n, >=3)")
    points = points[:, :3]
    if len(points) == 0:
        raise LoaderError("The loaded point cloud contains no points")
    return points


def _load_csv(data: bytes) -> np.ndarray:
    """CSV with headers: find x/y/z columns (case-insensitive), else use
    the first three numeric columns (data_processing.py:23-37)."""
    import pandas as pd
    df = pd.read_csv(io.BytesIO(data))
    cols = {c.lower().strip(): c for c in df.columns}
    if all(a in cols for a in ("x", "y", "z")):
        return df[[cols["x"], cols["y"], cols["z"]]].to_numpy(float)
    num = df.select_dtypes("number")
    if num.shape[1] < 3:
        # headerless numeric CSV mis-read as header row
        df = pd.read_csv(io.BytesIO(data), header=None)
        num = df.select_dtypes("number")
    if num.shape[1] < 3:
        raise LoaderError("CSV has fewer than 3 numeric columns")
    return num.iloc[:, :3].to_numpy(float)


def _load_text(data: bytes) -> np.ndarray:
    """XYZ/TXT: whitespace/comma/semicolon separated rows; skips
    unparseable lines (app_simplified.py:44-56, data_loader.py:139-166).

    Large files route through the native C++ parser (utils/native.py);
    the NumPy path below is the always-available fallback and the test
    oracle for the native one."""
    if len(data) > 1 << 16:
        from lidar_ai_recommendation_software_tpu.utils import native
        pts = native.parse_xyz_text(data)
        if pts is not None:
            if len(pts) == 0:
                raise LoaderError("no parseable coordinate rows")
            return pts
    text = data.decode("utf-8", errors="replace")
    # normalise separators, then let numpy parse line-wise
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith(("#", "//")):
            continue
        parts = re.split(r"[,;\s]+", line)
        if len(parts) < 3:
            continue
        try:
            rows.append([float(parts[0]), float(parts[1]),
                         float(parts[2])])
        except ValueError:
            continue
    if not rows:
        raise LoaderError("no parseable coordinate rows")
    return np.array(rows)


def _load_npy(data: bytes) -> np.ndarray:
    arr = np.load(io.BytesIO(data), allow_pickle=False)
    return np.asarray(arr, float)


def _load_npz(data: bytes) -> np.ndarray:
    with np.load(io.BytesIO(data), allow_pickle=False) as z:
        for key in ("points", "xyz", "arr_0"):
            if key in z:
                return np.asarray(z[key], float)
        raise LoaderError(
            f"npz has no points/xyz/arr_0 array (keys: {list(z.keys())})")


_PCD_TYPES = {("F", 4): "<f4", ("F", 8): "<f8",
              ("I", 1): "<i1", ("I", 2): "<i2", ("I", 4): "<i4",
              ("U", 1): "<u1", ("U", 2): "<u2", ("U", 4): "<u4"}


def _load_pcd(data: bytes) -> np.ndarray:
    """PCD loader: ascii (data_processing.py:43-76 semantics, but
    field-aware), plus the DATA binary and DATA binary_compressed modes
    the reference rejects — binary is what PCL sensors actually emit;
    binary_compressed bodies are LZF streams decoded by the native
    library (utils/native.lzf_decompress, Python fallback)."""
    header_end = data.find(b"DATA ")
    if header_end < 0:
        raise LoaderError("PCD: no DATA line")
    nl = data.find(b"\n", header_end)
    header = data[:nl].decode("ascii", errors="replace")
    body = data[nl + 1:]

    fields = []
    sizes = []
    types = []
    counts = []
    n_points = 0
    data_mode = "ascii"
    for line in header.splitlines():
        parts = line.strip().split()
        if not parts:
            continue
        key = parts[0]
        if key == "FIELDS":
            fields = [p.lower() for p in parts[1:]]
        elif key == "SIZE":
            sizes = [int(p) for p in parts[1:]]
        elif key == "TYPE":
            types = [p.upper() for p in parts[1:]]
        elif key == "COUNT":
            counts = [int(p) for p in parts[1:]]
        elif key == "POINTS":
            n_points = int(parts[1])
        elif key == "DATA":
            data_mode = parts[1] if len(parts) > 1 else "ascii"

    if data_mode in ("binary", "binary_compressed"):
        return _load_pcd_binary(body, fields, sizes, types,
                                counts or [1] * len(fields), n_points,
                                compressed=data_mode
                                == "binary_compressed")
    if data_mode != "ascii":
        raise LoaderError(f"PCD DATA {data_mode} not supported")
    arr = _load_text(body)
    if fields and fields[:3] != ["x", "y", "z"]:
        try:
            ix, iy, iz = (fields.index(a) for a in ("x", "y", "z"))
        except ValueError as e:
            raise LoaderError(f"PCD missing xyz fields: {fields}") from e
        full = _load_text_full(body, len(fields))
        return full[:, [ix, iy, iz]]
    return arr


def _load_pcd_binary(body: bytes, fields, sizes, types, counts,
                     n_points: int, compressed: bool) -> np.ndarray:
    if not (fields and sizes and types) or not (
            len(fields) == len(sizes) == len(types) == len(counts)):
        raise LoaderError("PCD binary: malformed FIELDS/SIZE/TYPE header")
    if n_points <= 0:
        raise LoaderError("PCD binary: POINTS missing")
    try:
        np_types = [_PCD_TYPES[(t, s)] for t, s in zip(types, sizes)]
    except KeyError as e:
        raise LoaderError(f"PCD binary: unsupported TYPE/SIZE {e}") from e
    try:
        ix, iy, iz = (fields.index(a) for a in ("x", "y", "z"))
    except ValueError as e:
        raise LoaderError(f"PCD missing xyz fields: {fields}") from e

    if compressed:
        # body = u32 compressed_size, u32 uncompressed_size, LZF blob;
        # decompressed layout is SOA: field 0 for all points, field 1...
        if len(body) < 8:
            raise LoaderError("PCD binary_compressed: truncated header")
        csize, usize = np.frombuffer(body[:8], "<u4")
        from lidar_ai_recommendation_software_tpu.utils import native
        raw = native.lzf_decompress(body[8:8 + int(csize)], int(usize))
        if raw is None:
            raise LoaderError("PCD binary_compressed: LZF decode failed")
        cols = []
        off = 0
        for f, t, c in zip(fields, np_types, counts):
            nbytes = np.dtype(t).itemsize * c * n_points
            if f in ("x", "y", "z"):
                col = np.frombuffer(raw[off:off + nbytes], t)
                cols.append((f, col.reshape(n_points, c)[:, 0]))
            off += nbytes
        by = dict(cols)
        return np.stack([np.asarray(by[a], np.float64)
                         for a in ("x", "y", "z")], axis=1)

    # AOS: one structured record per point
    dt = np.dtype([(f"f{i}", t, (c,)) for i, (t, c) in
                   enumerate(zip(np_types, counts))])
    n_avail = len(body) // dt.itemsize
    rec = np.frombuffer(body[:min(n_points, n_avail) * dt.itemsize], dt)
    return np.stack([np.asarray(rec[f"f{i}"][:, 0], np.float64)
                     for i in (ix, iy, iz)], axis=1)


def _load_text_full(data: bytes, ncols: int) -> np.ndarray:
    text = data.decode("utf-8", errors="replace")
    rows = []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) >= ncols:
            try:
                rows.append([float(p) for p in parts[:ncols]])
            except ValueError:
                continue
    return np.array(rows)


def _load_ply(data: bytes) -> np.ndarray:
    """PLY: ASCII and binary_little_endian vertex clouds."""
    end = data.find(b"end_header")
    if end < 0:
        raise LoaderError("PLY: no end_header")
    nl = data.find(b"\n", end)
    header = data[:nl].decode("ascii", errors="replace")
    body = data[nl + 1:]

    fmt = "ascii"
    n_vertex = None
    props = []  # (name, dtype) of the vertex element
    in_vertex = False
    for line in header.splitlines():
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if in_vertex:
                n_vertex = int(parts[2])
        elif parts[0] == "property" and in_vertex and parts[1] != "list":
            props.append((parts[2], parts[1]))
    if n_vertex is None:
        raise LoaderError("PLY: no vertex element")

    names = [p[0].lower() for p in props]
    try:
        ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
    except ValueError as e:
        raise LoaderError(f"PLY vertex missing xyz: {names}") from e

    if fmt == "ascii":
        full = _load_text_full(body, len(props))
        return full[:n_vertex, [ix, iy, iz]]
    if fmt == "binary_little_endian":
        type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                    "float64": "<f8", "int": "<i4", "int32": "<i4",
                    "uint": "<u4", "uint32": "<u4", "short": "<i2",
                    "ushort": "<u2", "char": "<i1", "uchar": "<u1",
                    "int8": "<i1", "uint8": "<u1", "int16": "<i2",
                    "uint16": "<u2"}
        dt = np.dtype([(n, type_map[t]) for n, t in props])
        arr = np.frombuffer(body[:n_vertex * dt.itemsize], dtype=dt)
        return np.stack([arr[props[i][0]].astype(float)
                         for i in (ix, iy, iz)], axis=1)
    raise LoaderError(f"PLY format {fmt} not supported")


# LAS point-record xyz location is identical across formats 0-5; only the
# record length differs.
_LAS_MIN_RECORD = {0: 20, 1: 28, 2: 26, 3: 34, 4: 57, 5: 63}


def _load_las(data: bytes) -> np.ndarray:
    """LAS 1.x binary reader (full header semantics — replaces the
    reference's capped/hardcoded demo reader, data_loader.py:380-431)."""
    if data[:4] != b"LASF":
        raise LoaderError("LAS: bad magic")
    point_data_offset = struct.unpack_from("<I", data, 96)[0]
    point_format = struct.unpack_from("<B", data, 104)[0] & 0x3F
    record_len = struct.unpack_from("<H", data, 105)[0]
    n_points = struct.unpack_from("<I", data, 107)[0]
    sx, sy, sz = struct.unpack_from("<3d", data, 131)
    ox, oy, oz = struct.unpack_from("<3d", data, 155)

    if point_format not in _LAS_MIN_RECORD:
        raise LoaderError(f"LAS point format {point_format} not supported")
    if record_len < _LAS_MIN_RECORD[point_format]:
        raise LoaderError("LAS: record length inconsistent with format")

    end = point_data_offset + n_points * record_len
    if len(data) < end:
        n_points = (len(data) - point_data_offset) // record_len

    from lidar_ai_recommendation_software_tpu.utils import native
    pts = native.parse_las_points(data, point_data_offset, record_len,
                                  n_points, (sx, sy, sz), (ox, oy, oz))
    if pts is not None:
        return pts

    raw = np.frombuffer(data[point_data_offset:
                             point_data_offset + n_points * record_len],
                        dtype=np.uint8).reshape(n_points, record_len)
    xyz_i32 = raw[:, :12].copy().view("<i4").reshape(n_points, 3)
    return xyz_i32 * np.array([sx, sy, sz]) + np.array([ox, oy, oz])


def _reject_laz(data: bytes) -> np.ndarray:
    raise LoaderError(
        "LAZ (compressed LAS) is not supported; decompress to LAS first")


# ---------------------------------------------------------------------------
# Writers (round-trip support for tests and export)
# ---------------------------------------------------------------------------

def save_points(path: str, points: np.ndarray) -> None:
    fmt = path.lower().rsplit(".", 1)[-1]
    points = np.asarray(points, dtype=np.float64)[:, :3]
    if fmt == "npy":
        np.save(path, points)
    elif fmt in ("xyz", "txt"):
        np.savetxt(path, points, fmt="%.8f")
    elif fmt == "csv":
        header = "x,y,z"
        np.savetxt(path, points, fmt="%.8f", delimiter=",",
                   header=header, comments="")
    elif fmt == "pcd":
        with open(path, "w") as f:
            f.write("# .PCD v0.7 - Point Cloud Data file format\n"
                    "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                    "COUNT 1 1 1\n"
                    f"WIDTH {len(points)}\nHEIGHT 1\n"
                    "VIEWPOINT 0 0 0 1 0 0 0\n"
                    f"POINTS {len(points)}\nDATA ascii\n")
            np.savetxt(f, points, fmt="%.8f")
    elif fmt == "ply":
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    f"element vertex {len(points)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n")
            np.savetxt(f, points, fmt="%.8f")
    elif fmt == "las":
        _save_las(path, points)
    else:
        raise LoaderError(f"Unsupported save format: {fmt}")


def _save_las(path: str, points: np.ndarray) -> None:
    """Minimal valid LAS 1.2 format-0 writer."""
    n = len(points)
    mins = points.min(axis=0)
    maxs = points.max(axis=0)
    scale = np.maximum((maxs - mins) / (2 ** 31 - 2), 1e-8)
    offset = mins
    header = bytearray(227)
    header[0:4] = b"LASF"
    struct.pack_into("<B", header, 24, 1)   # version major
    struct.pack_into("<B", header, 25, 2)   # version minor
    struct.pack_into("<H", header, 94, 227)  # header size
    struct.pack_into("<I", header, 96, 227)  # point data offset
    struct.pack_into("<B", header, 104, 0)   # point format
    struct.pack_into("<H", header, 105, 20)  # record length
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    struct.pack_into("<3d", header, 179, maxs[0], mins[0], maxs[1])
    struct.pack_into("<3d", header, 203, mins[1], maxs[2], mins[2])

    ints = np.round((points - offset) / scale).astype("<i4")
    records = np.zeros((n, 20), dtype=np.uint8)
    records[:, :12] = ints.view(np.uint8).reshape(n, 12)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(records.tobytes())
