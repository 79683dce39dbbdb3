"""Minimal OpenEXR v2 writer/reader for single-channel float depth maps.

The reference saves per-frame depth as EXR with one FLOAT channel "Z"
(run.py:64-77) through the OpenEXR bindings, which are not available in
this image — so the format is implemented directly: uncompressed scanline
EXR 2.0 (magic 20000630, version 2), which every EXR consumer reads.
"""
from __future__ import annotations

import struct

import numpy as np

_MAGIC = 20000630
_PIXEL_FLOAT = 2  # OpenEXR PixelType FLOAT (fp32)


def _attr(name: bytes, type_: bytes, value: bytes) -> bytes:
    return name + b"\x00" + type_ + b"\x00" + struct.pack("<i", len(value)) + value


def _chlist_z() -> bytes:
    # channel: name, pixel type, pLinear + reserved, xSampling, ySampling
    ch = b"Z\x00" + struct.pack("<i", _PIXEL_FLOAT) + b"\x00\x00\x00\x00" \
         + struct.pack("<ii", 1, 1)
    return ch + b"\x00"


_COMPRESSION_IDS = {"none": 0, "zips": 2, "zip": 3}


def write_exr_z(path: str, depth: np.ndarray, compression: str = "none") -> None:
    """Write depth [H, W] float32 as a single-channel EXR.

    compression: 'none' (pure Python), or 'zips'/'zip' via the native C++
    codec (video_depth_anything_tpu/native) — falls back to 'none' when the
    native library is unavailable.
    """
    if compression != "none":
        from ..native import load
        lib = load()
        if lib is not None:
            import ctypes
            d = np.ascontiguousarray(depth, dtype=np.float32)
            rc = lib.vda_write_exr_z(
                path.encode(), d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                d.shape[0], d.shape[1], _COMPRESSION_IDS[compression])
            if rc != 0:
                raise IOError(f"native EXR write failed ({rc}): {path}")
            return
        compression = "none"
    _write_exr_z_py(path, depth)


def write_exr_batch(paths, depths: np.ndarray, compression: str = "zip") -> None:
    """Batched writer for [N, H, W] fp32 via one native call (one ctypes
    round trip instead of N); falls back to the per-frame path."""
    from ..native import load
    lib = load()
    if lib is None or compression == "none":
        for p, d in zip(paths, depths):
            write_exr_z(p, d, compression="none")
        return
    import ctypes
    d = np.ascontiguousarray(depths, dtype=np.float32)
    joined = "\n".join(paths).encode()
    rc = lib.vda_write_exr_batch(
        joined, d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        d.shape[0], d.shape[1], d.shape[2], _COMPRESSION_IDS[compression])
    if rc != 0:
        raise IOError(f"native EXR batch write failed ({rc})")


def _write_exr_z_py(path: str, depth: np.ndarray) -> None:
    """Uncompressed single-channel EXR, pure Python."""
    depth = np.ascontiguousarray(depth, dtype="<f4")
    h, w = depth.shape
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b"".join([
        _attr(b"channels", b"chlist", _chlist_z()),
        _attr(b"compression", b"compression", b"\x00"),  # NO_COMPRESSION
        _attr(b"dataWindow", b"box2i", box),
        _attr(b"displayWindow", b"box2i", box),
        _attr(b"lineOrder", b"lineOrder", b"\x00"),      # INCREASING_Y
        _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
        _attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0)),
        _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
    ]) + b"\x00"

    preamble = struct.pack("<ii", _MAGIC, 2) + header
    table_start = len(preamble)
    data_start = table_start + 8 * h
    line_bytes = 8 + 4 * w  # y + size prefix + payload
    offsets = struct.pack("<%dQ" % h,
                          *[data_start + i * line_bytes for i in range(h)])
    with open(path, "wb") as f:
        f.write(preamble)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, 4 * w))
            f.write(depth[y].tobytes())


def _exr_unzip_py(data: bytes, raw_n: int) -> bytes:
    """OpenEXR zip decompression: inflate -> un-predict -> interleave."""
    import zlib

    if len(data) == raw_n:
        return data
    tmp = bytearray(zlib.decompress(data))
    assert len(tmp) == raw_n
    arr = np.frombuffer(bytes(tmp), np.uint8).astype(np.int32)
    arr[1:] = arr[1:] - 128
    arr = np.cumsum(arr) & 0xFF
    half = (raw_n + 1) // 2
    out = np.empty(raw_n, np.uint8)
    out[0::2] = arr[:half].astype(np.uint8)[: len(out[0::2])]
    out[1::2] = arr[half:].astype(np.uint8)[: len(out[1::2])]
    return out.tobytes()


def read_exr_z(path: str) -> np.ndarray:
    """Read a single-float-channel EXR (none/ZIPS/ZIP compression)."""
    with open(path, "rb") as f:
        raw = f.read()
    magic, version = struct.unpack_from("<ii", raw, 0)
    assert magic == _MAGIC, "not an EXR file"
    pos = 8
    data_window = None
    compression = None
    while raw[pos] != 0:
        name_end = raw.index(b"\x00", pos)
        name = raw[pos:name_end]
        pos = name_end + 1
        type_end = raw.index(b"\x00", pos)
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        value = raw[pos:pos + size]
        pos += size
        if name == b"dataWindow":
            data_window = struct.unpack("<iiii", value)
        elif name == b"compression":
            compression = value[0]
    pos += 1  # header terminator
    assert compression in (0, 2, 3), f"unsupported compression {compression}"
    x0, y0, x1, y1 = data_window
    h, w = y1 - y0 + 1, x1 - x0 + 1
    lines_per_block = {0: 1, 2: 1, 3: 16}[compression]
    n_blocks = -(-h // lines_per_block)
    pos += 8 * n_blocks  # skip offset table
    out = np.empty((h, w), dtype=np.float32)
    for _ in range(n_blocks):
        y, size = struct.unpack_from("<ii", raw, pos)
        pos += 8
        nl = min(lines_per_block, h - (y - y0))
        raw_n = 4 * w * nl
        payload = raw[pos:pos + size]
        pos += size
        if compression != 0:
            payload = _exr_unzip_py(payload, raw_n)
        block = np.frombuffer(payload, dtype="<f4", count=w * nl)
        out[y - y0: y - y0 + nl] = block.reshape(nl, w)
    return out
