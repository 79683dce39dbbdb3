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


def write_exr_z(path: str, depth: np.ndarray) -> None:
    """Write depth [H, W] float32 as an uncompressed single-channel EXR."""
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


def read_exr_z(path: str) -> np.ndarray:
    """Read back an uncompressed single-float-channel EXR (tests/tools)."""
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
    assert compression == 0, "only uncompressed EXR supported"
    x0, y0, x1, y1 = data_window
    h, w = y1 - y0 + 1, x1 - x0 + 1
    pos += 8 * h  # skip offset table
    out = np.empty((h, w), dtype=np.float32)
    for i in range(h):
        y, size = struct.unpack_from("<ii", raw, pos)
        pos += 8
        out[y - y0] = np.frombuffer(raw, dtype="<f4", count=w, offset=pos)
        pos += size
    return out
