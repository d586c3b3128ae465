"""Minimal pure-Python PNG decode/encode for 16-bit images.

The native codec shim (``io/_codecs.cpp``) deliberately normalises PNG to
8-bit HWC uint8 (the compute path is uint8-at-rest). Dataset ground truth —
KITTI flow/disparity (48-bit RGB), InStereo2k/CREStereo disparities (16-bit
gray) — needs the raw 16-bit values (reference reads them through libpng,
``csrc/io/image/cpu/decode_png.cpp``). This host-side reader covers color
types 0 (gray) and 2 (RGB) at bit depths 8/16, all five scanline filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["read_png_16", "write_png_16"]

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _read_png_16_native(data: bytes):
    """Depth-preserving decode through the C shim's ``cvt_decode_png16``
    (libpng, reference ``csrc/io/image/cpu/decode_png.cpp``); None if the
    shim or symbol is unavailable."""
    import ctypes

    from .image import _load_lib

    lib = _load_lib()
    if lib is None or not hasattr(lib, "cvt_decode_png16"):
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.cvt_decode_png16(data, len(data), ctypes.byref(out),
                              ctypes.byref(h), ctypes.byref(w),
                              ctypes.byref(c), ctypes.byref(depth))
    if rc != 0:
        return None
    try:
        nbytes = h.value * w.value * c.value * (depth.value // 8)
        buf = ctypes.string_at(out, nbytes)
    finally:
        lib.cvt_free(out)
    dt = np.uint16 if depth.value == 16 else np.uint8
    arr = np.frombuffer(buf, dt).reshape(h.value, w.value, c.value)
    return arr[:, :, 0] if c.value == 1 else arr


def read_png_16(path_or_bytes) -> np.ndarray:
    """Decode a PNG to (H, W) or (H, W, C) uint8/uint16, preserving depth."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG file")
    native = _read_png_16_native(data)
    if native is not None:
        return native
    pos = 8
    width = height = bit_depth = color_type = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk)
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if color_type not in (0, 2):
        raise ValueError(f"unsupported PNG color type {color_type}")
    if bit_depth not in (8, 16):
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    channels = 1 if color_type == 0 else 3
    bpp = channels * (bit_depth // 8)  # filter unit, bytes
    stride = width * bpp
    raw = zlib.decompress(b"".join(idat))
    raw = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.empty((height, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(height):
        line = raw[y, 1:].copy()
        prev = out[y - 1] if y else zero_row
        f = filters[y]
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else np.uint8(0)
                c = prev[x - bpp] if x >= bpp else np.uint8(0)
                line[x] = (int(line[x]) + int(_paeth(np.uint8(a), prev[x], np.uint8(c)))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
    if bit_depth == 16:
        arr = out.reshape(height, width, channels, 2)
        arr = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
    else:
        arr = out.reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def write_png_16(path: str, arr: np.ndarray) -> None:
    """Encode (H, W[, C]) uint8/uint16 to PNG (filter 0 rows)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = 0 if c == 1 else 2
    if c not in (1, 3):
        raise ValueError(f"unsupported channel count {c}")
    depth = 16 if arr.dtype == np.uint16 else 8
    if depth == 16:
        payload = arr.astype(">u2").tobytes()
        stride = w * c * 2
    else:
        payload = arr.astype(np.uint8).tobytes()
        stride = w * c
    rows = b"".join(
        b"\x00" + payload[y * stride : (y + 1) * stride] for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    png = (_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
