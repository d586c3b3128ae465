"""Image encode/decode.

Counterpart of the reference's ``torchvision/io/image.py`` over its C++
``image`` extension (``csrc/io/image/image.cpp:16-38``): a native
libjpeg/libpng shim (``_codecs.cpp``, C ABI via ctypes) decodes on the host
into HWC uint8 NumPy buffers that feed straight into device transfers.
Falls back to PIL when the shim isn't built.

API: ``read_file``, ``decode_image``, ``decode_jpeg``, ``decode_png``,
``encode_jpeg``, ``encode_png``, ``write_jpeg``, ``write_png``,
``ImageReadMode`` (reference ``io/image.py:22-415``).
"""

from __future__ import annotations

import ctypes
import enum
import os
import subprocess
from typing import Optional, Union

import numpy as np

__all__ = [
    "ImageReadMode",
    "read_file",
    "write_file",
    "decode_image",
    "decode_jpeg",
    "decode_png",
    "decode_webp",
    "decode_avif",
    "decode_heic",
    "encode_jpeg",
    "encode_png",
    "read_image",
    "write_jpeg",
    "write_png",
]


class ImageReadMode(enum.Enum):
    """Reference ``ImageReadMode`` (``io/image.py:22``)."""

    UNCHANGED = 0
    GRAY = 1
    GRAY_ALPHA = 2
    RGB = 3
    RGB_ALPHA = 4


_LIB = None
_LIB_TRIED = False


def _so_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_codecs.so")


def _build_shim() -> bool:
    src = os.path.join(os.path.dirname(__file__), "_codecs.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _so_path(), src, "-ljpeg", "-lpng", "-lwebp"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load_lib():
    """Load (building if needed) the native codec shim; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    # feature flag (counterpart of the reference's TORCHVISION_USE_PNG/
    # JPEG/WEBP build switches, setup.py:16-33): 0 forces the PIL fallback
    if os.environ.get("CVT_USE_NATIVE_CODECS", "1") == "0":
        return None
    path = _so_path()
    src = os.path.join(os.path.dirname(__file__), "_codecs.cpp")
    stale = (os.path.exists(path) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(path))
    if (not os.path.exists(path) or stale) and not _build_shim():
        if not os.path.exists(path):
            return None
        if stale:
            # The shipped sources are newer than the binary and the rebuild
            # failed (no toolchain?): loading the old .so silently keeps the
            # old semantics of existing symbols — make the drift visible.
            import warnings

            warnings.warn(
                f"cpu_vision_tpu.io: _codecs.cpp is newer than {path} and the "
                "rebuild failed; loading the STALE binary (its behaviour may "
                "lag the shipped sources). Rebuild with g++ available, or set "
                "CVT_USE_NATIVE_CODECS=0 for the PIL fallback.",
                RuntimeWarning,
            )
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name in ("cvt_decode_jpeg", "cvt_decode_png", "cvt_decode_webp",
                 "cvt_decode_gif", "cvt_decode_image"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
    for name in ("cvt_encode_jpeg", "cvt_encode_png"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_size_t),
        ]
    try:
        fn = lib.cvt_decode_gif_frames
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
    except AttributeError:  # stale prebuilt .so without the symbol
        pass
    try:
        fn = lib.cvt_decode_png16
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
    except AttributeError:  # stale prebuilt .so without the symbol
        pass
    lib.cvt_free.restype = None
    lib.cvt_free.argtypes = [u8p]
    lib.cvt_sniff.restype = ctypes.c_int
    lib.cvt_sniff.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    _LIB = lib
    return _LIB


def read_file(path: str) -> bytes:
    """Raw bytes of a file (reference ``read_file``, ``io/image.py:46``)."""
    with open(path, "rb") as f:
        return f.read()


def write_file(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def _native_decode(fn_name: str, data: bytes) -> Optional[np.ndarray]:
    lib = _load_lib()
    if lib is None:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = getattr(lib, fn_name)(data, len(data), ctypes.byref(out), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"{fn_name} failed with code {rc}")
    n = h.value * w.value * c.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy().reshape(h.value, w.value, c.value)
    lib.cvt_free(out)
    return arr


def _pil_decode(data: bytes) -> np.ndarray:
    import io as _io

    from PIL import Image as PILImage

    img = PILImage.open(_io.BytesIO(data))
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _apply_mode(arr: np.ndarray, mode: ImageReadMode) -> np.ndarray:
    c = arr.shape[2]
    if mode == ImageReadMode.UNCHANGED:
        return arr
    if mode == ImageReadMode.GRAY:
        if c == 1:
            return arr
        if c == 2:  # gray + alpha
            return arr[:, :, :1]
        rgb = arr[:, :, :3].astype(np.float32)
        gray = 0.2989 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        return np.round(gray).astype(np.uint8)[:, :, None]
    if mode == ImageReadMode.RGB:
        if c == 3:
            return arr
        if c in (1, 2):  # gray / gray+alpha
            return np.repeat(arr[:, :, :1], 3, axis=2)
        return arr[:, :, :3]
    if mode == ImageReadMode.RGB_ALPHA:
        if c == 4:
            return arr
        rgb = _apply_mode(arr, ImageReadMode.RGB)
        if c == 2:  # carry the existing alpha channel
            return np.concatenate([rgb, arr[:, :, 1:2]], axis=2)
        alpha = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
        return np.concatenate([rgb, alpha], axis=2)
    if mode == ImageReadMode.GRAY_ALPHA:
        if c == 2:
            return arr
        gray = _apply_mode(arr, ImageReadMode.GRAY)
        alpha = (arr[:, :, 3:4] if c == 4
                 else np.full(gray.shape[:2] + (1,), 255, np.uint8))
        return np.concatenate([gray, alpha], axis=2)
    raise ValueError(f"unsupported mode {mode}")



def _exif_orientation(jpeg: bytes) -> int:
    """EXIF orientation tag (1-8; 0 if absent) from a JPEG's APP1 segment
    (reference ``csrc/io/image/cpu/exif.h``: same TIFF-IFD walk)."""
    import struct as _struct

    if len(jpeg) < 4 or jpeg[:2] != b"\xff\xd8":
        return 0
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            return 0
        marker = jpeg[pos + 1]
        (seglen,) = _struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = pos + 10
            if jpeg[tiff : tiff + 2] == b"II":
                endian = "<"
            elif jpeg[tiff : tiff + 2] == b"MM":
                endian = ">"
            else:
                return 0
            (ifd_off,) = _struct.unpack(endian + "I", jpeg[tiff + 4 : tiff + 8])
            ifd = tiff + ifd_off
            if ifd + 2 > len(jpeg):
                return 0
            (count,) = _struct.unpack(endian + "H", jpeg[ifd : ifd + 2])
            for i in range(count):
                e = ifd + 2 + 12 * i
                if e + 12 > len(jpeg):
                    return 0
                tag, typ = _struct.unpack(endian + "HH", jpeg[e : e + 4])
                if tag == 0x0112 and typ == 3:  # orientation, SHORT
                    (val,) = _struct.unpack(endian + "H", jpeg[e + 8 : e + 10])
                    return val if 1 <= val <= 8 else 0
            return 0
        if marker in (0xDA, 0xD9):  # start-of-scan / EOI: no EXIF coming
            return 0
        pos += 2 + seglen
    return 0


def _apply_exif_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Apply EXIF orientation 1-8 (reference ``exif.h`` transform table)."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1, :]
    if orientation == 5:
        return np.rot90(arr, k=-1)[:, ::-1]
    if orientation == 6:
        return np.rot90(arr, k=-1)
    if orientation == 7:
        return np.rot90(arr, k=1)[:, ::-1]
    if orientation == 8:
        return np.rot90(arr, k=1)
    return arr


def decode_image(data: Union[bytes, str], mode: ImageReadMode = ImageReadMode.UNCHANGED,
                 apply_exif_orientation: bool = False) -> np.ndarray:
    """Decode JPEG/PNG (magic-byte sniffing) to HWC uint8 (reference
    ``decode_image``, ``io/image.py:284``).  Accepts bytes or a path."""
    if isinstance(data, str):
        data = read_file(data)
    brand = _isobmff_brand(data)
    if brand in _AVIF_BRANDS or brand in _HEIF_BRANDS:
        from . import _heif_py

        return _apply_mode(_heif_py.decode(bytes(data)), mode)
    try:
        arr = _native_decode("cvt_decode_image", data)
    except ValueError:
        arr = None
    if arr is None:
        arr = _pil_decode(data)
    if apply_exif_orientation and data[:2] == b"\xff\xd8":
        arr = np.ascontiguousarray(_apply_exif_orientation(arr, _exif_orientation(data)))
    return _apply_mode(arr, mode)


def decode_jpeg(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED,
                apply_exif_orientation: bool = False) -> np.ndarray:
    arr = _native_decode("cvt_decode_jpeg", data)
    if arr is None:
        arr = _pil_decode(data)
    if apply_exif_orientation:
        arr = np.ascontiguousarray(_apply_exif_orientation(arr, _exif_orientation(data)))
    return _apply_mode(arr, mode)


def decode_png(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    arr = _native_decode("cvt_decode_png", data)
    if arr is None:
        arr = _pil_decode(data)
    return _apply_mode(arr, mode)


def decode_webp(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    arr = _native_decode("cvt_decode_webp", data)
    if arr is None:
        arr = _pil_decode(data)
    return _apply_mode(arr, mode)


_HEIF_BRANDS = {b"heic", b"heix", b"hevc", b"heim", b"heis", b"hevm",
                b"hevs", b"mif1", b"msf1"}
_AVIF_BRANDS = {b"avif", b"avis"}


def _isobmff_brand(data: bytes) -> bytes:
    """Major brand of an ISO-BMFF (ftyp) container, or b'' if not one."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return data[8:12]
    return b""


def decode_avif(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    """AVIF bytes -> HWC uint8 (reference ``decode_avif`` over libavif,
    ``csrc/io/image/cpu/decode_avif.cpp``; here the libheif shim with its
    dav1d backend, ``io/_heif.cpp``)."""
    from . import _heif_py

    return _apply_mode(_heif_py.decode(bytes(data)), mode)


def decode_heic(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    """HEIC bytes -> HWC uint8 (reference ``decode_heic`` over libheif,
    ``csrc/io/image/cpu/decode_heic.cpp``; here the same libheif through
    ``io/_heif.cpp``)."""
    from . import _heif_py

    return _apply_mode(_heif_py.decode(bytes(data)), mode)


def _native_decode_gif_frames(data: bytes) -> Optional[np.ndarray]:
    """(N, H, W, 3) uint8 from the native shim, or None if unavailable."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "cvt_decode_gif_frames"):
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = u8p()
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.cvt_decode_gif_frames(
        data, len(data), ctypes.byref(out), ctypes.byref(n),
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"cvt_decode_gif_frames failed with code {rc}")
    total = n.value * h.value * w.value * c.value
    arr = np.ctypeslib.as_array(out, shape=(total,)).copy().reshape(
        n.value, h.value, w.value, c.value)
    lib.cvt_free(out)
    return arr


def _pil_decode_gif_frames(data: bytes) -> np.ndarray:
    """PIL fallback: every frame composited, (N, H, W, 3) uint8."""
    import io as _io

    from PIL import Image as PILImage, ImageSequence

    img = PILImage.open(_io.BytesIO(data))
    frames = [np.asarray(f.convert("RGB")) for f in ImageSequence.Iterator(img)]
    return np.stack(frames, axis=0)


def decode_gif(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    """GIF bytes -> uint8 RGB frames composited onto the logical canvas:
    (N, H, W, C) for animated GIFs, squeezed to (H, W, C) when there is a
    single frame — the NHWC counterpart of the reference ``decode_gif``
    over vendored giflib (``csrc/io/image/cpu/decode_gif.cpp:55-160``:
    DISPOSE_DO_NOT / background disposal, GIF89a transparency, squeeze on
    one frame); here a self-contained LZW decoder in ``_codecs.cpp``."""
    frames = _native_decode_gif_frames(data)
    if frames is None:
        frames = _pil_decode_gif_frames(data)
    out = np.stack([_apply_mode(f, mode) for f in frames], axis=0)
    return out[0] if out.shape[0] == 1 else out


def _as_hwc_u8(image) -> np.ndarray:
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise TypeError(f"expected uint8 image, got {arr.dtype}")
    return np.ascontiguousarray(arr)


def encode_jpeg(image, quality: int = 75) -> bytes:
    """HWC uint8 -> JPEG bytes (reference ``encode_jpeg``)."""
    arr = _as_hwc_u8(image)
    lib = _load_lib()
    if lib is not None:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        out = u8p()
        out_len = ctypes.c_size_t()
        rc = lib.cvt_encode_jpeg(
            arr.tobytes(), arr.shape[0], arr.shape[1], arr.shape[2], quality,
            ctypes.byref(out), ctypes.byref(out_len),
        )
        if rc != 0:
            raise ValueError(f"encode_jpeg failed with code {rc}")
        data = ctypes.string_at(out, out_len.value)
        lib.cvt_free(out)
        return data
    import io as _io

    from PIL import Image as PILImage

    buf = _io.BytesIO()
    PILImage.fromarray(arr[:, :, 0] if arr.shape[2] == 1 else arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def encode_png(image, compression_level: int = 6) -> bytes:
    """HWC uint8 -> PNG bytes (reference ``encode_png``)."""
    arr = _as_hwc_u8(image)
    lib = _load_lib()
    if lib is not None:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        out = u8p()
        out_len = ctypes.c_size_t()
        rc = lib.cvt_encode_png(
            arr.tobytes(), arr.shape[0], arr.shape[1], arr.shape[2], compression_level,
            ctypes.byref(out), ctypes.byref(out_len),
        )
        if rc != 0:
            raise ValueError(f"encode_png failed with code {rc}")
        data = ctypes.string_at(out, out_len.value)
        lib.cvt_free(out)
        return data
    import io as _io

    from PIL import Image as PILImage

    buf = _io.BytesIO()
    PILImage.fromarray(arr[:, :, 0] if arr.shape[2] == 1 else arr).save(buf, "PNG")
    return buf.getvalue()


def read_image(path: str, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    return decode_image(read_file(path), mode)


def write_jpeg(image, path: str, quality: int = 75) -> None:
    write_file(path, encode_jpeg(image, quality))


def write_png(image, path: str, compression_level: int = 6) -> None:
    write_file(path, encode_png(image, compression_level))
