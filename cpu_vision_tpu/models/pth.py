"""Torch-free reader for ``.pth`` checkpoint files.

Counterpart of the loading half of the reference's
``WeightsEnum.get_state_dict`` (``models/_api.py:89`` →
``torch.load(..., map_location="cpu")``): parses the torch-zip
serialization format (torch >= 1.6) directly — a zip archive holding
``<name>/data.pkl`` (a pickle whose tensors are persistent-ID references)
plus ``<name>/data/<key>`` raw little-endian storage blobs — with a
restricted unpickler, so the reference's published ``.pth`` files load
into plain NumPy arrays without torch installed.  Feed the result to the
matching ``torch_weights.*_from_torch`` converter.

Security note: ``find_class`` admits only the tensor-rebuild symbols and
containers; any other global in the pickle raises, which also guards
against arbitrary-code-execution pickles.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

__all__ = ["load_pth_state_dict"]

try:  # bfloat16 support rides ml_dtypes (shipped with jax)
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

# torch storage-class name -> numpy dtype (torch/serialization.py dtype map)
_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype("<f8"),
    "FloatStorage": np.dtype("<f4"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16


class _StorageRef:
    """A lazy handle to one raw storage blob inside the archive."""

    def __init__(self, dtype: np.dtype, data: bytes):
        self.dtype = dtype
        self.data = data


def _rebuild_tensor(storage: _StorageRef, storage_offset, size, stride, *unused):
    """``torch._utils._rebuild_tensor_v2`` semantics: view the flat storage
    at element ``storage_offset`` with ``size``/``stride`` in elements."""
    flat = np.frombuffer(storage.data, dtype=storage.dtype)
    if not size:
        return flat[storage_offset].copy()  # 0-d tensor
    itemsize = storage.dtype.itemsize
    byte_strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        flat[storage_offset:], shape=tuple(size), strides=byte_strides
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _ODict(dict):
    """Stand-in for collections.OrderedDict: a dict subclass, so pickle's
    BUILD opcode can attach instance state (state_dict()._metadata)."""


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


class _TorchUnpickler(pickle.Unpickler):
    """Admits only the symbols a tensor-only checkpoint pickle needs."""

    def __init__(self, file, archive: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._archive = archive
        self._prefix = prefix

    def find_class(self, module: str, name: str) -> Any:
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name == "_rebuild_from_type_v2":
            return _rebuild_from_type_v2
        if module == "torch" and name in _STORAGE_DTYPES:
            return ("storage_class", name)
        if module == "torch" and name == "Tensor":
            return ("tensor_class", name)
        if module == "torch.nn.parameter" and name == "Parameter":
            return ("tensor_class", name)
        if module == "collections" and name == "OrderedDict":
            return _ODict
        raise pickle.UnpicklingError(
            f"{module}.{name} is not allowed in a .pth state-dict pickle "
            "(only plain tensor checkpoints are supported)")

    def persistent_load(self, pid) -> _StorageRef:
        if not (isinstance(pid, tuple) and len(pid) >= 4 and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        storage_cls, key = pid[1], pid[2]
        if isinstance(storage_cls, tuple) and storage_cls[0] == "storage_class":
            dtype = _STORAGE_DTYPES.get(storage_cls[1])
        else:  # UntypedStorage path encodes the dtype differently
            dtype = None
        if dtype is None:
            raise pickle.UnpicklingError(
                f"unsupported storage type {storage_cls!r} in .pth file")
        data = self._archive.read(f"{self._prefix}data/{key}")
        return _StorageRef(dtype, data)


def _legacy_error() -> RuntimeError:
    return RuntimeError(
        ".pth file is in the legacy (pre-torch-1.6, non-zip) serialization "
        "format; re-save it with a modern torch (torch.save default) first")


def load_pth_state_dict(path_or_bytes) -> Dict[str, np.ndarray]:
    """Load a torch-saved ``.pth`` checkpoint into ``{key: np.ndarray}``
    without torch.  Accepts a file path or raw bytes.  Nested containers
    (e.g. ``{"model": state_dict, "epoch": n}``) are returned as saved.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        fobj = io.BytesIO(path_or_bytes)
    else:
        fobj = open(path_or_bytes, "rb")
    try:
        magic = fobj.read(4)
        fobj.seek(0)
        if magic[:2] != b"PK":
            if magic == struct.pack("<I", 0x1950A86A)[:4] or magic[:1] == b"\x80":
                raise _legacy_error()
            raise RuntimeError("not a .pth file (no zip magic)")
        with zipfile.ZipFile(fobj) as zf:
            names = zf.namelist()
            pkl_name = next((n for n in names if n.endswith("/data.pkl")), None)
            if pkl_name is None:
                if "data.pkl" in names:
                    pkl_name = "data.pkl"
                else:
                    raise RuntimeError(f"no data.pkl in archive ({names[:5]}...)")
            prefix = pkl_name[: -len("data.pkl")]
            bo_name = f"{prefix}byteorder"
            if bo_name in names and zf.read(bo_name).strip() != b"little":
                raise RuntimeError("big-endian .pth files are not supported")
            up = _TorchUnpickler(io.BytesIO(zf.read(pkl_name)), zf, prefix)
            return up.load()
    finally:
        fobj.close()
