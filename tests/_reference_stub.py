"""Process-wide singleton for the reference torchvision C-op schema stubs.

torch.library allows only ONE ``TORCH_LIBRARY`` ("DEF") registration per
namespace per process, so every test module that imports the live reference
source (test_reference_logits, test_detection_parity, ...) must share one
registration.  This helper owns it: the first caller defines all schemas any
of them need; later callers are no-ops.  IMPL registrations can be duplicated
and stay in the callers.
"""

from __future__ import annotations

import sys

REFERENCE = "/root/reference"

_STATE: dict = {}

_SCHEMAS = [
    "nms(Tensor dets, Tensor scores, float iou_threshold) -> Tensor",
    "roi_align(Tensor input, Tensor rois, float spatial_scale, int pooled_height,"
    " int pooled_width, int sampling_ratio, bool aligned) -> Tensor",
]


def stub_torchvision_schemas():
    """Idempotently register the C-op schemas the reference source expects.

    Returns the owning torch.library.Library (or None if another library in
    this process already owns the namespace — schemas are then assumed
    present)."""
    import torch

    if "lib" not in _STATE:
        try:
            _STATE["lib"] = torch.library.Library("torchvision", "DEF")
        except RuntimeError:
            _STATE["lib"] = None
        if _STATE["lib"] is not None:
            for s in _SCHEMAS:
                try:
                    _STATE["lib"].define(s)
                except Exception:
                    pass
    return _STATE["lib"]


def reference_path_added() -> bool:
    """Append /root/reference to sys.path (idempotent). Returns whether this
    call added it."""
    added = REFERENCE not in sys.path
    if added:
        sys.path.append(REFERENCE)
    return added


def cleanup_reference_path(added: bool) -> None:
    """Remove /root/reference from sys.path and purge the merged
    ``references`` namespace package so this repo's ``references/`` tree
    re-resolves cleanly for later tests."""
    if added and REFERENCE in sys.path:
        sys.path.remove(REFERENCE)
    for mod in [m for m in sys.modules
                if m == "references" or m.startswith("references.")]:
        del sys.modules[mod]
