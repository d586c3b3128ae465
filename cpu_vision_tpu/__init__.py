"""cpu_vision_tpu — a TPU-native computer-vision framework in JAX.

A ground-up rebuild of the capabilities of the reference CV library
(torchvision, see SURVEY.md) designed for TPU: NHWC layout, uint8 at rest /
float32-bf16 in compute, ``jit``/``vmap``/``pjit`` everywhere, fused Pallas
kernels on the hot stencil paths, and ``jax.sharding`` meshes instead of a
process-group communication backend.

Subpackages
-----------
``ops``         image kernels (filter/blur/edges/resize/warp/color), box and
                RoI ops, losses, NN building blocks, fused Pallas kernels
``transforms``  typed functional + class transform API (v2-style registry)
``models``      model zoo with a ``register_model``/``get_model`` registry
``parallel``    mesh construction, data/model-parallel training steps
``io``          image encode/decode
``datasets``    dataset abstractions and folder/ubiquitous datasets
``train``       training loop utilities (metrics, checkpointing)
"""

__version__ = "0.1.0"

from . import _dtype, _layout  # noqa: F401
from ._dtype import to_dtype  # noqa: F401

_API_USAGE_LOG: dict = {}


def _log_api_usage_once(obj) -> None:
    """Counterpart of the reference's ``_log_api_usage_once``
    (torchvision ``utils.py:619``): records first use of each public API."""
    name = f"{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', str(obj))}"
    _API_USAGE_LOG[name] = _API_USAGE_LOG.get(name, 0) + 1


# runtime backend selectors (reference ``torchvision/__init__.py:34-86``)
_image_backend = "native"  # native C++ codecs with PIL fallback
_video_backend = "mjpeg"   # native MJPEG-AVI / array / frame-dir layer


def set_image_backend(backend: str) -> None:
    """(reference ``set_image_backend``): this build decodes through the
    native C++ shim with PIL fallback; "PIL" forces the fallback."""
    global _image_backend
    if backend not in ("native", "PIL", "accimage"):
        raise ValueError(f"Invalid backend '{backend}'. Options are 'native', 'PIL' and 'accimage'")
    if backend == "accimage":
        raise RuntimeError("accimage is not available on this build")
    _image_backend = backend


def get_image_backend() -> str:
    return _image_backend


def set_video_backend(backend: str) -> None:
    """(reference ``set_video_backend``): only the native MJPEG layer exists
    (no pyav/ffmpeg in this runtime — see ``io/video.py``)."""
    global _video_backend
    if backend not in ("mjpeg", "pyav", "video_reader", "cuda"):
        raise ValueError("Invalid video backend '%s'. Options are 'mjpeg', 'pyav', 'video_reader' and 'cuda'" % backend)
    if backend == "pyav":
        try:
            import av  # noqa: F401  (optional compressed-video decoder)
        except ImportError:
            raise RuntimeError("video backend 'pyav' requires the av package, "
                               "not available on this build")
    elif backend == "video_reader":
        from .io import _ffmpeg

        if not _ffmpeg.available():
            raise RuntimeError(
                "video backend 'video_reader' requires the native ffmpeg shim, "
                "which could not be built on this host")
    elif backend != "mjpeg":
        raise RuntimeError(f"video backend {backend!r} requires NVDEC, not available on this build")
    _video_backend = backend


def get_video_backend() -> str:
    return _video_backend


def _is_tracing() -> bool:
    """(reference ``_is_tracing``): true inside a jax trace (the analogue of
    torch.jit tracing)."""
    import jax.core

    try:
        return not jax.core.trace_ctx.is_top_level()
    except AttributeError:  # pragma: no cover - other jax versions
        return False


def disable_beta_transforms_warning() -> None:
    """No-op (reference kept it as a BC stub after v2 transforms stabilised)."""
