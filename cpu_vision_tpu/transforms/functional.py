"""Typed functional transforms.

Each functional dispatches on input type (Image / Video / Mask /
BoundingBoxes) like the reference's v2 functionals
(``transforms/v2/functional/``): images get the real kernel from
``cpu_vision_tpu.ops``; masks ride the image geometry kernels with nearest
interpolation and zero fill; bounding boxes get coordinate math + canvas
updates (``v2/functional/_geometry.py``); color ops pass boxes/masks through
untouched.

All geometry is channels-last; sizes are (height, width) static ints.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import ops
from .._dtype import to_dtype as _to_dtype_arr
from ..tv_arrays import BoundingBoxes, Image, Mask, TVArray, Video, wrap
from ._registry import dispatch, register_kernel


def __getattr__(name):
    # Reference exports InterpolationMode from the functional namespace too
    # (torchvision transforms/v2/functional/__init__.py:4). Lazy to avoid a
    # circular import with the package __init__ where the class lives.
    if name == "InterpolationMode":
        from . import InterpolationMode

        return InterpolationMode
    raise AttributeError(name)


__all__ = [
    "InterpolationMode",
    "hflip",
    "vflip",
    "to_image",
    "to_tensor",
    "pil_to_tensor",
    "convert_image_dtype",
    "horizontal_flip",
    "vertical_flip",
    "resize",
    "crop",
    "center_crop",
    "resized_crop",
    "pad",
    "affine",
    "rotate",
    "perspective",
    "elastic",
    "gaussian_blur",
    "gaussian_noise",
    "adjust_brightness",
    "adjust_contrast",
    "adjust_saturation",
    "adjust_hue",
    "adjust_gamma",
    "adjust_sharpness",
    "posterize",
    "solarize",
    "autocontrast",
    "equalize",
    "invert",
    "rgb_to_grayscale",
    "normalize",
    "to_dtype",
    "erase",
    "convert_bounding_box_format",
    "clamp_bounding_boxes",
    "sanitize_bounding_boxes_mask",
    "get_size",
]


# --------------------------------------------------------------- helpers


def get_size(inpt) -> Tuple[int, int]:
    """(height, width) of any TV input."""
    if isinstance(inpt, BoundingBoxes):
        return tuple(inpt.canvas_size)
    data = inpt.data if isinstance(inpt, TVArray) else jnp.asarray(inpt)
    if isinstance(inpt, Mask):
        # HW, NHW or NHWC mask: heuristics — trailing dims (H, W) unless 4D
        if data.ndim == 2:
            return data.shape[0], data.shape[1]
        if data.ndim == 3:
            return data.shape[1], data.shape[2]
        return data.shape[-3], data.shape[-2]
    if isinstance(inpt, Video):
        return data.shape[-3], data.shape[-2]
    if data.ndim == 2:
        return data.shape[0], data.shape[1]
    return data.shape[-3], data.shape[-2]


def _mask_as_image(data):
    """Mask (HW / NHW) -> image-kernel-compatible array + restore fn."""
    if data.ndim == 2:
        return data[:, :, None], lambda x: x[:, :, 0]
    if data.ndim == 3:  # NHW: instance masks -> treat N as channels? No:
        # put instances in the channel dim so spatial ops act per-mask
        return jnp.moveaxis(data, 0, -1), lambda x: jnp.moveaxis(x, -1, 0)
    return data, lambda x: x


def _xyxy(boxes: BoundingBoxes) -> jax.Array:
    return ops.box_convert(boxes.data, boxes.format, "xyxy")


def _from_xyxy(data, boxes: BoundingBoxes, canvas_size=None):
    out = ops.box_convert(data, "xyxy", boxes.format)
    return BoundingBoxes(out, boxes.format, tuple(canvas_size or boxes.canvas_size))


def _video_as_image(data):
    """Video (...THWC) -> NHWC by folding time into batch."""
    lead = data.shape[:-3]
    flat = data.reshape((-1,) + data.shape[-3:])
    return flat, lambda x: x.reshape(lead + x.shape[-3:])


def _typed(image_kernel, bbox_kernel=None, mask_kernel=None, video_from_image=True):
    """Build a dispatched functional from per-type kernels."""

    def base(inpt, *a, **k):
        raise NotImplementedError

    base.__name__ = image_kernel.__name__.lstrip("_")
    fn = dispatch(base)
    register_kernel(fn, Image)(lambda im, *a, **k: Image(image_kernel(im.data, *a, **k)))
    if video_from_image:
        def _vid(v, *a, **k):
            flat, restore = _video_as_image(v.data)
            return Video(restore(image_kernel(flat, *a, **k)))

        register_kernel(fn, Video)(_vid)
    if bbox_kernel is not None:
        register_kernel(fn, BoundingBoxes)(bbox_kernel)
    if mask_kernel is not None:
        register_kernel(fn, Mask)(mask_kernel)
    return fn


# --------------------------------------------------------------- flips


def _hflip_image(img):
    return jnp.flip(img, axis=-2)  # W axis in (..., H, W, C)


def _hflip_bboxes(b: BoundingBoxes):
    h, w = b.canvas_size
    x1, y1, x2, y2 = jnp.moveaxis(_xyxy(b), -1, 0)
    flipped = jnp.stack([w - x2, y1, w - x1, y2], axis=-1)
    return _from_xyxy(flipped, b)


def _hflip_mask(m: Mask):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(jnp.flip(data, axis=-2)))


horizontal_flip = _typed(_hflip_image, _hflip_bboxes, _hflip_mask)


def _vflip_image(img):
    return jnp.flip(img, axis=-3)


def _vflip_bboxes(b: BoundingBoxes):
    h, w = b.canvas_size
    x1, y1, x2, y2 = jnp.moveaxis(_xyxy(b), -1, 0)
    flipped = jnp.stack([x1, h - y2, x2, h - y1], axis=-1)
    return _from_xyxy(flipped, b)


def _vflip_mask(m: Mask):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(jnp.flip(data, axis=-3)))


vertical_flip = _typed(_vflip_image, _vflip_bboxes, _vflip_mask)


# --------------------------------------------------------------- resize


def _resize_image(img, size, interpolation="bilinear", antialias=True):
    return ops.resize(img, size, interpolation, antialias)


def _resize_bboxes(b: BoundingBoxes, size, interpolation="bilinear", antialias=True):
    oh, ow = int(size[0]), int(size[1])
    h, w = b.canvas_size
    ratios = jnp.asarray([ow / w, oh / h, ow / w, oh / h], jnp.float32)
    return _from_xyxy(_xyxy(b) * ratios, b, canvas_size=(oh, ow))


def _resize_mask(m: Mask, size, interpolation="nearest", antialias=False):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(ops.resize(data, size, "nearest", False)))


resize = _typed(_resize_image, _resize_bboxes, _resize_mask)


# --------------------------------------------------------------- crop/pad


def _crop_image(img, top, left, height, width):
    h, w = (img.shape[-3], img.shape[-2]) if img.ndim >= 3 else img.shape
    # pad if the crop window exceeds the image (reference pads with 0)
    pt = max(0, -top)
    pl = max(0, -left)
    pb = max(0, top + height - h)
    pr = max(0, left + width - w)
    if pt or pl or pb or pr:
        img = ops.pad2d(img, (pl, pr, pt, pb), mode="constant", value=0)
        top, left = top + pt, left + pl
    if img.ndim == 2:
        return jax.lax.dynamic_slice(img, (top, left), (height, width))
    lead = img.shape[:-3]
    start = (0,) * len(lead) + (top, left, 0)
    sizes = lead + (height, width, img.shape[-1])
    return jax.lax.dynamic_slice(img, start, sizes)


def _crop_bboxes(b: BoundingBoxes, top, left, height, width):
    shifted = _xyxy(b) - jnp.asarray([left, top, left, top], jnp.float32)
    # reference crop_bounding_boxes clamps to the new canvas
    # (v2/functional/_geometry.py:1345)
    shifted = jnp.clip(
        shifted,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([width, height, width, height], jnp.float32),
    )
    return _from_xyxy(shifted, b, canvas_size=(height, width))


def _crop_mask(m: Mask, top, left, height, width):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(_crop_image(data, top, left, height, width)))


crop = _typed(_crop_image, _crop_bboxes, _crop_mask)


def _center_crop_dims(h, w, ch, cw):
    # reference: crop_top = int(round((image_height - crop_height) / 2.0))
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return top, left


def _center_crop_image(img, output_size):
    ch, cw = (output_size, output_size) if isinstance(output_size, int) else output_size
    h, w = (img.shape[-3], img.shape[-2]) if img.ndim >= 3 else img.shape
    top, left = _center_crop_dims(h, w, ch, cw)
    return _crop_image(img, top, left, ch, cw)


def _center_crop_bboxes(b: BoundingBoxes, output_size):
    ch, cw = (output_size, output_size) if isinstance(output_size, int) else output_size
    h, w = b.canvas_size
    top, left = _center_crop_dims(h, w, ch, cw)
    return _crop_bboxes(b, top, left, ch, cw)


def _center_crop_mask(m: Mask, output_size):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(_center_crop_image(data, output_size)))


center_crop = _typed(_center_crop_image, _center_crop_bboxes, _center_crop_mask)


def _resized_crop_image(img, top, left, height, width, size, interpolation="bilinear", antialias=True):
    return _resize_image(_crop_image(img, top, left, height, width), size, interpolation, antialias)


def _resized_crop_bboxes(b, top, left, height, width, size, interpolation="bilinear", antialias=True):
    return _resize_bboxes(_crop_bboxes(b, top, left, height, width), size)


def _resized_crop_mask(m, top, left, height, width, size, interpolation="nearest", antialias=False):
    return _resize_mask(_crop_mask(m, top, left, height, width), size)


resized_crop = _typed(_resized_crop_image, _resized_crop_bboxes, _resized_crop_mask)


def _pad_image(img, padding, fill=0, padding_mode="constant"):
    l, t, r, b = _parse_pad(padding)
    return ops.pad2d(img, (l, r, t, b), mode=padding_mode, value=fill)


def _parse_pad(padding):
    """torch pad order: int | [pad] | [l/r, t/b] | [l, t, r, b]."""
    if isinstance(padding, int):
        return padding, padding, padding, padding
    if len(padding) == 1:
        return padding[0], padding[0], padding[0], padding[0]
    if len(padding) == 2:
        return padding[0], padding[1], padding[0], padding[1]
    return padding[0], padding[1], padding[2], padding[3]


def _pad_bboxes(b: BoundingBoxes, padding, fill=0, padding_mode="constant"):
    l, t, r, bt = _parse_pad(padding)
    h, w = b.canvas_size
    shifted = _xyxy(b) + jnp.asarray([l, t, l, t], jnp.float32)
    return _from_xyxy(shifted, b, canvas_size=(h + t + bt, w + l + r))


def _pad_mask(m: Mask, padding, fill=0, padding_mode="constant"):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(_pad_image(data, padding, fill, padding_mode)))


pad = _typed(_pad_image, _pad_bboxes, _pad_mask)


# --------------------------------------------------------------- affine family


def _affine_matrix(angle, translate, scale, shear, center):
    return ops.get_inverse_affine_matrix(center, angle, translate, scale, shear)


def _affine_image(img, angle=0.0, translate=(0, 0), scale=1.0, shear=(0.0, 0.0),
                  interpolation="nearest", fill=None, center=None):
    # default NEAREST like the reference (v2/functional/_geometry.py:384)
    h, w = (img.shape[-3], img.shape[-2]) if img.ndim >= 3 else img.shape
    ctr = (0.0, 0.0) if center is None else (center[0] - w * 0.5, center[1] - h * 0.5)
    matrix = _affine_matrix(angle, translate, scale, shear, ctr)
    return ops.affine(img, matrix, interpolation, fill)


def _forward_affine_coeffs(ctr, angle, translate, scale, shear):
    """Forward affine map coefficients (invert the reference's inverse
    2x3 matrix)."""
    a, bb, c0, d, e, f0 = ops.get_inverse_affine_matrix(
        tuple(ctr), angle, tuple(translate), scale, tuple(shear))
    det = a * e - bb * d
    fa, fb = e / det, -bb / det
    fd, fe = -d / det, a / det
    fc = -(fa * c0 + fb * f0)
    ff = -(fd * c0 + fe * f0)
    return fa, fb, fc, fd, fe, ff


def _affine_bboxes(b: BoundingBoxes, angle=0.0, translate=(0, 0), scale=1.0,
                   shear=(0.0, 0.0), interpolation="bilinear", fill=None, center=None,
                   _clamp=True):
    """Forward-transform the 4 corners, take the enclosing box, clamp to the
    canvas (reference ``_affine_bounding_boxes_with_expand``,
    ``v2/functional/_geometry.py:850`` — clamps at ``:841``).  ``_clamp=False``
    is for rotate-expand, which must clamp to the *expanded* canvas."""
    h, w = b.canvas_size
    ctr = (w * 0.5, h * 0.5) if center is None else tuple(center)
    fa, fb, fc, fd, fe, ff = _forward_affine_coeffs(ctr, angle, translate, scale, shear)
    xy = _xyxy(b)
    x1, y1, x2, y2 = jnp.moveaxis(xy, -1, 0)
    cx = jnp.stack([x1, x2, x1, x2], -1)
    cy = jnp.stack([y1, y1, y2, y2], -1)
    nx = fa * cx + fb * cy + fc
    ny = fd * cx + fe * cy + ff
    out = jnp.stack([nx.min(-1), ny.min(-1), nx.max(-1), ny.max(-1)], -1)
    res = _from_xyxy(out, b)
    return clamp_bounding_boxes(res) if _clamp else res


def _affine_mask(m: Mask, angle=0.0, translate=(0, 0), scale=1.0, shear=(0.0, 0.0),
                 interpolation="nearest", fill=None, center=None):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(_affine_image(data, angle, translate, scale, shear, "nearest", 0, center)))


affine = _typed(_affine_image, _affine_bboxes, _affine_mask)


def _rotate_image(img, angle, interpolation="nearest", expand=False, center=None, fill=None):
    return ops.rotate(img, angle, interpolation, expand, center, fill)


def _rotate_bboxes(b: BoundingBoxes, angle, interpolation="nearest", expand=False,
                   center=None, fill=None):
    h, w = b.canvas_size
    out = _affine_bboxes(b, angle=-angle, center=center, _clamp=not expand)
    if expand:
        # Mirror the reference's BBOX expand math exactly
        # (_affine_bounding_boxes_with_expand, _geometry.py:819-840): shift by
        # -min of the forward-transformed canvas corners, canvas size from the
        # ABSOLUTE-center inverse matrix. NB: the reference's bbox canvas can
        # differ from its own image canvas by 1px (f32 ceil/floor under
        # different matrix translation terms) — we reproduce the bbox path.
        ctr = (w * 0.5, h * 0.5) if center is None else tuple(center)
        fa, fb, fc, fd, fe, ff = _forward_affine_coeffs(ctr, -angle, (0.0, 0.0), 1.0, (0.0, 0.0))
        import numpy as _np

        corners = _np.array([[0.0, 0.0], [0.0, h], [w, h], [w, 0.0]], _np.float32)
        tx = float((fa * corners[:, 0] + fb * corners[:, 1] + fc).min())
        ty = float((fd * corners[:, 0] + fe * corners[:, 1] + ff).min())
        matrix = ops.get_inverse_affine_matrix(ctr, -angle, (0.0, 0.0), 1.0, (0.0, 0.0))
        ow, oh = ops.warp._compute_affine_output_size(matrix, w, h)
        shift = jnp.asarray([tx, ty] * 2, jnp.float32)
        out = BoundingBoxes(
            ops.box_convert(ops.box_convert(out.data, out.format, "xyxy") - shift, "xyxy", out.format),
            out.format,
            (oh, ow),
        )
        out = clamp_bounding_boxes(out)  # clamp to the EXPANDED canvas
    return out


def _rotate_mask(m: Mask, angle, interpolation="nearest", expand=False, center=None, fill=None):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(_rotate_image(data, angle, "nearest", expand, center, 0)))


rotate = _typed(_rotate_image, _rotate_bboxes, _rotate_mask)


def _perspective_image(img, coeffs, interpolation="bilinear", fill=None):
    return ops.perspective(img, coeffs, interpolation, fill)


def _perspective_bboxes(b: BoundingBoxes, coeffs, interpolation="bilinear", fill=None):
    """Forward-map corners with the inverse of the perspective coeffs."""
    import numpy as np

    c = list(coeffs)
    m = np.array([[c[0], c[1], c[2]], [c[3], c[4], c[5]], [c[6], c[7], 1.0]], np.float64)
    inv = np.linalg.inv(m).astype(np.float32)
    xy = _xyxy(b)
    x1, y1, x2, y2 = jnp.moveaxis(xy, -1, 0)
    cx = jnp.stack([x1, x2, x1, x2], -1)
    cy = jnp.stack([y1, y1, y2, y2], -1)
    denom = inv[2, 0] * cx + inv[2, 1] * cy + inv[2, 2]
    nx = (inv[0, 0] * cx + inv[0, 1] * cy + inv[0, 2]) / denom
    ny = (inv[1, 0] * cx + inv[1, 1] * cy + inv[1, 2]) / denom
    out = jnp.stack([nx.min(-1), ny.min(-1), nx.max(-1), ny.max(-1)], -1)
    # reference clamps perspective boxes to the canvas (_geometry.py:1661)
    return clamp_bounding_boxes(_from_xyxy(out, b))


def _perspective_mask(m: Mask, coeffs, interpolation="nearest", fill=None):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(_perspective_image(data, coeffs, "nearest", 0)))


perspective = _typed(_perspective_image, _perspective_bboxes, _perspective_mask)


def _elastic_image(img, displacement, interpolation="bilinear", fill=None):
    return ops.elastic(img, displacement, interpolation, fill)


def _elastic_mask(m: Mask, displacement, interpolation="nearest", fill=None):
    data, restore = _mask_as_image(m.data)
    return Mask(restore(_elastic_image(data, displacement, "nearest", 0)))


elastic = _typed(_elastic_image, None, _elastic_mask)


# --------------------------------------------------------------- color


def _color_fn(op):
    def image_kernel(img, *a, **k):
        return op(img, *a, **k)

    image_kernel.__name__ = op.__name__
    return _typed(image_kernel)


gaussian_blur = _color_fn(ops.gaussian_blur)
adjust_brightness = _color_fn(ops.adjust_brightness)
adjust_contrast = _color_fn(ops.adjust_contrast)
adjust_saturation = _color_fn(ops.adjust_saturation)
adjust_hue = _color_fn(ops.adjust_hue)
adjust_gamma = _color_fn(ops.adjust_gamma)
adjust_sharpness = _color_fn(ops.adjust_sharpness)
posterize = _color_fn(ops.posterize)
solarize = _color_fn(ops.solarize)
autocontrast = _color_fn(ops.autocontrast)
equalize = _color_fn(ops.equalize)
invert = _color_fn(ops.invert)
rgb_to_grayscale = _color_fn(ops.rgb_to_grayscale)
normalize = _color_fn(ops.normalize)


def _gaussian_noise_image(img, key, mean=0.0, sigma=0.1, clip=True):
    """Additive gaussian noise on float images (reference
    ``gaussian_noise``, v2)."""
    noise = mean + jax.random.normal(key, jnp.shape(img), jnp.asarray(img).dtype) * sigma
    out = jnp.asarray(img) + noise
    return jnp.clip(out, 0.0, 1.0) if clip else out


gaussian_noise = _typed(_gaussian_noise_image)


# --------------------------------------------------------------- misc


def _to_dtype_image(img, dtype, scale=False):
    return _to_dtype_arr(img, dtype, scale)


def _to_dtype_mask(m: Mask, dtype, scale=False):
    # reference to_dtype converts mask dtype WITHOUT value scaling
    return Mask(m.data.astype(dtype))


to_dtype = _typed(_to_dtype_image, mask_kernel=_to_dtype_mask)


def _erase_image(img, i, j, h, w, v):
    region = jnp.broadcast_to(jnp.asarray(v, jnp.asarray(img).dtype), (h, w, img.shape[-1]) if img.ndim >= 3 else (h, w))
    if img.ndim == 2:
        return jax.lax.dynamic_update_slice(img, region, (i, j))
    lead = img.shape[:-3]
    region_b = jnp.broadcast_to(region, lead + region.shape)
    start = (0,) * len(lead) + (i, j, 0)
    return jax.lax.dynamic_update_slice(img, region_b, start)


erase = _typed(_erase_image)


# --------------------------------------------------------------- boxes only


def convert_bounding_box_format(boxes: BoundingBoxes, new_format: str) -> BoundingBoxes:
    return BoundingBoxes(
        ops.box_convert(boxes.data, boxes.format, new_format), new_format, tuple(boxes.canvas_size)
    )


def clamp_bounding_boxes(boxes: BoundingBoxes) -> BoundingBoxes:
    h, w = boxes.canvas_size
    xyxy = ops.box_convert(boxes.data, boxes.format, "xyxy")
    clamped = ops.clip_boxes_to_image(xyxy, (h, w))
    return BoundingBoxes(
        ops.box_convert(clamped, "xyxy", boxes.format), boxes.format, tuple(boxes.canvas_size)
    )


# ------------------------------------------------- v1-compat aliases
# the reference's v1 functional API names (``transforms/functional.py``)
hflip = None  # assigned below (module-level aliasing after defs)


def to_image(pic) -> Image:
    """PIL image / numpy array -> :class:`Image` (v1 ``to_tensor`` analog,
    without the value rescale — use ``to_dtype(..., scale=True)`` for that)."""
    import numpy as np

    try:
        from PIL import Image as PILImage

        if isinstance(pic, PILImage.Image):
            return Image(jnp.asarray(np.asarray(pic)))
    except ImportError:
        pass
    return Image(jnp.asarray(pic))


def to_tensor(pic) -> jax.Array:
    """v1 ``to_tensor``: HWC any -> float CHW in torch; here HWC float in
    [0, 1] (layout stays channels-last — the TPU-native convention)."""
    img = to_image(pic).data
    return _to_dtype_arr(img, jnp.float32, scale=True)


def pil_to_tensor(pic) -> jax.Array:
    """v1 ``pil_to_tensor``: no value scaling."""
    return to_image(pic).data


def sanitize_bounding_boxes_mask(boxes: BoundingBoxes, min_size: float = 1.0, min_area: float = 1.0):
    """Validity mask for degenerate boxes (reference
    ``SanitizeBoundingBoxes``, ``v2/_misc.py:342``): inside canvas, both
    sides >= min_size, area >= min_area.  Returns a bool mask (fixed-shape
    analog of the reference's filtering)."""
    h, w = boxes.canvas_size
    xyxy = ops.box_convert(boxes.data, boxes.format, "xyxy")
    ws = xyxy[..., 2] - xyxy[..., 0]
    hs = xyxy[..., 3] - xyxy[..., 1]
    ok = (ws >= min_size) & (hs >= min_size) & (ws * hs >= min_area)
    ok &= (xyxy[..., 0] < w) & (xyxy[..., 1] < h) & (xyxy[..., 2] > 0) & (xyxy[..., 3] > 0)
    return ok


# module-level v1 aliases (reference v1 functional names)
hflip = horizontal_flip
vflip = vertical_flip
adjust_color = adjust_saturation
convert_image_dtype = to_dtype


# ------------------------------------------------- remaining reference names
# (reference ``transforms/v2/functional/__init__.py`` exports not covered by
# the dispatched tier above)


def _elastic_bboxes(b: BoundingBoxes, displacement, interpolation="bilinear",
                    fill=None):
    """Approximate-inverse corner mapping (reference ``elastic_bounding_boxes``,
    ``v2/functional/_geometry.py:1834-1890``): sample ``id_grid -
    displacement`` at the (ceiled) box corners, take the min/max envelope."""
    h, w = b.canvas_size
    disp = jnp.asarray(displacement, jnp.float32)[0]  # (H, W, 2)
    xyxy = _xyxy(b).reshape(-1, 4)
    corners = jnp.stack(
        [xyxy[:, jnp.asarray([0, 1])], xyxy[:, jnp.asarray([2, 1])],
         xyxy[:, jnp.asarray([2, 3])], xyxy[:, jnp.asarray([0, 3])]], axis=1,
    ).reshape(-1, 2)
    idx = jnp.ceil(corners).astype(jnp.int32)
    ix = jnp.clip(idx[:, 0], 0, w - 1)
    iy = jnp.clip(idx[:, 1], 0, h - 1)
    # identity grid matching ops.elastic (align_corners=False, +0.5 centres)
    gx = (ix.astype(jnp.float32) + 0.5) / w * 2.0 - 1.0
    gy = (iy.astype(jnp.float32) + 0.5) / h * 2.0 - 1.0
    inv = jnp.stack([gx, gy], axis=-1) - disp[iy, ix]
    size = jnp.asarray([w, h], jnp.float32)
    pts = (inv + 1.0) * 0.5 * size - 0.5
    pts = pts.reshape(-1, 4, 2)
    mins = jnp.min(pts, axis=1)
    maxs = jnp.max(pts, axis=1)
    out = jnp.concatenate([mins, maxs], axis=-1).reshape(b.data.shape[:-1] + (4,))
    out = jnp.stack([
        jnp.clip(out[..., 0], 0, w), jnp.clip(out[..., 1], 0, h),
        jnp.clip(out[..., 2], 0, w), jnp.clip(out[..., 3], 0, h)], axis=-1)
    return _from_xyxy(out.astype(b.data.dtype), b)


register_kernel(elastic, BoundingBoxes)(_elastic_bboxes)
elastic_transform = elastic  # reference alias (``_geometry.py:elastic_transform``)


def five_crop(inpt, size):
    """Four corners + centre (reference ``five_crop``,
    ``v2/functional/_geometry.py:2163``); returns a 5-tuple."""
    ch, cw = (size, size) if isinstance(size, int) else tuple(size)
    h, w = get_size(inpt)
    if ch > h or cw > w:
        raise ValueError(f"crop size {(ch, cw)} larger than image {(h, w)}")
    return (
        crop(inpt, 0, 0, ch, cw),
        crop(inpt, 0, w - cw, ch, cw),
        crop(inpt, h - ch, 0, ch, cw),
        crop(inpt, h - ch, w - cw, ch, cw),
        center_crop(inpt, (ch, cw)),
    )


def ten_crop(inpt, size, vertical_flip: bool = False):
    """``five_crop`` of the input + of its flip (reference ``ten_crop``,
    ``_geometry.py:2246``)."""
    first = five_crop(inpt, size)
    flipped = vflip(inpt) if vertical_flip else hflip(inpt)
    return first + five_crop(flipped, size)


def get_num_channels(inpt) -> int:
    """(reference ``get_num_channels``, ``v2/functional/_meta.py:100``)."""
    data = inpt.data if isinstance(inpt, TVArray) else jnp.asarray(inpt)
    return 1 if data.ndim == 2 else int(data.shape[-1])


def get_dimensions(inpt):
    """[C, H, W] (reference ``get_dimensions``, ``_meta.py:75``)."""
    h, w = get_size(inpt)
    return [get_num_channels(inpt), h, w]


def get_image_size(inpt):
    """v1 name: [W, H] (reference ``_functional_tensor.py:get_image_size``)."""
    h, w = get_size(inpt)
    return [w, h]


def get_num_frames(inpt) -> int:
    """Leading (time) dim of a video (reference ``get_num_frames``,
    ``_meta.py:118``)."""
    data = inpt.data if isinstance(inpt, TVArray) else jnp.asarray(inpt)
    return int(data.shape[0])


get_image_num_channels = get_num_channels  # v1 alias


def is_pure_tensor(inpt) -> bool:
    """Array that is not a TV-typed wrapper (reference ``is_pure_tensor``)."""
    import numpy as _np

    return isinstance(inpt, (jax.Array, _np.ndarray)) and not isinstance(inpt, TVArray)


def _grayscale_to_rgb_image(img):
    if img.shape[-1] == 3:
        return img
    return jnp.repeat(img, 3, axis=-1)


grayscale_to_rgb = _typed(_grayscale_to_rgb_image)


def to_grayscale(inpt, num_output_channels: int = 1):
    """v1 alias of :func:`rgb_to_grayscale` (reference ``_deprecated.py``)."""
    return rgb_to_grayscale(inpt, num_output_channels)


def _permute_channels_image(img, permutation):
    return jnp.take(img, jnp.asarray(permutation), axis=-1)


permute_channels = _typed(_permute_channels_image)


def uniform_temporal_subsample(inpt, num_samples: int):
    """Evenly pick frames along T (reference ``uniform_temporal_subsample``,
    ``v2/functional/_temporal.py:10``)."""
    data = inpt.data if isinstance(inpt, TVArray) else jnp.asarray(inpt)
    t = data.shape[0]
    idx = jnp.linspace(0, t - 1, num_samples).round().astype(jnp.int32)
    out = jnp.take(data, idx, axis=0)
    return wrap(out, inpt) if isinstance(inpt, TVArray) else out


def jpeg(inpt, quality: int):
    """JPEG round-trip compression artifact (reference ``jpeg``,
    ``v2/functional/_augment.py:57``): host-side via the native codec."""
    import numpy as _np

    from ..io import decode_jpeg, encode_jpeg

    data = inpt.data if isinstance(inpt, TVArray) else inpt
    arr = _np.asarray(data)
    if arr.dtype != _np.uint8:
        raise TypeError(f"jpeg expects uint8 images, got {arr.dtype}")
    flat = arr.reshape((-1,) + arr.shape[-3:]) if arr.ndim > 3 else arr[None]
    out = _np.stack([decode_jpeg(encode_jpeg(f, quality=quality)).reshape(f.shape)
                     for f in flat])
    out = jnp.asarray(out.reshape(arr.shape))
    return wrap(out, inpt) if isinstance(inpt, TVArray) else out


def sanitize_bounding_boxes(boxes, format=None, canvas_size=None,
                            min_size: float = 1.0, min_area: float = 1.0):
    """Functional form of ``SanitizeBoundingBoxes`` (reference
    ``v2/functional/_misc.py:sanitize_bounding_boxes``).  Static-shape
    variant: returns (boxes-with-invalid-rows-zeroed, validity mask) instead
    of filtering rows."""
    if not isinstance(boxes, BoundingBoxes):
        boxes = BoundingBoxes(boxes, format, tuple(canvas_size))
    clamped = clamp_bounding_boxes(boxes)
    ok = sanitize_bounding_boxes_mask(clamped, min_size, min_area)
    data = jnp.where(ok[..., None], clamped.data, 0.0)
    return BoundingBoxes(data, clamped.format, tuple(clamped.canvas_size)), ok


def to_pil_image(inpt):
    """Array -> PIL (reference v1 ``to_pil_image``)."""
    import numpy as _np
    from PIL import Image as PILImage

    arr = _np.asarray(inpt.data if isinstance(inpt, TVArray) else inpt)
    if arr.dtype != _np.uint8:
        arr = (_np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(_np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    return PILImage.fromarray(arr)


# ---------------------------- reference per-type kernel names (auto-aliased)

_TYPE_SUFFIX = [(Image, "image"), (Video, "video"), (Mask, "mask"),
                (BoundingBoxes, "bounding_boxes")]
# geometry kernels whose reference form returns (boxes, canvas_size)
_BBOX_TUPLE_RETURN = {"resize", "rotate", "pad", "crop", "center_crop",
                      "resized_crop"}


def _make_kernel_alias(fn, name, suffix):
    if suffix == "bounding_boxes":
        def alias(inpt, format, canvas_size, *a, **k):
            out = fn(BoundingBoxes(inpt, format, tuple(canvas_size)), *a, **k)
            if name in _BBOX_TUPLE_RETURN:
                return out.data, tuple(out.canvas_size)
            return out.data
    elif suffix == "mask":
        def alias(inpt, *a, **k):
            return fn(Mask(jnp.asarray(inpt)), *a, **k).data
    elif suffix == "video":
        def alias(inpt, *a, **k):
            return fn(Video(jnp.asarray(inpt)), *a, **k).data
    else:
        def alias(inpt, *a, **k):
            return fn(jnp.asarray(inpt), *a, **k)
    alias.__name__ = f"{name}_{suffix}"
    alias.__doc__ = (f"Per-type kernel (reference ``{name}_{suffix}``): plain-"
                     f"array form of :func:`{name}` for this input type.")
    return alias


def _install_kernel_aliases():
    from ._registry import _KERNEL_REGISTRY

    g = globals()
    skip = {"hflip", "vflip", "adjust_color", "convert_image_dtype",
            "elastic_transform"}  # alias names; reference suffixes canonical ones
    for name in list(g):
        fn = g[name]
        if name in skip or not (callable(fn)
                                and getattr(fn, "_is_typed_functional", False)):
            continue
        table = _KERNEL_REGISTRY.get(fn, {})
        for t, suffix in _TYPE_SUFFIX:
            if t in table and f"{name}_{suffix}" not in g:
                g[f"{name}_{suffix}"] = _make_kernel_alias(fn, name, suffix)
    # v1-suffixed names the reference keeps for to_dtype under its old name
    g.setdefault("to_dtype_image", _make_kernel_alias(to_dtype, "to_dtype", "image"))
    g.setdefault("to_dtype_video", _make_kernel_alias(to_dtype, "to_dtype", "video"))
    # five/ten crop per-type forms (images/videos share the array path)
    g.setdefault("five_crop_image", lambda x, size: five_crop(jnp.asarray(x), size))
    g.setdefault("five_crop_video", lambda x, size: five_crop(Video(jnp.asarray(x)), size))
    g.setdefault("ten_crop_image",
                 lambda x, size, vertical_flip=False: ten_crop(jnp.asarray(x), size, vertical_flip))
    g.setdefault("ten_crop_video",
                 lambda x, size, vertical_flip=False: ten_crop(Video(jnp.asarray(x)), size, vertical_flip))
    g.setdefault("jpeg_image", lambda x, quality: jpeg(x, quality))
    g.setdefault("jpeg_video", lambda x, quality: jpeg(x, quality))
    g.setdefault("uniform_temporal_subsample_video",
                 lambda x, n: uniform_temporal_subsample(x, n))
    g.setdefault("grayscale_to_rgb_image", lambda x: _grayscale_to_rgb_image(jnp.asarray(x)))
    g.setdefault("permute_channels_image",
                 lambda x, permutation: _permute_channels_image(jnp.asarray(x), permutation))
    g.setdefault("permute_channels_video",
                 lambda x, permutation: _permute_channels_image(jnp.asarray(x), permutation))
    # size getters per type (reference _meta.py)
    g.setdefault("get_size_image", lambda x: list(get_size(x)))
    g.setdefault("get_size_video", lambda x: list(get_size(Video(jnp.asarray(x)))))
    g.setdefault("get_size_mask", lambda x: list(get_size(Mask(jnp.asarray(x)))))
    g.setdefault("get_size_bounding_boxes",
                 lambda x, format=None, canvas_size=None: list(canvas_size))
    g.setdefault("get_dimensions_image", lambda x: get_dimensions(x))
    g.setdefault("get_dimensions_video", lambda x: get_dimensions(x))
    g.setdefault("get_num_channels_image", lambda x: get_num_channels(x))
    g.setdefault("get_num_channels_video", lambda x: get_num_channels(x))
    g.setdefault("get_num_frames_video", lambda x: get_num_frames(x))


_install_kernel_aliases()
