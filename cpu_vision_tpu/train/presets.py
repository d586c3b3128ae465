"""Weight-linked transform presets (reference ``transforms/_presets.py``):
``ImageClassification`` eval preset (:38) and the classification training
recipe preset (``references/classification/presets.py``)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from .. import transforms as T

__all__ = [
    "BatchedImageClassificationTrain",
    "ImageClassificationEval",
    "ImageClassificationTrain",
    "ObjectDetectionEval",
    "SemanticSegmentationEval",
    "VideoClassificationEval",
    "OpticalFlowEval",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def ImageClassificationEval(
    crop_size: int = 224,
    resize_size: int = 256,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    interpolation: str = "bilinear",
) -> T.Compose:
    """Resize-shorter → center crop → float scale → normalize (reference
    ``ImageClassification.forward``, ``transforms/_presets.py:38-69``)."""
    return T.Compose(
        [
            T.Resize(resize_size, interpolation=interpolation),
            T.CenterCrop(crop_size),
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize(mean, std),
        ]
    )


def ImageClassificationTrain(
    crop_size: int = 224,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    hflip_prob: float = 0.5,
    auto_augment: Optional[str] = None,
    random_erase_prob: float = 0.0,
) -> T.Compose:
    """RandomResizedCrop + flip (+AutoAugment/RandAugment/TrivialAugment)
    (reference ``references/classification/presets.py:ClassificationPresetTrain``)."""
    ts = [T.RandomResizedCrop(crop_size)]
    if hflip_prob > 0:
        ts.append(T.RandomHorizontalFlip(hflip_prob))
    if auto_augment == "ra":
        ts.append(T.RandAugment())
    elif auto_augment == "ta_wide":
        ts.append(T.TrivialAugmentWide())
    elif auto_augment == "augmix":
        ts.append(T.AugMix())
    elif auto_augment == "imagenet":
        ts.append(T.AutoAugment("imagenet"))
    ts.append(T.ToDtype(jnp.float32, scale=True))
    ts.append(T.Normalize(mean, std))
    if random_erase_prob > 0:
        ts.append(T.RandomErasing(p=random_erase_prob))
    return T.Compose(ts)


def ObjectDetectionEval() -> T.Compose:
    """Detection eval preset (reference ``ObjectDetection``,
    ``transforms/_presets.py``): uint8 -> scaled float (resizing lives in
    GeneralizedRCNNTransform)."""
    return T.Compose([T.ToDtype(jnp.float32, scale=True)])


def SemanticSegmentationEval(resize_size: int = 520) -> T.Compose:
    """Segmentation eval preset (reference ``SemanticSegmentation``)."""
    return T.Compose(
        [
            T.Resize(resize_size),
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize(IMAGENET_MEAN, IMAGENET_STD),
        ]
    )


def VideoClassificationEval(
    crop_size: int = 112,
    resize_size: int = 128,
    mean: Sequence[float] = (0.43216, 0.394666, 0.37645),
    std: Sequence[float] = (0.22803, 0.22145, 0.216989),
) -> T.Compose:
    """Video eval preset (reference ``VideoClassification``): applied to
    Video arrays (NTHWC); resize/crop act frame-wise via the Video kernels."""
    return T.Compose(
        [
            T.Resize(resize_size),
            T.CenterCrop(crop_size),
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize(mean, std),
        ]
    )


def OpticalFlowEval() -> T.Compose:
    """Optical-flow eval preset (reference ``OpticalFlow``,
    ``transforms/_presets.py:190-208``): uint8 -> float in [-1, 1].
    Apply to each image of the (img1, img2) pair."""
    return T.Compose(
        [
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        ]
    )


class BatchedImageClassificationTrain:
    """Whole-batch training augmentation as ONE jitted device program.

    The v1 recipe preset (:func:`ImageClassificationTrain`) matches the
    reference's per-image host loop (``references/classification/presets.py``)
    — faithful, but on TPU each image costs a host->device round trip and
    ``RandomResizedCrop``'s python-int crop shapes retrigger compilation.
    This preset is the TPU-native counterpart: pad -> per-sample random
    crop (static output shape, ``vmap``-ed ``dynamic_slice``) -> per-sample
    horizontal flip -> scale -> normalize, traced once for the whole
    (N, H, W, C) uint8 batch.  Augmentation semantics follow the CIFAR
    recipe (pad-and-crop + flip) rather than Inception-style scale jitter,
    trading a little diversity for static shapes.
    """

    def __init__(self, crop_size: int, mean: Sequence[float] = IMAGENET_MEAN,
                 std: Sequence[float] = IMAGENET_STD, hflip_prob: float = 0.5,
                 pad: int = 4):
        import functools

        import jax
        from jax import lax

        self.crop_size = crop_size
        mean_a = jnp.asarray(mean, jnp.float32) * 255.0
        std_a = jnp.asarray(std, jnp.float32) * 255.0

        @functools.partial(jax.jit, static_argnums=())
        def _apply(batch, key):
            n, h, w, c = batch.shape
            kf, kc = jax.random.split(key)
            x = jnp.pad(batch, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
            tl = jax.random.randint(kc, (n, 2), 0, h + 2 * pad - crop_size + 1)

            def crop_one(img, t):
                return lax.dynamic_slice(img, (t[0], t[1], 0), (crop_size, crop_size, c))

            x = jax.vmap(crop_one)(x, tl)
            flip = jax.random.bernoulli(kf, hflip_prob, (n,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
            return (x.astype(jnp.float32) - mean_a) / std_a

        self._apply = _apply

    def __call__(self, batch, key):
        return self._apply(batch, key)
