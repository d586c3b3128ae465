"""Clip samplers namespace (reference ``torchvision/datasets/samplers/
clip_sampler.py``): re-exports the clip samplers from ``video_utils`` and
``DistributedSampler`` from the loader, under the reference's module path."""

from ..loader import DistributedSampler  # noqa: F401
from ..video_utils import RandomClipSampler, UniformClipSampler  # noqa: F401

__all__ = ["DistributedSampler", "RandomClipSampler", "UniformClipSampler"]
