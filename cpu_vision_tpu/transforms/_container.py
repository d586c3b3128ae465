"""Container transforms: Compose, RandomApply, RandomChoice, RandomOrder
(reference ``transforms/v2/_container.py``)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from ._transform import Transform

__all__ = ["Compose", "RandomApply", "RandomChoice", "RandomOrder", "RandomTransforms"]


class RandomTransforms(Transform):
    """Base class for a list of transformations with randomness (reference
    ``transforms/transforms.py:485``; the v1 base of RandomOrder/Choice).
    Kept for namespace parity — subclasses override ``__call__``."""

    def __init__(self, transforms: Sequence[Transform]):
        if not isinstance(transforms, Sequence):
            raise TypeError("Argument transforms should be a sequence")
        self.transforms = list(transforms)

    def __call__(self, *args, **kwargs):
        raise NotImplementedError()

    def __repr__(self):
        inner = "\n".join(f"    {t}" for t in self.transforms)
        return f"{self.__class__.__name__}(\n{inner}\n)"


class Compose(Transform):
    """Chain transforms; the key (if given) is split across members."""

    def __init__(self, transforms: Sequence[Transform]):
        if not transforms:
            raise ValueError("Compose needs at least one transform")
        self.transforms = list(transforms)

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        keys = (
            jax.random.split(key, len(self.transforms))
            if key is not None
            else [None] * len(self.transforms)
        )
        for t, k in zip(self.transforms, keys):
            sample = t(sample, key=k)
        return sample

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"Compose([{inner}])"


class RandomApply(Transform):
    """Apply the wrapped transform(s) with probability ``p``."""

    _needs_key = True

    def __init__(self, transforms, p: float = 0.5):
        self.transforms = transforms if isinstance(transforms, (list, tuple)) else [transforms]
        self.p = p

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            raise ValueError("RandomApply needs a PRNG key")
        gate_key, inner_key = jax.random.split(key)
        # host-side bernoulli: transform pipelines run per-sample pre-batch
        if float(jax.random.uniform(gate_key)) >= self.p:
            return sample
        keys = jax.random.split(inner_key, len(self.transforms))
        for t, k in zip(self.transforms, keys):
            sample = t(sample, key=k)
        return sample


class RandomChoice(Transform):
    """Apply exactly one of the wrapped transforms, chosen by ``p``."""

    _needs_key = True

    def __init__(self, transforms: Sequence[Transform], p: Optional[Sequence[float]] = None):
        self.transforms = list(transforms)
        if p is None:
            p = [1.0] * len(self.transforms)
        total = float(sum(p))
        self.p = [v / total for v in p]

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            raise ValueError("RandomChoice needs a PRNG key")
        choice_key, inner_key = jax.random.split(key)
        idx = int(jax.random.choice(choice_key, len(self.transforms), p=np.asarray(self.p)))
        return self.transforms[idx](sample, key=inner_key)


class RandomOrder(Transform):
    """Apply all wrapped transforms in random order."""

    _needs_key = True

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            raise ValueError("RandomOrder needs a PRNG key")
        perm_key, inner_key = jax.random.split(key)
        order = np.asarray(jax.random.permutation(perm_key, len(self.transforms)))
        keys = jax.random.split(inner_key, len(self.transforms))
        for i in order:
            sample = self.transforms[int(i)](sample, key=keys[int(i)])
        return sample
