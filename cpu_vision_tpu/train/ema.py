"""Model EMA (reference ``references/classification/utils.py:
ExponentialMovingAverage``) as a small pytree helper."""

from __future__ import annotations

import jax

__all__ = ["ExponentialMovingAverage"]


class ExponentialMovingAverage:
    """``ema = decay * ema + (1 - decay) * params`` per step, jit-friendly."""

    def __init__(self, params, decay: float = 0.999):
        self.decay = decay
        self.params = params
        self._update = jax.jit(
            lambda ema, p, d: jax.tree.map(lambda e, x: d * e + (1.0 - d) * x, ema, p),
            static_argnums=(),
        )

    def update(self, params) -> None:
        self.params = self._update(self.params, params, self.decay)

    def state_dict(self):
        return {"decay": self.decay, "params": self.params}
