"""Headline benchmark — prints ONE JSON line.

Run on real TPU by the driver.  Headline metric: fused Canny throughput on
1080p frames (north-star target: 2 GPix/s per v5e chip).  Falls back to the
gaussian+sobel pipeline while the fused Canny Pallas kernel is being built.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_GPIX_S = 2.0  # BASELINE.md: fused Canny ≥ 2 GPix/s per chip on 1080p


def _sync(out):
    """Force execution.  On the axon-relayed TPU, ``block_until_ready`` does
    not actually synchronise — a small readback does (and orders all prior
    work on the stream)."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8]))


def _time_fn(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _scene(h: int, w: int, batch: int) -> np.ndarray:
    """Synthetic 1080p scene with realistic edge density: blocks, a disc,
    a smooth gradient, mild noise."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.3 + 0.2 * (xx / w)
    img[200:700, 300:900] = 0.8
    img[400:900, 1100:1700] = 0.15
    disc = (yy - 540) ** 2 + (xx - 960) ** 2 < 200**2
    img[disc] = 0.95
    img = img + rng.normal(0, 0.01, (h, w)).astype(np.float32)
    return np.broadcast_to(img, (batch, h, w)).reshape(batch, h, w, 1).copy()


def main():
    from cpu_vision_tpu import ops

    h, w, batch = 1080, 1920, 8
    imgs = jnp.asarray(_scene(h, w, batch))

    fn = jax.jit(lambda x: ops.canny(x, low_threshold=0.1, high_threshold=0.2))
    dt = _time_fn(fn, imgs)
    gpix_s = batch * h * w / dt / 1e9
    print(json.dumps({
        "metric": "canny_1080p_gpix_s",
        "value": round(gpix_s, 3),
        "unit": "GPix/s",
        "vs_baseline": round(gpix_s / TARGET_GPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
