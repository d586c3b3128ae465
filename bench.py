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


def main():
    from cpu_vision_tpu import ops

    h, w, batch = 1080, 1920, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, h, w, 1), dtype=np.float32))

    canny = getattr(ops, "canny", None)
    if canny is not None:
        fn = jax.jit(lambda x: ops.canny(x, low_threshold=0.1, high_threshold=0.2))
        metric = "canny_1080p_gpix_s"
    else:
        def pipeline(x):
            blurred = ops.gaussian_blur(x, 5, 1.5)
            return ops.sobel(blurred)

        fn = jax.jit(pipeline)
        metric = "gauss_sobel_1080p_gpix_s"

    dt = _time_fn(fn, imgs)
    gpix_s = batch * h * w / dt / 1e9
    print(json.dumps({
        "metric": metric,
        "value": round(gpix_s, 3),
        "unit": "GPix/s",
        "vs_baseline": round(gpix_s / TARGET_GPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
