"""On-chip A/B: native swin_t vs the channel-padded variant
(``models/swin_padded.py``), b256 224^2 bf16 — the model-level half of the
stage-1 C=96 ceiling experiment (VERDICT r4 #3a; tools/k96_ab.py is the
matmul-level half).

    python tools/swin_pad_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(x.ravel()[:8].astype(jnp.float32)))


def bench(f, *args, iters=10):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from cpu_vision_tpu import models
    from cpu_vision_tpu.models.swin_padded import swin_t_padded

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)

    native = models.get_model("swin_t", num_classes=1000, dtype=jnp.bfloat16)
    nv = native.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    fn = jax.jit(lambda v, t: native.apply(v, t, train=False))
    dt_n = bench(fn, nv, x)
    print(f"native  swin_t: {256 / dt_n:8.1f} img/s "
          f"({256 / dt_n * 4.49e9 * 2 / 197e12 * 100:.1f}% MFU)")
    del native, nv, fn

    padded = swin_t_padded(num_classes=1000, dtype=jnp.bfloat16)
    pv = padded.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    fp = jax.jit(lambda v, t: padded.apply(v, t, train=False))
    dt_p = bench(fp, pv, x)
    # MFU quoted against the NATIVE model's useful FLOPs — the padding adds
    # redundant work, the function computed is the same
    print(f"padded  swin_t: {256 / dt_p:8.1f} img/s "
          f"({256 / dt_p * 4.49e9 * 2 / 197e12 * 100:.1f}% useful-MFU)")
    print(f"speedup: {dt_n / dt_p:.3f}x")


if __name__ == "__main__":
    main()
