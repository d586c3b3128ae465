"""On-chip A/B for the swin/convnext stage-1 C=96 structural ceiling
(VERDICT r4 #3a): is a zero-padded K=128 contraction faster than the native
K=96 one despite 33% more FLOPs?

Measures XLA dot times for the stage-1 shapes swin_t actually runs
(b256: M = 256 images x 64 windows x 56 padded tokens = 917,504 rows):

  qkv:   (M, 96) @ (96, 288)    vs  (M, 128) @ (128, 288)
  proj:  (M, 96) @ (96, 96)     vs  (M, 128) @ (128, 128)
  mlp1:  (M, 96) @ (96, 384)    vs  (M, 128) @ (128, 384)
  mlp2:  (M, 384) @ (384, 96)   vs  (M, 384) @ (384, 128)   (pad N, not K)

Run while the relay is idle:  python tools/k96_ab.py
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


def timeit(f, *args, iters=20):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    M = 256 * 64 * 56
    cases = [
        ("qkv_k96", (M, 96), (96, 288)),
        ("qkv_k128pad", (M, 128), (128, 288)),
        ("proj_k96", (M, 96), (96, 96)),
        ("proj_k128pad", (M, 128), (128, 128)),
        ("mlp1_k96", (M, 96), (96, 384)),
        ("mlp1_k128pad", (M, 128), (128, 384)),
        ("mlp2_n96", (M, 384), (384, 96)),
        ("mlp2_n128pad", (M, 384), (384, 128)),
        # stage-2: C=192 for reference
        ("s2_qkv_k192", (M // 4, 192), (192, 576)),
        ("s2_qkv_k256pad", (M // 4, 256), (256, 576)),
    ]
    f = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    for name, sa, sb in cases:
        a = jnp.asarray(rng.standard_normal(sa, dtype=np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(sb, dtype=np.float32)).astype(jnp.bfloat16)
        dt = timeit(f, a, b)
        flops = 2 * sa[0] * sa[1] * sb[1]
        print(f"{name:18s} {dt * 1e3:8.3f} ms  {flops / dt / 1e12:6.1f} TFLOP/s "
              f"({flops / dt / 197e12 * 100:5.1f}% peak)")


if __name__ == "__main__":
    main()
