"""Swin MFU attribution harness (run on the live TPU relay).

Times swin_t b256 inference under the four fused/unfused combinations and
a per-stage microbench (one isolated SwinBlock pair per stage shape), so
the 10.5%-MFU gap (BENCH_NOTES) can be attributed to: the fused Pallas
window-attention kernel, the fused MLP kernel, the roll/partition glue, or
a specific stage's shapes.

Usage:  python tools/swin_ab.py [batch] [section]
        section: "matrix" (fused/unfused combos), "fused" (just the fused
        config), "stages" (per-stage microbench); default "fused".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8].astype(jnp.float32)))


def bench(fn, *args, iters=10, warmup=2, repeats=2):
    for _ in range(warmup):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    section = sys.argv[2] if len(sys.argv) > 2 else "fused"
    from cpu_vision_tpu import models
    from cpu_vision_tpu.models import swin as swin_mod

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)

    combos = {"matrix": ((True, True), (True, False), (False, True), (False, False)),
              "fused": ((True, True),),
              "stages": ()}[section]
    print(f"== swin_t b{batch} fused/unfused matrix (4.49 GMACs/img) ==")
    for fa, fm in combos:
        swin_mod.FUSED_ATTENTION, swin_mod.FUSED_MLP = fa, fm
        m = models.get_model("swin_t", num_classes=1000, dtype=jnp.bfloat16)
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
        f = jax.jit(lambda v, t, m=m: m.apply(v, t, train=False))
        dt = bench(f, variables, x)
        ips = batch / dt
        mfu = ips * 4.49e9 * 2 / 197e12 * 100
        print(f"attn_fused={fa} mlp_fused={fm}: {ips:8.0f} img/s  {mfu:5.1f}% MFU  {dt*1e3:7.2f} ms")
    swin_mod.FUSED_ATTENTION = swin_mod.FUSED_MLP = True
    if section != "stages":
        return

    print("== per-stage SwinBlock pairs (shift 0 + shift 3), bf16 ==")
    # (dim, heads, H=W, n_blocks_in_model); per-block GMACs = 12*c^2*T + win
    for dim, heads, hw, nblk in ((96, 3, 56, 2), (192, 6, 28, 2),
                                 (384, 12, 14, 6), (768, 24, 7, 2)):
        blocks = [swin_mod.SwinBlock(dim, heads, 7, shift=0, dtype=jnp.bfloat16),
                  swin_mod.SwinBlock(dim, heads, 7, shift=3, dtype=jnp.bfloat16)]
        xs = jnp.asarray(rng.random((batch, hw, hw, dim), dtype=np.float32)).astype(jnp.bfloat16)
        vs = [b.init(jax.random.PRNGKey(0), xs[:1], train=False) for b in blocks]

        def pair(v0, v1, t):
            return blocks[1].apply(v1, blocks[0].apply(v0, t, train=False), train=False)

        f = jax.jit(pair)
        dt = bench(f, vs[0], vs[1], xs)
        # per-pair MACs: proj/MLP 12*c^2 per token + window attn 2*ws^2*c
        tokens = hw * hw
        gmacs = (12 * dim * dim * tokens + 2 * 49 * tokens * dim) * 2 / 1e9
        mfu = batch * gmacs * 2e9 / (dt * 197e12) * 100
        print(f"stage c={dim:4d} {hw}x{hw}: pair {dt*1e3:7.2f} ms  {mfu:5.1f}% MFU "
              f"(x{nblk // 2} pairs in model)")


if __name__ == "__main__":
    main()
