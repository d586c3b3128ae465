"""On-chip A/B (VERDICT r4 #6): is the fused transformer-kernel path
(custom_vjp remat backward) actually profitable under ``jax.grad``?

Times a ViT-B/16 b128 bf16 SGD train step with the fused attention/MLP
Pallas kernels ON (default) vs OFF (plain XLA flax path).

    python tools/vit_train_ab.py
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


def step_time(fused: bool, iters: int = 10) -> float:
    import optax

    from cpu_vision_tpu import models
    from cpu_vision_tpu.models import vision_transformer as vt

    vt.FUSED_ATTENTION = fused
    vt.FUSED_MLP = fused

    m = models.get_model("vit_b_16", num_classes=1000, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    tx = optax.sgd(0.1, momentum=0.9)
    params = v["params"]
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, 128))

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = m.apply({"params": p}, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
            return optax.softmax_cross_entropy_with_integer_labels(
                out.astype(jnp.float32), y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    out = step(params, opt_state, x, y)
    _sync(out[2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out[0], out[1], x, y)
    _sync(out[2])
    return (time.perf_counter() - t0) / iters


def main():
    for fused in (True, False):
        dt = step_time(fused)
        ips = 128 / dt
        mfu = ips * 3 * 35.2e9 / 197e12 * 100
        print(f"fused={fused}: {ips:8.1f} img/s  ({mfu:.1f}% train MFU, "
              f"{dt * 1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
