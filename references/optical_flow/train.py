"""Optical-flow (RAFT) training reference (TPU-native).

Counterpart of the reference's ``references/optical_flow/train.py``:
RAFT trained with the exponentially-weighted sequence loss
(``references/optical_flow/utils.py:178-199``) and evaluated with the
epe/1px/3px/5px/f1 metrics (``utils.py:157-175``).  The whole train step
(all ``iters`` GRU updates + loss + grads) is one jitted function.

Smoke run:
    python references/optical_flow/train.py --fake-data --epochs 1 \
        --steps-per-epoch 2 --image-size 64 --iters 3
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cpu_vision_tpu import models


def sequence_loss(flow_preds, flow_gt, valid_mask, gamma: float = 0.8,
                  max_flow: float = 400.0):
    """Weighted L1 over the prediction sequence (reference
    ``references/optical_flow/utils.py:sequence_loss``): weight of
    prediction i (of N) is ``gamma ** (N - i - 1)``; pixels with
    ``|flow_gt| >= max_flow`` or invalid are excluded.

    flow_preds: (T, N, H, W, 2); flow_gt: (N, H, W, 2); valid: (N, H, W).
    """
    flow_norm = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid = (valid_mask & (flow_norm < max_flow))[None, ..., None]
    abs_diff = jnp.abs(flow_preds - flow_gt[None])
    abs_diff = jnp.mean(abs_diff * valid, axis=(1, 2, 3, 4))
    t = flow_preds.shape[0]
    weights = gamma ** jnp.arange(t - 1, -1, -1, dtype=flow_preds.dtype)
    return jnp.sum(abs_diff * weights)


def compute_metrics(flow_pred, flow_gt, valid_mask=None):
    """epe / 1px / 3px / 5px / f1-all (reference ``utils.py:157-175``)."""
    epe = jnp.sqrt(jnp.sum((flow_pred - flow_gt) ** 2, axis=-1))
    flow_norm = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    if valid_mask is None:
        valid_mask = jnp.ones(epe.shape, bool)
    w = valid_mask.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)

    def vmean(x):
        return jnp.sum(x * w) / denom

    rel = epe / jnp.maximum(flow_norm, 1e-12)
    return {
        "epe": vmean(epe),
        "1px": vmean((epe < 1).astype(jnp.float32)),
        "3px": vmean((epe < 3).astype(jnp.float32)),
        "5px": vmean((epe < 5).astype(jnp.float32)),
        "f1": vmean(((epe > 3) & (rel > 0.05)).astype(jnp.float32)) * 100,
    }


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="raft_small")
    p.add_argument("--iters", type=int, default=12,
                   help="flow updates per forward (reference num_flow_updates)")
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=5)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4,
                   help="reference uses AdamW(wd=1e-4)")
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="variable-shift glyph pairs (learnable flow task)")
    p.add_argument("--max-shift", type=int, default=5)
    p.add_argument("--val-batches", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def make_fake_batch(rng, n, s):
    """A synthetic constant-shift flow pair: img2 = roll(img1)."""
    img1 = rng.random((n, s, s, 3), dtype=np.float32)
    shift = 2
    img2 = np.roll(img1, shift, axis=2)
    flow = np.zeros((n, s, s, 2), np.float32)
    flow[..., 0] = shift
    valid = np.ones((n, s, s), bool)
    return jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(flow), jnp.asarray(valid)


def make_synthetic_batch(rng, n, s, max_shift):
    """Glyph images under a random per-sample integer translation.

    img2 = roll(img1, (dy, dx)); the torus wrap keeps every pixel matched,
    so ground-truth flow is the constant (dx, dy) and all pixels are valid —
    a minimal but genuinely learnable stand-in for FlyingChairs
    (reference references/optical_flow/train.py trains RAFT on chairs first).
    """
    from cpu_vision_tpu.datasets.synthetic import _render

    img1 = np.stack([
        _render(np.random.default_rng(int(rng.integers(0, 2**31))),
                int(rng.integers(0, 10)), s) for _ in range(n)
    ]).astype(np.float32) / 255.0
    flow = np.zeros((n, s, s, 2), np.float32)
    img2 = np.empty_like(img1)
    for i in range(n):
        dy, dx = rng.integers(-max_shift, max_shift + 1, 2)
        img2[i] = np.roll(img1[i], (dy, dx), axis=(0, 1))
        flow[i, ..., 0] = dx
        flow[i, ..., 1] = dy
    valid = np.ones((n, s, s), bool)
    return jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(flow), jnp.asarray(valid)


def main(argv=None):
    args = get_args(argv)
    rng = np.random.default_rng(args.seed)
    s = args.image_size

    model = models.get_model(args.model, iters=args.iters)

    def next_batch(r):
        if args.synthetic:
            return make_synthetic_batch(r, args.batch_size, s, args.max_shift)
        return make_fake_batch(r, args.batch_size, s)

    img1, img2, flow_gt, valid = next_batch(rng)
    variables = model.init(jax.random.PRNGKey(args.seed), img1, img2, train=False)
    params = variables["params"]

    # reference recipe: AdamW + OneCycle; we use AdamW + cosine
    total_steps = args.epochs * args.steps_per_epoch
    sched = optax.cosine_decay_schedule(args.lr, max(total_steps, 1))
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, img1, img2, flow_gt, valid):
        def loss_fn(p):
            flows = model.apply({"params": p}, img1, img2, train=True)
            return sequence_loss(jnp.stack(flows), flow_gt, valid, args.gamma)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, img1, img2, flow_gt, valid):
        flows = model.apply({"params": params}, img1, img2, train=False)
        return compute_metrics(flows[-1], flow_gt, valid)

    for epoch in range(args.epochs):
        for step in range(args.steps_per_epoch):
            if args.fake_data or args.synthetic:
                img1, img2, flow_gt, valid = next_batch(rng)
            params, opt_state, loss = train_step(params, opt_state, img1, img2,
                                                 flow_gt, valid)
            if step % 10 == 0:
                print(f"epoch {epoch} step {step} loss {float(loss):.4f}", flush=True)
        # held-out eval: a fixed rng stream disjoint from training draws
        if args.synthetic:
            val_rng = np.random.default_rng(args.seed + 10_000)
            acc = None
            for _ in range(args.val_batches):
                b = make_synthetic_batch(val_rng, args.batch_size, s, args.max_shift)
                m = eval_step(params, *b)
                acc = m if acc is None else {k: acc[k] + m[k] for k in m}
            m = {k: v / args.val_batches for k, v in acc.items()}
        else:
            m = eval_step(params, img1, img2, flow_gt, valid)
        print("eval: " + " ".join(f"{k}={float(v):.3f}" for k, v in m.items()),
              flush=True)


if __name__ == "__main__":
    main()
