"""Stereo-depth (RAFT-Stereo) training reference (TPU-native).

Counterpart of the reference's ``references/depth/stereo/train.py``:
RAFT-Stereo trained with the exponentially-weighted sequence loss
(``references/depth/stereo/utils/losses.py:22-64``) and evaluated with the
mae/rmse/epe/bad1/bad2/1px/3px/5px/fl-all/relepe metric set
(``references/depth/stereo/utils/metrics.py:5-50``).  The whole train step
(all GRU updates + loss + grads) is one jitted function.

Smoke run:
    python references/depth/stereo/train.py --fake-data --epochs 1 \
        --steps-per-epoch 2 --image-size 64 --iters 3
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cpu_vision_tpu import models


def sequence_loss(disp_preds, disp_gt, valid_mask, gamma: float = 0.9,
                  max_disp: float = 256.0):
    """Weighted L1 over the prediction sequence (reference
    ``utils/losses.py:sequence_loss``): weight of prediction i (of N) is
    ``gamma ** (N - i - 1)``; pixels with ``|disp_gt| >= max_disp`` or
    invalid are excluded.

    disp_preds: (T, N, H, W, 1); disp_gt: (N, H, W, 1); valid: (N, H, W).
    """
    disp_norm = jnp.abs(disp_gt[..., 0])
    valid = (valid_mask & (disp_norm < max_disp))[None, ..., None]
    abs_diff = jnp.abs(disp_preds - disp_gt[None])
    abs_diff = jnp.mean(abs_diff * valid, axis=(1, 2, 3, 4))
    t = disp_preds.shape[0]
    weights = gamma ** jnp.arange(t - 1, -1, -1, dtype=disp_preds.dtype)
    return jnp.sum(abs_diff * weights)


def compute_metrics(disp_pred, disp_gt, valid_mask=None):
    """mae/rmse/epe/bad1/bad2/1px/3px/5px/fl-all/relepe (reference
    ``utils/metrics.py:compute_metrics``).  Disparity is 1-D, so
    epe == mae == |pred - gt|."""
    diff = jnp.abs(disp_pred[..., 0] - disp_gt[..., 0])
    norm = jnp.abs(disp_gt[..., 0])
    if valid_mask is None:
        valid_mask = jnp.ones(diff.shape, bool)
    w = valid_mask.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)

    def vmean(x):
        return jnp.sum(x * w) / denom

    rel = diff / jnp.maximum(norm, 1e-12)
    return {
        "mae": vmean(diff),
        "rmse": jnp.sqrt(vmean(diff**2)),
        "epe": vmean(diff),
        "bad1": vmean((diff > 1).astype(jnp.float32)),
        "bad2": vmean((diff > 2).astype(jnp.float32)),
        "1px": vmean((diff < 1).astype(jnp.float32)),
        "3px": vmean((diff < 3).astype(jnp.float32)),
        "5px": vmean((diff < 5).astype(jnp.float32)),
        "fl-all": vmean(((diff < 3) & (rel < 0.05)).astype(jnp.float32)) * 100,
        "relepe": vmean(rel),
    }


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="raft_stereo_realtime")
    p.add_argument("--iters", type=int, default=7,
                   help="disparity updates per forward (reference num_iters)")
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=5)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--gamma", type=float, default=0.9,
                   help="reference default loss gamma (train.py:--gamma)")
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="variable-disparity glyph pairs (learnable task)")
    p.add_argument("--max-disp", type=int, default=5)
    p.add_argument("--val-batches", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def make_fake_batch(rng, n, s):
    """A synthetic constant-disparity pair: right = roll(left, -d along x)."""
    left = rng.random((n, s, s, 3), dtype=np.float32)
    d = 2
    right = np.roll(left, -d, axis=2)
    disp = np.full((n, s, s, 1), float(d), np.float32)
    valid = np.ones((n, s, s), bool)
    return jnp.asarray(left), jnp.asarray(right), jnp.asarray(disp), jnp.asarray(valid)


def make_synthetic_batch(rng, n, s, max_disp):
    """Glyph images under a random per-sample disparity (right = roll(left,
    -d)); torus wrap keeps every pixel matched, so the constant-d ground
    truth is exact — a learnable stand-in for SceneFlow/Middlebury."""
    from cpu_vision_tpu.datasets.synthetic import _render

    left = np.stack([
        _render(np.random.default_rng(int(rng.integers(0, 2**31))),
                int(rng.integers(0, 10)), s) for _ in range(n)
    ]).astype(np.float32) / 255.0
    right = np.empty_like(left)
    disp = np.zeros((n, s, s, 1), np.float32)
    for i in range(n):
        d = int(rng.integers(0, max_disp + 1))
        right[i] = np.roll(left[i], -d, axis=1)
        disp[i] = float(d)
    valid = np.ones((n, s, s), bool)
    return jnp.asarray(left), jnp.asarray(right), jnp.asarray(disp), jnp.asarray(valid)


def main(argv=None):
    args = get_args(argv)
    rng = np.random.default_rng(args.seed)
    s = args.image_size

    model = models.get_model(args.model, iters=args.iters)

    def next_batch(r):
        if args.synthetic:
            return make_synthetic_batch(r, args.batch_size, s, args.max_disp)
        return make_fake_batch(r, args.batch_size, s)

    left, right, disp_gt, valid = next_batch(rng)
    variables = model.init(jax.random.PRNGKey(args.seed), left, right, train=False)
    params = variables["params"]

    # reference recipe: AdamW + warmup/flat/decay; we use AdamW + cosine
    total_steps = args.epochs * args.steps_per_epoch
    sched = optax.cosine_decay_schedule(args.lr, max(total_steps, 1))
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, left, right, disp_gt, valid):
        def loss_fn(p):
            disps = model.apply({"params": p}, left, right, train=True)
            return sequence_loss(jnp.stack(disps), disp_gt, valid, args.gamma)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, left, right, disp_gt, valid):
        disps = model.apply({"params": params}, left, right, train=False)
        return compute_metrics(disps[-1], disp_gt, valid)

    for epoch in range(args.epochs):
        for step in range(args.steps_per_epoch):
            if args.fake_data or args.synthetic:
                left, right, disp_gt, valid = next_batch(rng)
            params, opt_state, loss = train_step(params, opt_state, left, right,
                                                 disp_gt, valid)
            if step % 10 == 0:
                print(f"epoch {epoch} step {step} loss {float(loss):.4f}", flush=True)
        if args.synthetic:
            val_rng = np.random.default_rng(args.seed + 10_000)
            acc = None
            for _ in range(args.val_batches):
                b = make_synthetic_batch(val_rng, args.batch_size, s, args.max_disp)
                m = eval_step(params, *b)
                acc = m if acc is None else {k: acc[k] + m[k] for k in m}
            m = {k: v / args.val_batches for k, v in acc.items()}
        else:
            m = eval_step(params, left, right, disp_gt, valid)
        print("eval: " + " ".join(f"{k}={float(v):.3f}" for k, v in m.items()),
              flush=True)


if __name__ == "__main__":
    main()
