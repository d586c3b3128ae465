"""Semantic-segmentation training reference (TPU-native).

Counterpart of ``references/segmentation/train.py``: cross-entropy (+aux)
over FCN/DeepLabV3/LRASPP, poly LR schedule, mIoU evaluation with a
confusion matrix (the reference's ``ConfusionMatrix``, ``utils.py``).

Smoke run:
    python references/segmentation/train.py --fake-data --epochs 1 \
        --steps-per-epoch 3 --model fcn_resnet50 --image-size 64
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cpu_vision_tpu import models, parallel


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fcn_resnet50")
    p.add_argument("--num-classes", type=int, default=21)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--aux-loss", action="store_true")
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="procedurally-labelled SyntheticShapesSegmentation (learnable)")
    p.add_argument("--train-size", type=int, default=4000)
    p.add_argument("--val-size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def confusion_matrix(preds, targets, num_classes):
    """Flat bincount confusion matrix (reference ``ConfusionMatrix.update``)."""
    k = (targets >= 0) & (targets < num_classes)
    idx = num_classes * targets[k] + preds[k]
    return jnp.bincount(idx, length=num_classes**2).reshape(num_classes, num_classes)


def miou(conf):
    inter = jnp.diag(conf)
    union = conf.sum(0) + conf.sum(1) - inter
    iou = inter / jnp.maximum(union, 1)
    return float(iou.mean()) * 100


def main(argv=None):
    args = get_args(argv)
    rng = np.random.default_rng(args.seed)
    nc = args.num_classes

    model = models.get_model(args.model, num_classes=nc, **(
        {"aux_loss": args.aux_loss} if "lraspp" not in args.model else {}
    ))
    s = args.image_size
    sample = jnp.ones((1, s, s, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), sample, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    total_steps = args.epochs * args.steps_per_epoch
    schedule = optax.polynomial_schedule(args.lr, 0.0, 0.9, total_steps)
    tx = optax.sgd(schedule, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, masks, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            one_hot = jax.nn.one_hot(masks, nc)
            loss = optax.softmax_cross_entropy(out["out"], one_hot).mean()
            if "aux" in out:
                loss = loss + 0.5 * optax.softmax_cross_entropy(out["aux"], one_hot).mean()
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, images):
        out = model.apply({"params": params, "batch_stats": batch_stats}, images, train=False)
        return jnp.argmax(out["out"], axis=-1)

    mean = jnp.asarray((0.485, 0.456, 0.406), jnp.float32) * 255.0
    std = jnp.asarray((0.229, 0.224, 0.225), jnp.float32) * 255.0
    train_ds = val_ds = None
    if args.synthetic:
        from cpu_vision_tpu.datasets import SyntheticShapesSegmentation

        shape = (s, s, 3)
        train_ds = SyntheticShapesSegmentation(args.train_size, shape, nc - 1)
        val_ds = SyntheticShapesSegmentation(args.val_size, shape, nc - 1,
                                             random_offset=args.train_size)

    def batch_at(ds, idxs):
        imgs, tgts = zip(*[ds[i] for i in idxs])
        x = (jnp.asarray(np.stack(imgs)).astype(jnp.float32) - mean) / std
        return x, jnp.asarray(np.stack(tgts))

    step_count = 0
    for epoch in range(args.epochs):
        order = rng.permutation(len(train_ds)) if train_ds is not None else None
        for step in range(args.steps_per_epoch):
            if train_ds is not None:
                lo = (step * args.batch_size) % max(1, len(train_ds) - args.batch_size)
                x, y = batch_at(train_ds, order[lo:lo + args.batch_size])
            else:
                x = jnp.asarray(rng.random((args.batch_size, s, s, 3), dtype=np.float32))
                y = jnp.asarray(rng.integers(0, nc, (args.batch_size, s, s)))
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, y, jax.random.PRNGKey(step_count)
            )
            step_count += 1
            if step % 5 == 0:
                print(f"epoch {epoch} step {step}: loss {float(loss):.4f}", flush=True)
        # eval mIoU (held-out when --synthetic, else a fake batch)
        conf = jnp.zeros((nc, nc), jnp.int32)
        if val_ds is not None:
            for lo in range(0, len(val_ds) - args.batch_size + 1, args.batch_size):
                x, y = batch_at(val_ds, range(lo, lo + args.batch_size))
                preds = eval_step(params, batch_stats, x)
                conf = conf + confusion_matrix(preds.reshape(-1), np.asarray(y).reshape(-1), nc)
        else:
            x = jnp.asarray(rng.random((args.batch_size, s, s, 3), dtype=np.float32))
            y = jnp.asarray(rng.integers(0, nc, (args.batch_size, s, s)))
            preds = eval_step(params, batch_stats, x)
            conf = confusion_matrix(preds.reshape(-1), y.reshape(-1), nc)
        print(f"epoch {epoch}: mIoU {miou(conf):.2f}%", flush=True)
    return params


if __name__ == "__main__":
    main()
