"""Image-classification training reference (TPU-native).

Counterpart of the reference's ``references/classification/train.py``:
same CLI shape (model/data/epochs/lr/ema/resume flags), but the NCCL/DDP
machinery (``utils.py:245-269``, ``train.py:325``) collapses to a
``jax.sharding`` mesh — gradients sync implicitly through shardings.

Example (synthetic data smoke run):
    python references/classification/train.py --model resnet18 --fake-data \
        --epochs 1 --batch-size 64 --steps-per-epoch 5
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cpu_vision_tpu import datasets, models, parallel
from cpu_vision_tpu.train import MetricLogger, accuracy, load_checkpoint, save_checkpoint
from cpu_vision_tpu.train.presets import ImageClassificationEval, ImageClassificationTrain


def get_args(argv=None):
    p = argparse.ArgumentParser(description="cpu_vision_tpu classification training")
    p.add_argument("--data-path", default=None, help="ImageFolder root with train/ and val/")
    p.add_argument("--fake-data", action="store_true", help="use synthetic data")
    p.add_argument("--synthetic", action="store_true",
                   help="procedurally-labelled SyntheticShapes (learnable; for accuracy proofs)")
    p.add_argument("--train-size", type=int, default=20_000)
    p.add_argument("--val-size", type=int, default=2_000)
    p.add_argument("--model", default="resnet18")
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--lr-warmup-epochs", type=int, default=0)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--model-ema", action="store_true")
    p.add_argument("--model-ema-decay", type=float, default=0.999)
    p.add_argument("--auto-augment", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    p.add_argument("--batched-aug", action="store_true",
                   help="one jitted whole-batch augmentation (pad/crop/flip) instead of the "
                        "per-image preset loop — the TPU-fast path for uniform-size data")
    return p.parse_args(argv)


def make_datasets(args):
    shape = (args.image_size, args.image_size, 3)
    if args.synthetic:
        # disjoint index ranges -> disjoint, identically-distributed splits
        train = datasets.SyntheticShapes(args.train_size, shape, args.num_classes)
        val = datasets.SyntheticShapes(args.val_size, shape, args.num_classes,
                                       random_offset=args.train_size)
        return train, val
    if args.fake_data or args.data_path is None:
        train = datasets.FakeData(4096, shape, args.num_classes)
        val = datasets.FakeData(512, shape, args.num_classes, random_offset=10_000)
        return train, val
    train = datasets.ImageFolder(os.path.join(args.data_path, "train"))
    val = datasets.ImageFolder(os.path.join(args.data_path, "val"))
    return train, val


def main(argv=None):
    args = get_args(argv)
    rng = np.random.default_rng(args.seed)

    mesh = parallel.create_mesh((-1, 1))  # pure data parallel by default
    print(f"devices: {len(jax.devices())}, mesh: {mesh.shape}")

    train_ds, val_ds = make_datasets(args)
    train_tf = ImageClassificationTrain(args.image_size, auto_augment=args.auto_augment)
    eval_tf = ImageClassificationEval(args.image_size, int(args.image_size * 1.14))
    train_loader = datasets.DataLoader(train_ds, args.batch_size, shuffle=True, drop_last=True)
    val_loader = datasets.DataLoader(val_ds, args.batch_size, drop_last=True)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = models.get_model(args.model, num_classes=args.num_classes, dtype=dtype)
    sample = jnp.ones((1, args.image_size, args.image_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), sample, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    steps_per_epoch = args.steps_per_epoch or len(train_loader)
    schedule = optax.cosine_decay_schedule(args.lr, args.epochs * steps_per_epoch)
    if args.lr_warmup_epochs:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, args.lr, args.lr_warmup_epochs * steps_per_epoch), schedule],
            [args.lr_warmup_epochs * steps_per_epoch],
        )
    tx = optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.sgd(schedule, momentum=args.momentum),
    )
    opt_state = tx.init(params)
    ema_params = params if args.model_ema else None

    start_epoch = 0
    if args.resume:
        ckpt = load_checkpoint(args.resume)
        params, opt_state = ckpt["params"], ckpt["opt_state"]
        batch_stats = ckpt["batch_stats"]
        start_epoch = int(ckpt["epoch"]) + 1
        if args.model_ema and "ema_params" in ckpt:
            ema_params = ckpt["ema_params"]

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, labels, drop_key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_key},
            )
            one_hot = jax.nn.one_hot(labels, args.num_classes)
            if args.label_smoothing:
                one_hot = optax.smooth_labels(one_hot, args.label_smoothing)
            if isinstance(out, tuple):  # googlenet/inception aux heads
                main, *aux = out
                loss = optax.softmax_cross_entropy(main, one_hot).mean()
                for a in aux:  # 0.3 aux weight (Szegedy et al., reference recipe)
                    loss = loss + 0.3 * optax.softmax_cross_entropy(a, one_hot).mean()
                out = main
            else:
                loss = optax.softmax_cross_entropy(out, one_hot).mean()
            return loss, (out, mut["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return params, new_stats, opt_state, loss, acc

    @jax.jit
    def ema_step(ema, params):
        return jax.tree.map(lambda e, p: args.model_ema_decay * e + (1 - args.model_ema_decay) * p, ema, params)

    @jax.jit
    def eval_step(params, batch_stats, images):
        return model.apply({"params": params, "batch_stats": batch_stats}, images, train=False)

    batched_tf = None
    if args.batched_aug:
        from cpu_vision_tpu.train.presets import BatchedImageClassificationTrain
        batched_tf = BatchedImageClassificationTrain(args.image_size)

    def prep(batch):
        imgs, labels = batch
        key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
        if batched_tf is not None:
            x = batched_tf(jnp.asarray(np.stack([np.asarray(im) for im in imgs])), key)
        else:
            keys = jax.random.split(key, imgs.shape[0])
            out = [np.asarray(train_tf(jnp.asarray(im), key=k)) for im, k in zip(imgs, keys)]
            x = jnp.asarray(np.stack(out))
        y = jnp.asarray(labels)
        return parallel.shard_batch((x, y), mesh)

    with mesh:
        params = parallel.replicate(params, mesh)
        batch_stats = parallel.replicate(batch_stats, mesh)
        opt_state = parallel.replicate(opt_state, mesh)

        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            logger = MetricLogger()
            for step, batch in enumerate(logger.log_every(train_loader, args.print_freq, f"epoch {epoch}")):
                if args.steps_per_epoch and step >= args.steps_per_epoch:
                    break
                x, y = prep(batch)
                drop_key = jax.random.PRNGKey(epoch * 100_000 + step)
                params, batch_stats, opt_state, loss, acc = train_step(
                    params, batch_stats, opt_state, x, y, drop_key
                )
                if args.model_ema:
                    ema_params = ema_step(ema_params, params)
                logger.update(loss=float(loss), acc=float(acc))

            # evaluate
            correct = total = 0
            for batch in val_loader:
                imgs, labels = batch
                if batched_tf is not None:
                    # uniform-size data: normalize the whole batch in one call
                    mean = jnp.asarray((0.485, 0.456, 0.406), jnp.float32) * 255.0
                    std = jnp.asarray((0.229, 0.224, 0.225), jnp.float32) * 255.0
                    x = (jnp.asarray(np.stack([np.asarray(im) for im in imgs]))
                         .astype(jnp.float32) - mean) / std
                else:
                    x = jnp.asarray(
                        np.stack([np.asarray(eval_tf(jnp.asarray(im))) for im in imgs])
                    )
                logits = eval_step(params, batch_stats, x)
                correct += float(jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(labels)))
                total += len(labels)
            print(f"epoch {epoch}: val acc@1 {100.0 * correct / max(total, 1):.2f}%")

            if args.output_dir:
                ckpt = {
                    "params": params,
                    "opt_state": opt_state,
                    "batch_stats": batch_stats,
                    "epoch": epoch,
                }
                if args.model_ema:
                    ckpt["ema_params"] = ema_params
                save_checkpoint(os.path.join(args.output_dir, f"ckpt_{epoch}"), ckpt)
                save_checkpoint(os.path.join(args.output_dir, "ckpt_latest"), ckpt)

    return params


if __name__ == "__main__":
    main()
