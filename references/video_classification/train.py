"""Video-classification training reference (TPU-native).

Counterpart of ``references/video_classification/train.py``: 3D ResNets on
NTHWC clips with clip sampling (``VideoClips`` + ``RandomClipSampler``).

Smoke run:
    python references/video_classification/train.py --fake-data --epochs 1 \
        --steps-per-epoch 2 --clip-len 4 --image-size 32
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cpu_vision_tpu import models
from cpu_vision_tpu.datasets.video_utils import RandomClipSampler, VideoClips


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="r3d_18")
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--clip-len", type=int, default=8)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=5)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="motion-direction SyntheticShapesVideo (temporal label)")
    p.add_argument("--train-size", type=int, default=2000)
    p.add_argument("--val-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    rng = np.random.default_rng(args.seed)
    s, t = args.image_size, args.clip_len

    # fake corpus: 8 videos of varying length; clips indexed like the reference
    frame_counts = rng.integers(t, 4 * t, 8).tolist()
    clips = VideoClips(frame_counts, clip_length_in_frames=t, frames_between_clips=t // 2)
    sampler = RandomClipSampler(clips, max_clips_per_video=2, seed=args.seed)
    videos = [rng.random((fc, s, s, 3), dtype=np.float32) for fc in frame_counts]
    labels = rng.integers(0, args.num_classes, len(videos))

    model = models.get_model(args.model, num_classes=args.num_classes)
    sample = jnp.ones((1, t, s, s, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), sample, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy(out, jax.nn.one_hot(y, args.num_classes)).mean()
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    if args.synthetic:
        # motion-direction task: the label is invisible in any single frame,
        # so held-out accuracy above 25% proves temporal integration
        from cpu_vision_tpu.datasets import SyntheticShapesVideo

        if args.num_classes != SyntheticShapesVideo.num_classes:
            raise SystemExit("--synthetic requires --num-classes 4")
        train_ds = SyntheticShapesVideo(args.train_size, t, s)
        val_ds = SyntheticShapesVideo(args.val_size, t, s,
                                      random_offset=args.train_size)

        @jax.jit
        def eval_step(params, batch_stats, x):
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              x, train=False)
            return jnp.argmax(out, axis=-1)

        def batch_at(ds, idxs):
            vids, ys = zip(*[ds[i] for i in idxs])
            return (jnp.asarray(np.stack(vids)).astype(jnp.float32) / 255.0,
                    jnp.asarray(np.asarray(ys)))

        step_count = 0
        for epoch in range(args.epochs):
            order = rng.permutation(len(train_ds))
            for step in range(args.steps_per_epoch):
                lo = (step * args.batch_size) % max(1, len(train_ds) - args.batch_size)
                x, y = batch_at(train_ds, order[lo:lo + args.batch_size])
                params, batch_stats, opt_state, loss = train_step(
                    params, batch_stats, opt_state, x, y)
                if step % 10 == 0:
                    print(f"epoch {epoch} step {step}: loss {float(loss):.4f}",
                          flush=True)
                step_count += 1
            correct = total = 0
            for lo in range(0, len(val_ds) - args.batch_size + 1, args.batch_size):
                x, y = batch_at(val_ds, range(lo, lo + args.batch_size))
                preds = eval_step(params, batch_stats, x)
                correct += int((preds == y).sum())
                total += int(y.shape[0])
            print(f"epoch {epoch}: held-out acc {100 * correct / max(total, 1):.1f}%",
                  flush=True)
        return params

    clip_ids = list(sampler)
    step = 0
    for epoch in range(args.epochs):
        sampler.set_epoch(epoch)
        for start in range(0, len(clip_ids) - args.batch_size + 1, args.batch_size):
            if step >= args.steps_per_epoch:
                break
            batch_ids = clip_ids[start : start + args.batch_size]
            xs, ys = [], []
            for cid in batch_ids:
                v, frames = clips.get_clip_frames(cid)
                xs.append(videos[v][frames])
                ys.append(labels[v])
            x = jnp.asarray(np.stack(xs))
            y = jnp.asarray(np.asarray(ys))
            params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, x, y)
            print(f"epoch {epoch} step {step}: loss {float(loss):.4f}")
            step += 1
    return params


if __name__ == "__main__":
    main()
