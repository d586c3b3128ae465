"""Object-detection training reference (TPU-native).

Counterpart of ``references/detection/train.py``: RetinaNet on padded
fixed-shape targets (boxes + labels + validity), focal + L1 losses, SGD with
warmup.  Faster R-CNN training uses ``FasterRCNN.forward_train`` the same
way.

Smoke run:
    python references/detection/train.py --fake-data --epochs 1 --steps-per-epoch 3
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cpu_vision_tpu.models import detection as det


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="retinanet_resnet50_fpn",
                   help="retinanet_* (one-stage) or fasterrcnn_* (two-stage)")
    p.add_argument("--num-classes", type=int, default=5)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--max-boxes", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--grad-clip", type=float, default=10.0)
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="procedurally-labelled SyntheticShapesDetection (learnable)")
    p.add_argument("--train-size", type=int, default=4000)
    p.add_argument("--val-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def fake_targets(rng, batch, g_max, num_classes, size):
    """Padded (boxes, labels, valid) like a COCO loader would emit."""
    n_obj = rng.integers(1, g_max + 1, batch)
    boxes = np.zeros((batch, g_max, 4), np.float32)
    labels = np.zeros((batch, g_max), np.int32)
    valid = np.zeros((batch, g_max), bool)
    for i, n in enumerate(n_obj):
        xy = rng.random((n, 2)) * (size * 0.6)
        wh = rng.random((n, 2)) * (size * 0.3) + 8
        boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, size - 1)], axis=1)
        labels[i, :n] = rng.integers(0, num_classes, n)
        valid[i, :n] = True
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)


def main(argv=None):
    args = get_args(argv)
    rng = np.random.default_rng(args.seed)
    s = args.image_size

    # two loss plumbing families (reference train.py accepts any --model and
    # engine.py sums the returned loss dict; same here):
    #  - one-stage (retinanet): (cls, reg, anchors) forward + compute_loss
    #  - two-stage (fasterrcnn): forward_train returns the 4-loss dict, and
    #    gt labels are 1-based with background=0
    two_stage = args.model.startswith(("fasterrcnn", "maskrcnn"))
    if two_stage:
        model = det.FasterRCNN(
            num_classes=args.num_classes + 1,  # + background
            rpn_pre_nms_top_n=500, rpn_post_nms_top_n=128,
            max_detections=20,
        )
    else:
        model = det.RetinaNet(
            num_classes=args.num_classes,
            anchor_sizes=((16,), (32,), (64,), (128,), (256,)),
            aspect_ratios=((0.5, 1.0, 2.0),) * 5,
            topk_candidates=300,
            max_detections=20,
        )
    sample = jnp.ones((1, s, s, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), sample, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # reference recipe: SGD + linear warmup (references/detection/engine.py:27
    # warms up over min(1000, len(loader)-1) iters); focal-loss detection
    # heads spike early, so clip the global grad norm as a guard
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.sgd(
            optax.join_schedules(
                [optax.linear_schedule(0.0, args.lr, args.warmup_steps),
                 optax.constant_schedule(args.lr)], [args.warmup_steps]
            ),
            momentum=0.9,
        ),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, gt_boxes, gt_labels, gt_valid, key):
        def loss_fn(p):
            v = {"params": p, "batch_stats": batch_stats}
            if two_stage:
                losses, mut = model.apply(
                    v, images, gt_boxes, gt_labels + 1, gt_valid, key,
                    method=model.forward_train, mutable=["batch_stats"],
                )
            else:
                (cls, reg, anchors), mut = model.apply(
                    v, images, train=True, mutable=["batch_stats"]
                )
                losses = model.apply(
                    v, cls, reg, anchors, gt_boxes, gt_labels, gt_valid,
                    method=model.compute_loss,
                )
            total = sum(losses.values())
            return total, (losses, mut["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, losses

    mean = jnp.asarray((0.485, 0.456, 0.406), jnp.float32) * 255.0
    std = jnp.asarray((0.229, 0.224, 0.225), jnp.float32) * 255.0
    train_ds = val_ds = None
    if args.synthetic:
        from cpu_vision_tpu.datasets import SyntheticShapesDetection

        shape = (s, s, 3)
        train_ds = SyntheticShapesDetection(args.train_size, shape, args.num_classes)
        val_ds = SyntheticShapesDetection(args.val_size, shape, args.num_classes,
                                          random_offset=args.train_size)

    def batch_at(ds, idxs):
        """Stack dataset samples into the padded fixed-shape target arrays."""
        g = args.max_boxes
        imgs, boxes, labels, valid = [], [], [], []
        for i in idxs:
            img, tgt = ds[i]
            n = tgt["boxes"].shape[0]
            b = np.zeros((g, 4), np.float32)
            l = np.zeros((g,), np.int32)
            v = np.zeros((g,), bool)
            b[:n], l[:n], v[:n] = tgt["boxes"][:g], tgt["labels"][:g], True
            imgs.append(img)
            boxes.append(b)
            labels.append(l)
            valid.append(v)
        x = (jnp.asarray(np.stack(imgs)).astype(jnp.float32) - mean) / std
        return (x, jnp.asarray(np.stack(boxes)), jnp.asarray(np.stack(labels)),
                jnp.asarray(np.stack(valid)))

    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from coco_eval import CocoEvaluator

    for epoch in range(args.epochs):
        order = rng.permutation(len(train_ds)) if train_ds is not None else None
        for step in range(args.steps_per_epoch):
            if train_ds is not None:
                lo = (step * args.batch_size) % max(1, len(train_ds) - args.batch_size)
                x, gt_boxes, gt_labels, gt_valid = batch_at(train_ds, order[lo:lo + args.batch_size])
            else:
                x = jnp.asarray(rng.random((args.batch_size, s, s, 3), dtype=np.float32))
                gt_boxes, gt_labels, gt_valid = fake_targets(
                    rng, args.batch_size, args.max_boxes, args.num_classes, s
                )
            params, batch_stats, opt_state, losses = train_step(
                params, batch_stats, opt_state, x, gt_boxes, gt_labels, gt_valid,
                jax.random.PRNGKey(epoch * args.steps_per_epoch + step),
            )
            if step % 5 == 0:
                msg = " ".join(f"{k} {float(v):.4f}" for k, v in sorted(losses.items()))
                print(f"epoch {epoch} step {step}: {msg}", flush=True)
        # inference + COCO mAP (held-out set when --synthetic, else a fake
        # batch; reference evaluates with coco_eval each epoch,
        # references/detection/train.py:62-102)
        ev = CocoEvaluator()
        n_det = 0

        def eval_batch(x, gt_boxes, gt_labels, gt_valid):
            nonlocal n_det
            v = {"params": params, "batch_stats": batch_stats}
            if two_stage:
                dets = model.apply(v, x, train=False)
                det_labels = np.asarray(dets["labels"]) - 1  # drop background offset
            else:
                cls, reg, anchors = model.apply(v, x, train=False)
                dets = model.postprocess(cls, reg, anchors, (s, s))
                det_labels = np.asarray(dets["labels"])
            n_det += int(dets["valid"].sum())
            for i in range(x.shape[0]):
                keep = np.asarray(dets["valid"][i])
                gk = np.asarray(gt_valid[i])
                ev.update(np.asarray(dets["boxes"][i])[keep],
                          np.asarray(dets["scores"][i])[keep],
                          det_labels[i][keep],
                          np.asarray(gt_boxes[i])[gk], np.asarray(gt_labels[i])[gk])

        if val_ds is not None:
            for lo in range(0, len(val_ds) - args.batch_size + 1, args.batch_size):
                eval_batch(*batch_at(val_ds, range(lo, lo + args.batch_size)))
        else:
            x = jnp.asarray(rng.random((2, s, s, 3), dtype=np.float32))
            gt = fake_targets(rng, 2, args.max_boxes, args.num_classes, s)
            eval_batch(x, *gt)
        stats = ev.summarize()
        print(f"epoch {epoch}: {n_det} detections, "
              f"mAP {stats['map']:.4f} mAP50 {stats['map_50']:.4f}", flush=True)
    return params


if __name__ == "__main__":
    main()
