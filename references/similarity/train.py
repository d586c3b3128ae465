"""Metric-learning (similarity) training reference (TPU-native).

Counterpart of the reference's ``references/similarity/``: an
``EmbeddingNet`` (classification backbone + L2-normalised output,
``model.py:5-16``) trained with batch-all / batch-hard triplet margin
losses (``loss.py:25-75``) over PK-sampled batches (``sampler.py:33``,
p labels x k samples each), evaluated by pair-accuracy threshold sweep
(``test.py``'s evaluate: best accuracy over distance thresholds).

Everything batch-shaped is jitted; the triplet mining is a dense mask
over the (B, B) distance matrix — no data-dependent shapes.

Smoke run:
    python references/similarity/train.py --fake-data --epochs 1 \
        --steps-per-epoch 2 --labels-per-batch 3 --samples-per-label 4
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cpu_vision_tpu import models


# ------------------------------------------------------------------ losses
def pairwise_distances(x, p: float = 2.0, eps: float = 1e-12):
    """(B, D) -> (B, B) Lp distance matrix (reference uses torch.cdist)."""
    diff = jnp.abs(x[:, None, :] - x[None, :, :])
    return jnp.power(jnp.sum(jnp.power(diff + eps, p), axis=-1), 1.0 / p)


def _triplet_mask(labels):
    """(B,) -> (B, B, B) bool: valid (a, p, n) with distinct a/p indices,
    label[a]==label[p], label[a]!=label[n] (reference ``_get_triplet_mask``)."""
    b = labels.shape[0]
    idx = jnp.arange(b)
    distinct_ap = idx[:, None] != idx[None, :]
    same = labels[:, None] == labels[None, :]
    return (distinct_ap[:, :, None]
            & same[:, :, None]
            & (~same)[:, None, :])


def batch_all_triplet_loss(labels, embeddings, margin: float = 1.0, p: float = 2.0):
    """Mean over *positive* (non-zero) valid triplets (reference
    ``loss.py:batch_all_triplet_loss``). Returns (loss, frac_positive)."""
    d = pairwise_distances(embeddings, p)
    tl = d[:, :, None] - d[:, None, :] + margin
    mask = _triplet_mask(labels).astype(tl.dtype)
    tl = jnp.maximum(tl * mask, 0.0)
    num_positive = jnp.sum(tl > 1e-16)
    loss = jnp.sum(tl) / jnp.maximum(num_positive, 1)
    frac = num_positive / jnp.maximum(jnp.sum(mask), 1)
    return loss, frac


def batch_hard_triplet_loss(labels, embeddings, margin: float = 1.0, p: float = 2.0):
    """Hardest positive / hardest negative per anchor (reference
    ``loss.py:batch_hard_triplet_loss``)."""
    d = pairwise_distances(embeddings, p)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = (same & ~eye).astype(d.dtype)
    hardest_pos = jnp.max(d * pos_mask, axis=1)
    neg_mask = (~same).astype(d.dtype)
    max_d = jnp.max(d, axis=1, keepdims=True)
    hardest_neg = jnp.min(d + max_d * (1.0 - neg_mask), axis=1)
    return jnp.mean(jnp.maximum(hardest_pos - hardest_neg + margin, 0.0))


# ----------------------------------------------------------------- sampler
class PKSampler:
    """Yields batches of ``p`` labels x ``k`` samples each (reference
    ``sampler.py:PKSampler``; groups with < k samples are dropped,
    ``sampler.py:create_groups``)."""

    def __init__(self, groups, p: int, k: int, seed: int = 0):
        self.p, self.k = p, k
        self.rng = np.random.default_rng(seed)
        bins = defaultdict(list)
        for idx, g in enumerate(groups):
            bins[g].append(idx)
        self.bins = {g: v for g, v in bins.items() if len(v) >= k}
        if len(self.bins) < p:
            raise ValueError(f"need >= {p} labels with >= {k} samples")

    def __iter__(self):
        while True:
            labels = self.rng.choice(list(self.bins), self.p, replace=False)
            batch = []
            for g in labels:
                batch.extend(self.rng.choice(self.bins[g], self.k, replace=False))
            yield np.asarray(batch)


# ------------------------------------------------------------------- model
class EmbeddingNet:
    """Backbone + L2 normalise (reference ``model.py:EmbeddingNet``)."""

    def __init__(self, backbone=None, dims: int = 128):
        self.backbone = backbone or models.get_model("resnet50", num_classes=dims)

    def init(self, rng, x):
        return self.backbone.init(rng, x, train=False)

    def apply(self, variables, x, train: bool = False, **kw):
        out = self.backbone.apply(variables, x, train=train, **kw)
        logits = out[0] if isinstance(out, tuple) else out
        return logits / jnp.linalg.norm(logits, axis=-1, keepdims=True)


def evaluate_pair_accuracy(embeddings, labels, n_thresholds: int = 20):
    """Best pair accuracy over a distance-threshold sweep (reference
    ``test.py:evaluate``/``find_best_threshold``)."""
    d = pairwise_distances(embeddings)
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(d.shape[0], k=1)
    dists, truth = np.asarray(d)[iu], np.asarray(same)[iu]
    best = 0.0
    for t in np.linspace(dists.min(), dists.max(), n_thresholds):
        acc = float(((dists < t) == truth).mean())
        best = max(best, acc)
    return best


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="resnet18")
    p.add_argument("--embedding-dim", type=int, default=128)
    p.add_argument("--labels-per-batch", type=int, default=4, help="p")
    p.add_argument("--samples-per-label", type=int, default=4, help="k")
    p.add_argument("--image-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--margin", type=float, default=1.0)
    p.add_argument("--mining", choices=["batch_all", "batch_hard"],
                   default="batch_all")
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="SyntheticShapes corpus (learnable metric task)")
    p.add_argument("--train-size", type=int, default=1600)
    p.add_argument("--val-size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    rng = np.random.default_rng(args.seed)
    s = args.image_size
    p_, k = args.labels_per_batch, args.samples_per_label

    if args.synthetic:
        # glyph corpus: embedding must cluster by shape concept, and the
        # held-out pair accuracy is measured on unseen renders — the role
        # FashionMNIST plays for the reference's recipe
        from cpu_vision_tpu.datasets import SyntheticShapes

        ds = SyntheticShapes(args.train_size, (s, s, 3))
        images = np.stack([np.asarray(ds[i][0]) for i in range(len(ds))]).astype(np.float32) / 255.0
        groups = [int(ds[i][1]) for i in range(len(ds))]
        val_ds = SyntheticShapes(args.val_size, (s, s, 3), random_offset=args.train_size)
        val_images = np.stack([np.asarray(val_ds[i][0]) for i in range(len(val_ds))]).astype(np.float32) / 255.0
        val_groups = np.asarray([int(val_ds[i][1]) for i in range(len(val_ds))])
    else:
        # fake FashionMNIST-like corpus (the reference trains on FashionMNIST)
        n_corpus, n_labels = 10 * k, max(p_ + 1, 6)
        images = rng.random((n_corpus, s, s, 3), dtype=np.float32)
        groups = rng.integers(0, n_labels, n_corpus).tolist()
    sampler = iter(PKSampler(groups, p_, k, seed=args.seed))

    net = EmbeddingNet(models.get_model(args.model, num_classes=args.embedding_dim))
    sample = jnp.ones((p_ * k, s, s, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(args.seed), sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            vs = {"params": p}
            kw = {}
            if batch_stats is not None:
                vs["batch_stats"] = batch_stats
                kw = {"mutable": ["batch_stats"]}
            out = net.backbone.apply(vs, x, train=True, **kw)
            logits, new_stats = out if batch_stats is not None else (out, None)
            emb = logits / jnp.linalg.norm(logits, axis=-1, keepdims=True)
            if args.mining == "batch_all":
                loss, _ = batch_all_triplet_loss(y, emb, args.margin)
            else:
                loss = batch_hard_triplet_loss(y, emb, args.margin)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_stats = new_stats["batch_stats"] if new_stats is not None else None
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    for epoch in range(args.epochs):
        for step in range(args.steps_per_epoch):
            idx = next(sampler)
            x = jnp.asarray(images[idx])
            y = jnp.asarray([groups[i] for i in idx])
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, y)
            if step % 10 == 0:
                print(f"epoch {epoch} step {step} loss {float(loss):.4f}", flush=True)
        vs = {"params": params}
        if batch_stats is not None:
            vs["batch_stats"] = batch_stats
        if args.synthetic:
            emb = np.concatenate([
                np.asarray(net.apply(vs, jnp.asarray(val_images[lo:lo + p_ * k])))
                for lo in range(0, len(val_images) - p_ * k + 1, p_ * k)])
            g = val_groups[: emb.shape[0]]
            acc = evaluate_pair_accuracy(emb, g)
            # recall@1: nearest-neighbour label match (leave-one-out)
            d = np.array(pairwise_distances(jnp.asarray(emb)))  # writable copy
            np.fill_diagonal(d, np.inf)
            r1 = float((g[d.argmin(1)] == g).mean())
            print(f"eval held-out pair-accuracy (best threshold): {acc:.3f} "
                  f"recall@1: {r1:.3f}", flush=True)
        else:
            emb = net.apply(vs, jnp.asarray(images[: 4 * k]))
            acc = evaluate_pair_accuracy(emb, np.asarray(groups[: 4 * k]))
            print(f"eval pair-accuracy (best threshold): {acc:.3f}", flush=True)


if __name__ == "__main__":
    main()
