"""int8 engines: TASK-accuracy preservation, not just logit closeness.

Trains small float models to real held-out accuracy on SyntheticShapes,
then runs the int8 PTQ engines (Int8ResNet / Int8ViT) built from those
trained weights on the same held-out set.  The check is the accuracy
delta — the counterpart of the reference's published quantized-model
accuracies (e.g. ``models/quantization/resnet.py:160-186`` documents
ResNet50 int8 at 75.92 acc@1 vs 76.13 float, a 0.21 pt drop).

Slow tier (training on one CPU core).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


def _shapes_data(n_train, n_val, hw, seed_offset=0):
    from cpu_vision_tpu.datasets import SyntheticShapes

    train = SyntheticShapes(n_train, (hw, hw, 3), 4, random_offset=seed_offset)
    val = SyntheticShapes(n_val, (hw, hw, 3), 4,
                          random_offset=seed_offset + n_train)
    xt = jnp.asarray(np.stack([train[i][0] for i in range(n_train)]),
                     jnp.float32) / 255.0
    yt = jnp.asarray([train[i][1] for i in range(n_train)])
    xv = jnp.asarray(np.stack([val[i][0] for i in range(n_val)]),
                     jnp.float32) / 255.0
    yv = jnp.asarray([val[i][1] for i in range(n_val)])
    return xt, yt, xv, yv


def _train(model, xt, yt, steps, lr=1e-3, batch=32, seed=0, has_bn=True,
           target_train_acc=0.93):
    variables = model.init(jax.random.PRNGKey(seed), xt[:1], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            if has_bn:
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, xb,
                    train=True, mutable=["batch_stats"])
                bs = mut["batch_stats"]
            else:
                out = model.apply({"params": p}, xb, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(0)})
                bs = batch_stats
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out.astype(jnp.float32), yb).mean()
            return loss, bs

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    def eval_acc(params, batch_stats):
        vs = {"params": params}
        if has_bn and batch_stats:
            vs["batch_stats"] = batch_stats
        logits = model.apply(vs, xt[:256], train=False)
        return float(jnp.mean((jnp.argmax(logits, -1) == yt[:256]).astype(jnp.float32)))

    n = xt.shape[0]
    rng = np.random.default_rng(0)
    # train until the model actually fits (capped): the accuracy-delta
    # check below is only meaningful on a converged float model
    for s in range(steps):
        idx = rng.integers(0, n, batch)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, xt[idx], yt[idx])
        if (s + 1) % 50 == 0 and eval_acc(params, batch_stats) >= target_train_acc:
            break
    out = {"params": params}
    if has_bn and batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _acc(fwd, xv, yv, batch=64):
    hits = 0
    for i in range(0, xv.shape[0], batch):
        logits = fwd(xv[i : i + batch])
        hits += int(jnp.sum(jnp.argmax(logits, -1) == yv[i : i + batch]))
    return hits / xv.shape[0]


@pytest.mark.slow
def test_int8_resnet_task_accuracy_delta():
    from cpu_vision_tpu.models.quantization_resnet import Int8ResNet
    from cpu_vision_tpu.models.resnet import BasicBlock, ResNet

    # 2048 train samples: measured val-accuracy trajectory (one-core CPU)
    # is 0.58/0.66/0.70 at steps 100/200/300 — fewer samples overfit and
    # never clear 0.55 held-out
    xt, yt, xv, yv = _shapes_data(2048, 512, 40)
    model = ResNet(BasicBlock, [1, 1, 1, 1], num_classes=4)
    variables = _train(model, xt, yt, steps=400, lr=1e-3, batch=64)

    f_float = jax.jit(lambda t: model.apply(variables, t, train=False))
    acc_f = _acc(f_float, xv, yv)
    assert acc_f >= 0.62, f"float model failed to learn (acc {acc_f})"

    eng = Int8ResNet.from_model(model, variables).calibrate([xt[:64]])
    acc_q = _acc(jax.jit(eng), xv, yv)
    delta_pt = (acc_f - acc_q) * 100
    # reference quantized-resnet50 drop is 0.21 pt; allow headroom for the
    # small model / synthetic set (one flipped sample = 0.2 pt here)
    assert delta_pt <= 1.0, (
        f"int8 ResNet engine costs {delta_pt:.2f} pt accuracy "
        f"(float {acc_f:.4f} -> int8 {acc_q:.4f})")


@pytest.mark.slow
def test_int8_vit_task_accuracy_delta():
    from cpu_vision_tpu.models.quantization_vit import Int8ViT
    from cpu_vision_tpu.models.vision_transformer import VisionTransformer

    xt, yt, xv, yv = _shapes_data(2048, 512, 40)
    model = VisionTransformer(8, 2, 4, 256, 512, num_classes=4,
                              dtype=jnp.bfloat16)
    variables = _train(model, xt, yt, steps=600, lr=5e-4, batch=64,
                       has_bn=False)

    f_float = jax.jit(lambda t: model.apply(variables, t, train=False))
    acc_f = _acc(f_float, xv, yv)
    # the tiny no-inductive-bias ViT plateaus lower than the CNN on this
    # set (measured 0.58 at 600 steps); what the test checks is the DELTA
    assert acc_f >= 0.52, f"float ViT failed to learn (acc {acc_f})"

    eng = Int8ViT.from_model(model, variables).calibrate([xt[:64]])
    acc_q = _acc(jax.jit(eng), xv, yv)
    delta_pt = (acc_f - acc_q) * 100
    assert delta_pt <= 1.0, (
        f"int8 ViT engine costs {delta_pt:.2f} pt accuracy "
        f"(float {acc_f:.4f} -> int8 {acc_q:.4f})")
