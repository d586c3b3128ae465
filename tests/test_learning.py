"""End-to-end learning: models actually learn (overfit) on tiny data."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cpu_vision_tpu.ops.cnn import cnn_forward, cnn_init


def test_cnn_overfits_tiny_dataset(rng):
    """LeNet-style CNN drives training accuracy to ~100% on 32 samples."""
    n, hw, classes = 32, 16, 4
    x = jnp.asarray(rng.random((n, hw, hw, 1), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, classes, n))
    params = cnn_init(jax.random.PRNGKey(0), (hw, hw), 1, (16, 32), 64, classes)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = cnn_forward(p, x)
            return optax.softmax_cross_entropy(logits, jax.nn.one_hot(y, classes)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first_loss = None
    for i in range(150):
        params, opt_state, loss = step(params, opt_state)
        if first_loss is None:
            first_loss = float(loss)
    acc = float(jnp.mean((jnp.argmax(cnn_forward(params, x), -1) == y).astype(jnp.float32)))
    assert float(loss) < first_loss * 0.1, f"loss didn't drop: {first_loss} -> {float(loss)}"
    assert acc >= 0.95, f"failed to overfit: acc {acc}"


def test_fused_gaussian_blur_matches(rng):
    from cpu_vision_tpu import ops
    from cpu_vision_tpu.ops.pallas import fused_gaussian_blur

    img = jnp.asarray(rng.random((2, 40, 56, 3), dtype=np.float32))
    ref = np.asarray(ops.gaussian_blur(img, 5, 1.5))
    out = np.asarray(fused_gaussian_blur(img, 5, 1.5, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_swin_v2_forward(rng):
    from cpu_vision_tpu import models

    m = models.get_model("swin_v2_t", num_classes=5)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 5) and bool(jnp.all(jnp.isfinite(out)))
    assert "swin_v2_s" in models.list_models() and "swin_v2_b" in models.list_models()


def test_swin_non_multiple_window(rng):
    # 80x80 -> stage maps 20/10/5: needs the window-multiple padding path
    from cpu_vision_tpu import models

    m = models.get_model("swin_t", num_classes=3)
    x = jnp.asarray(rng.random((1, 80, 80, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 3) and bool(jnp.all(jnp.isfinite(out)))


def test_dilated_backbone_output_stride8():
    from cpu_vision_tpu.models.resnet import Bottleneck, ResNet

    bb = ResNet(Bottleneck, (3, 4, 6, 3), replace_stride_with_dilation=(False, True, True))
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x, train=False)
    feats = bb.apply(v, x, train=False, features_only=True)
    assert feats["layer4"].shape[1:3] == (8, 8)  # stride 8, not 2


def test_keypoint_loss_finite(rng):
    from cpu_vision_tpu.models import detection as det

    m = det.KeypointRCNN(num_classes=2, num_keypoints=5, rpn_pre_nms_top_n=50,
                         rpn_post_nms_top_n=16, max_detections=4)
    x = jnp.ones((1, 128, 128, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.apply(v, x, train=False, method=lambda mm, im, train: mm.backbone(im, train=train))
    rois = jnp.asarray([[[10.0, 10, 60, 60], [30.0, 30, 90, 90]]])
    kps = jnp.asarray(rng.random((1, 2, 5, 2)) * 50 + 15).astype(jnp.float32)
    loss = m.apply(v, feats[:4], rois, kps, jnp.ones((1, 2, 5), bool),
                   jnp.ones((1, 2), bool), (128, 128), method=m.keypoint_loss)
    # CE over 56x56 heatmap positions ~ ln(3136) at random init
    assert 6.0 < float(loss) < 10.0


def test_synthetic_shapes_learnable(rng):
    """SyntheticShapes: deterministic, label-consistent, and linearly separable
    enough that a tiny CNN beats chance by a wide margin on held-out data."""
    from cpu_vision_tpu.datasets import SyntheticShapes

    ds = SyntheticShapes(64, (32, 32, 3), 4)
    img, y = ds[3]
    img2, y2 = ds[3]
    assert (img == img2).all() and y == y2 and img.dtype == np.uint8

    # train tiny CNN on 256 samples, eval on 64 disjoint ones
    import optax
    train = SyntheticShapes(256, (32, 32, 3), 4)
    val = SyntheticShapes(64, (32, 32, 3), 4, random_offset=256)
    xt = jnp.asarray(np.stack([train[i][0] for i in range(256)]), jnp.float32) / 255.0
    yt = jnp.asarray([train[i][1] for i in range(256)])
    xv = jnp.asarray(np.stack([val[i][0] for i in range(64)]), jnp.float32) / 255.0
    yv = jnp.asarray([val[i][1] for i in range(64)])

    params = cnn_init(jax.random.PRNGKey(0), (32, 32), 3, (16, 32), 64, 4)
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = cnn_forward(p, xt)
            return optax.softmax_cross_entropy(logits, jax.nn.one_hot(yt, 4)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(200):
        params, opt_state, _ = step(params, opt_state)
    acc = float(jnp.mean((jnp.argmax(cnn_forward(params, xv), -1) == yv).astype(jnp.float32)))
    assert acc >= 0.6, f"held-out acc only {acc} — dataset not learnable"
