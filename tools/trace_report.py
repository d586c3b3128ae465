"""Capture a jax.profiler trace of a workload and print a per-op time
report (the profile-first evidence VERDICT r2 item 4 asks for).

Parses the perfetto ``trace.json.gz`` the profiler writes — no tensorboard
needed on this host.  Usage:

    python tools/trace_report.py r50_train      # R50 b128 bf16 train step
    python tools/trace_report.py r50_infer      # R50 b256 bf16 inference
    python tools/trace_report.py vit_infer      # ViT-B/16 b256 bf16 inference
    python tools/trace_report.py int8_e2e       # Int8ResNet R50 b256

Writes the trace under /tmp/cvt-trace-<name>/ and prints the top-N ops by
self duration plus a duty-cycle estimate per TPU core track.
"""

import collections
import glob
import gzip
import json
import os
import sys
import time
from functools import partial

# make `python tools/trace_report.py` work from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8].astype(jnp.float32)))


def _r50(dtype=jnp.bfloat16, classes=1000):
    from cpu_vision_tpu import models

    m = models.get_model("resnet50", num_classes=classes, dtype=dtype)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    return m, v


def workload_r50_train():
    import optax

    m, variables = _r50()
    tx = optax.sgd(0.1, momentum=0.9)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, 128))

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, mut = m.apply({"params": p, "batch_stats": batch_stats}, x,
                               train=True, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out.astype(jnp.float32), y).mean()
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    state = (params, batch_stats, opt_state)

    def run_once(state):
        out = step(*state, x, y)
        return (out[0], out[1], out[2]), out[3]

    return run_once, state


def workload_r50_infer():
    m, v = _r50()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    # weights ride as jit ARGUMENTS — closing over them embeds them as
    # program constants and overflows the axon relay's compile-payload limit
    f = jax.jit(lambda v, t: m.apply(v, t, train=False))
    return (lambda s: (s, f(v, x))), None


def workload_vit_infer():
    from cpu_vision_tpu import models

    m = models.get_model("vit_b_16", num_classes=1000, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda v, t: m.apply(v, t, train=False))
    return (lambda s: (s, f(v, x))), None


def workload_swin_infer():
    from cpu_vision_tpu import models

    m = models.get_model("swin_t", num_classes=1000, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda v, t: m.apply(v, t, train=False))
    return (lambda s: (s, f(v, x))), None


def workload_int8_e2e():
    from cpu_vision_tpu.models.quantization_resnet import Int8ResNet

    m, v = _r50(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32))
    eng = Int8ResNet.from_model(m, v).calibrate([x[:16]])
    f = jax.jit(eng)
    return (lambda s: (s, f(x))), None


def workload_convnext_infer():
    from cpu_vision_tpu import models

    m = models.get_model("convnext_tiny", num_classes=1000, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda v, t: m.apply(v, t, train=False))
    return (lambda s: (s, f(v, x))), None


def _frcnn(dtype):
    from cpu_vision_tpu.models import detection as det

    rcnn = det.FasterRCNN(num_classes=91, rpn_pre_nms_top_n=1000,
                          rpn_post_nms_top_n=300, max_detections=100,
                          dtype=dtype)
    rng = np.random.default_rng(0)
    dx = jnp.asarray(rng.random((8, 640, 640, 3), dtype=np.float32))
    v = rcnn.init(jax.random.PRNGKey(0), dx[:1], train=False)
    f = jax.jit(lambda v, t: rcnn.apply(v, t, train=False))
    return (lambda s: (s, f(v, dx))), None


def workload_frcnn_infer():
    return _frcnn(jnp.float32)


def workload_frcnn_bf16():
    return _frcnn(jnp.bfloat16)


def workload_swin3d_infer():
    from cpu_vision_tpu import models

    m = models.get_model("swin3d_t", num_classes=400, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3)), train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 16, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda v, t: m.apply(v, t, train=False))
    return (lambda s: (s, f(v, x))), None


def workload_raft_infer():
    from cpu_vision_tpu import models

    m = models.get_model("raft_large", iters=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.random((2, 448, 1024, 3), dtype=np.float32)) * 2 - 1
    f2 = jnp.asarray(rng.random((2, 448, 1024, 3), dtype=np.float32)) * 2 - 1
    v = m.init(jax.random.PRNGKey(0), f1[:1], f2[:1])
    f = jax.jit(lambda v, a, b: m.apply(v, a, b)[-1])
    return (lambda s: (s, f(v, f1, f2))), None


def workload_int8_vit():
    from cpu_vision_tpu import models
    from cpu_vision_tpu.models.quantization_vit import Int8ViT

    vit = models.get_model("vit_b_16", num_classes=1000, dtype=jnp.bfloat16)
    v = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32))
    eng = Int8ViT.from_model(vit, v).calibrate([x[:8]])
    f = jax.jit(eng)
    return (lambda s: (s, f(x))), None


def workload_effnet_infer():
    from cpu_vision_tpu import models

    m = models.get_model("efficientnet_b0", num_classes=1000, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda v, t: m.apply(v, t, train=False))
    return (lambda s: (s, f(v, x))), None


def workload_mnv3_infer():
    from cpu_vision_tpu import models

    m = models.get_model("mobilenet_v3_large", num_classes=1000, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 224, 224, 3), dtype=np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda v, t: m.apply(v, t, train=False))
    return (lambda s: (s, f(v, x))), None


WORKLOADS = {
    "r50_train": workload_r50_train,
    "frcnn_infer": workload_frcnn_infer,
    "frcnn_bf16": workload_frcnn_bf16,
    "effnet_infer": workload_effnet_infer,
    "mnv3_infer": workload_mnv3_infer,
    "int8_vit": workload_int8_vit,
    "swin3d_infer": workload_swin3d_infer,
    "raft_infer": workload_raft_infer,
    "convnext_infer": workload_convnext_infer,
    "r50_infer": workload_r50_infer,
    "vit_infer": workload_vit_infer,
    "swin_infer": workload_swin_infer,
    "int8_e2e": workload_int8_e2e,
}


def capture(name: str, iters: int = 5):
    run, state = WORKLOADS[name]()
    # warmup/compile outside the trace
    for _ in range(2):
        state, out = run(state)
    _sync(out)
    tdir = f"/tmp/cvt-trace-{name}"
    with jax.profiler.trace(tdir):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, out = run(state)
        _sync(out)
        wall = (time.perf_counter() - t0) / iters
    print(f"# {name}: {wall * 1e3:.2f} ms/iter over {iters} traced iters")
    return tdir, wall


def report(tdir: str, top: int = 35):
    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print(f"no trace.json.gz under {tdir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # thread-name metadata -> pick device compute tracks
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]

    by_name = collections.Counter()
    track_busy = collections.Counter()
    track_span = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        tname = tid_names.get(key, "")
        lname = tname.lower()
        if not ("tensorcore" in lname or "xla" in lname or "core" in lname
                or "device" in lname):
            continue
        dur = e.get("dur", 0)
        by_name[e.get("name", "?")] += dur
        track_busy[tname] += dur
        t0, t1 = e.get("ts", 0), e.get("ts", 0) + dur
        lo, hi = track_span.get(tname, (t0, t1))
        track_span[tname] = (min(lo, t0), max(hi, t1))

    total = sum(by_name.values())
    print(f"\n## ops by total self time ({path})")
    print(f"{'us':>12}  {'%':>6}  name")
    for name, dur in by_name.most_common(top):
        print(f"{dur:12.0f}  {100 * dur / max(total, 1):6.2f}  {name[:110]}")

    print("\n## track duty cycle")
    for tname, busy in track_busy.most_common(10):
        lo, hi = track_span[tname]
        span = max(hi - lo, 1)
        print(f"  {tname}: busy {busy / 1e3:.1f} ms / span {span / 1e3:.1f} ms "
              f"= {100 * busy / span:.1f}%")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "r50_train"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tdir, _ = capture(name, iters)
    report(tdir)
