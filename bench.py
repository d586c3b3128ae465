"""Headline benchmark — prints ONE JSON line.

Run on real TPU by the driver.  Headline metric: fused Canny throughput on
1080p frames (north-star target: 2 GPix/s per v5e chip).

Resilience (round-2 postmortem, VERDICT.md): the axon TPU relay can fail or
hang on backend init, and a single rc!=0 or timeout loses the round's perf
record.  So the PARENT process never imports jax at all — it launches the
actual benchmark as a ``--child`` subprocess under a timeout, retries once
with a smaller workload on any failure, and on a hard double failure still
prints a parseable JSON line carrying an ``"error"`` field, exiting 0.
"""

import json
import os
import subprocess
import sys
import time

TARGET_GPIX_S = 2.0  # BASELINE.md: fused Canny >= 2 GPix/s per chip on 1080p

# Repo-local persistent compile cache (round-3 postmortem: /tmp is wiped
# between the builder's round and the driver's end-of-round bench run, so
# the child paid the 65-350 s remote compile again and timed out).  The
# cache entries are committed to the repo; a warmed cache lets the child
# skip the remote compile entirely when the relay's executable
# serialization path is healthy.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_compile_cache")

# Budget: the axon relay's remote-compile latency is wildly variable —
# measured 65 s to 350 s for the SAME small program within one hour
# (round-3 probes).  Give the real attempt most of a ~600 s driver
# budget, and keep a short smaller-workload retry inside the remainder.
_CHILD_TIMEOUT_S = 420
_RETRY_TIMEOUT_S = 150


# ---------------------------------------------------------------- child ----

def _sync(out):
    """Force execution.  On the axon-relayed TPU, ``block_until_ready`` does
    not actually synchronise — a small readback does (and orders all prior
    work on the stream)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8]))


def _time_fn(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _scene(h: int, w: int, batch: int):
    """Synthetic 1080p scene with realistic edge density: blocks, a disc,
    a smooth gradient, mild noise."""
    import numpy as np

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.3 + 0.2 * (xx / w)
    img[200:700, 300:900] = 0.8
    img[400:900, 1100:1700] = 0.15
    disc = (yy - 540) ** 2 + (xx - 960) ** 2 < 200**2
    img[disc] = 0.95
    img = img + rng.normal(0, 0.01, (h, w)).astype(np.float32)
    return np.broadcast_to(img, (batch, h, w)).reshape(batch, h, w, 1).copy()


def _child(iters: int, batch: int) -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: harmless when the relay re-compiles anyway,
    # and skips the remote compile entirely when its executable
    # serialization path is healthy.
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from cpu_vision_tpu import ops

    h, w = 1080, 1920
    imgs = jnp.asarray(_scene(h, w, batch))

    fn = jax.jit(lambda x: ops.canny(x, low_threshold=0.1, high_threshold=0.2))
    dt = _time_fn(fn, imgs, iters=iters)
    gpix_s = batch * h * w / dt / 1e9
    print(json.dumps({
        "metric": "canny_1080p_gpix_s",
        "value": round(gpix_s, 3),
        "unit": "GPix/s",
        "vs_baseline": round(gpix_s / TARGET_GPIX_S, 3),
    }))


# --------------------------------------------------------------- parent ----

def _parse_json_line(text: str):
    """Last line of ``text`` that parses to a dict with a 'metric' key."""
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj
    return None


def _run_child(iters: int, batch: int, timeout_s: int):
    """(parsed_json_or_None, error_description_or_None)."""
    cmd = [sys.executable, __file__, "--child", str(iters), str(batch)]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return None, f"child timed out after {timeout_s}s"
    if proc.stderr:
        sys.stderr.write(proc.stderr[-2000:])
    parsed = _parse_json_line(proc.stdout or "")
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:] or ["<no stderr>"]
        return None, f"child rc={proc.returncode}: {tail[0][:300]}"
    if parsed is None:
        return None, "child exited 0 but printed no JSON metric line"
    return parsed, None


def warm() -> None:
    """Populate the repo-local compile cache (run while the relay is alive).

    Uses the exact shapes ``main()``'s attempts use, so the driver-time
    child gets cache hits instead of a 65-350 s remote compile.
    """
    for iters, batch in [(2, 8)]:
        parsed, err = _run_child(iters, batch, _CHILD_TIMEOUT_S)
        print(f"warm(iters={iters}, batch={batch}): "
              f"{'ok ' + json.dumps(parsed) if parsed else 'FAILED: ' + str(err)}")


def main() -> None:
    # Both attempts use the SAME batch shape: compile time dominates end to
    # end (compute is <1 s), and a single shape means one cache entry
    # covers every attempt, warmed or not.
    attempts = [(30, 8, _CHILD_TIMEOUT_S), (5, 8, _RETRY_TIMEOUT_S)]
    errors = []
    for iters, batch, timeout_s in attempts:
        parsed, err = _run_child(iters, batch, timeout_s)
        if parsed is not None:
            print(json.dumps(parsed))
            return
        errors.append(err)
        sys.stderr.write(f"bench attempt failed ({err}); "
                         f"{'retrying smaller' if len(errors) < len(attempts) else 'giving up'}\n")
    print(json.dumps({
        "metric": "canny_1080p_gpix_s",
        "value": 0.0,
        "unit": "GPix/s",
        "vs_baseline": 0.0,
        "error": " | ".join(e or "?" for e in errors),
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--warm":
        warm()
    else:
        main()
