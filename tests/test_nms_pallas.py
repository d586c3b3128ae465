"""Blocked VMEM-resident NMS kernel (``ops/pallas/nms.py``) vs the exact
greedy oracle (``ops/boxes.py:nms``, itself parity-tested against the
reference ``csrc/ops/cpu/nms_kernel.cpp`` loop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpu_vision_tpu.ops.boxes import nms
from cpu_vision_tpu.ops.pallas.nms import nms_sorted_pallas

INTERP = jax.default_backend() != "tpu"


def _mk(rng, p, n, spread=30.0):
    ctr = rng.random((p, n, 2)) * 100
    wh = rng.random((p, n, 2)) * spread + 1
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.random((p, n)).astype(np.float32))[:, ::-1].copy()
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize("n,p,thr", [(1000, 3, 0.5), (4096, 2, 0.7),
                                     (300, 1, 0.3), (130, 2, 0.5)])
def test_matches_greedy_oracle(rng, n, p, thr):
    boxes, scores = _mk(rng, p, n)
    ref = jax.vmap(lambda b, s: nms(b, s, thr))(boxes, scores)
    got = nms_sorted_pallas(boxes, thr, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_dense_overlaps_long_chains(rng):
    # heavily-overlapping boxes -> deep suppression chains across blocks
    p, n = 2, 512
    ctr = rng.random((p, n, 2)) * 20  # crowded field
    wh = rng.random((p, n, 2)) * 15 + 5
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.random((p, n)).astype(np.float32))[:, ::-1].copy()
    b, s = jnp.asarray(boxes), jnp.asarray(scores)
    ref = jax.vmap(lambda bb, ss: nms(bb, ss, 0.5))(b, s)
    got = nms_sorted_pallas(b, 0.5, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_padding_entries_never_suppress(rng):
    # n not a block multiple: zero-area pad boxes must not suppress anyone
    boxes, scores = _mk(rng, 1, 200)
    ref = nms(boxes[0], scores[0], 0.5)
    got = nms_sorted_pallas(boxes, 0.5, interpret=INTERP)[0]
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
