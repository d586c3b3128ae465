"""Forward-snapshot regression for EVERY registered builder (the reference's
``test/expect`` strategy, ``test/test_models.py:133-155``): drift in any
model's forward breaks this suite.

Regenerate after an intentional change with::

    CVT_EXPECT_ACCEPT=1 python -m pytest tests/test_expect_models.py
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from expect_harness import (  # noqa: E402
    fingerprint,
    load_expected,
    save_expected,
    EXPECT_PATH,
)

ACCEPT = os.environ.get("CVT_EXPECT_ACCEPT") == "1"


def _names():
    from cpu_vision_tpu import models

    return models.list_models()


_ACCEPTED = {}


@pytest.mark.parametrize("name", _names())
def test_forward_snapshot(name):
    got = fingerprint(name)
    if ACCEPT:
        _ACCEPTED.update(got)
        # merge-write on every test so partial runs still persist
        merged = load_expected()
        merged.update(_ACCEPTED)
        save_expected(merged)
        pytest.skip("accepted new snapshot")
    expected = load_expected()
    key = f"{name}/nleaves"
    assert key in expected, (
        f"no stored snapshot for {name} — run with CVT_EXPECT_ACCEPT=1 "
        f"to create {EXPECT_PATH}")
    assert int(expected[key][0]) == int(got[key][0])
    n = int(got[key][0])
    for i in range(n):
        np.testing.assert_array_equal(expected[f"{name}/{i}/shape"],
                                      got[f"{name}/{i}/shape"])
        exp_s = expected[f"{name}/{i}/sample"]
        got_s = got[f"{name}/{i}/sample"]
        scale = max(float(np.abs(exp_s).max()), 1e-3)
        np.testing.assert_allclose(got_s, exp_s, atol=2e-3 * scale,
                                   err_msg=f"{name} output {i} drifted")
        np.testing.assert_allclose(got[f"{name}/{i}/stats"],
                                   expected[f"{name}/{i}/stats"],
                                   atol=2e-3 * max(float(np.abs(expected[f'{name}/{i}/stats']).max()), 1e-3),
                                   err_msg=f"{name} output {i} stats drifted")
