"""Pallas rasterizer kernel: parity vs the XLA scatter path.

Runs in interpreter mode on the CPU test mesh; the compiled kernel was
verified bit-exact on the real TPU chip (see ops/pallas/rasterize.py notes).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bmcnet_esr_tpu.ops.batch import batch_events_to_counts
from bmcnet_esr_tpu.ops.pallas.rasterize import pallas_available, pallas_events_to_counts

pytestmark = pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")


@pytest.mark.parametrize("hw", [(12, 16), (45, 80)])
def test_matches_xla_scatter(hw):
    h, w = hw
    rng = np.random.default_rng(0)
    b, n = 3, 512
    ev = np.zeros((b, 4, n), np.float32)
    ev[:, 0] = rng.integers(-2, w + 2, (b, n))
    ev[:, 1] = rng.integers(-2, h + 2, (b, n))
    ev[:, 3] = rng.integers(0, 2, (b, n)) * 2 - 1
    ev[:, :, -40:] = 0  # padding tail
    want = np.asarray(batch_events_to_counts(jnp.asarray(ev), (h, w)))
    got = np.asarray(pallas_events_to_counts(jnp.asarray(ev), (h, w), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_backend_switch():
    rng = np.random.default_rng(1)
    ev = np.zeros((2, 5, 4, 64), np.float32)
    ev[..., 0, :] = rng.integers(0, 8, (2, 5, 64))
    ev[..., 1, :] = rng.integers(0, 8, (2, 5, 64))
    ev[..., 3, :] = rng.integers(0, 2, (2, 5, 64)) * 2 - 1
    a = np.asarray(batch_events_to_counts(jnp.asarray(ev), (8, 8), backend="xla"))
    assert a.shape == (2, 5, 8, 8, 2)
