"""Super SloMo upsampler parity vs reference-model goldens.

UNet weights are synthesized from the shape manifest + seeded numpy recipe
shared with tools/make_slomo_goldens.py (the goldens ship no state dicts)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from bmcnet_esr_tpu.data.upsampling import (
    adaptive_insert_count,
    backwarp,
    compute_flows,
    interpolate_frame,
    unet_apply,
)

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from slomo_fixture_weights import shapes_from_npz, synth_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "slomo_goldens.npz"))


def params(g, prefix):
    seed = {"fc": 33, "at": 34}[prefix]
    sd = synth_state_dict(shapes_from_npz(g, prefix), seed=seed)
    return {k: jnp.asarray(v) for k, v in sd.items()}


class TestSlomoParity:
    def test_flow_unet(self, g):
        fc = params(g, "fc")
        out = np.asarray(
            unet_apply(fc, jnp.concatenate([jnp.asarray(g["i0"]), jnp.asarray(g["i1"])], 1))
        )
        np.testing.assert_allclose(out, g["fc_out"], atol=2e-5, rtol=1e-4)

    def test_backwarp(self, g):
        got = np.asarray(backwarp(jnp.asarray(g["i1"]), jnp.asarray(g["flow"])))
        np.testing.assert_allclose(got, g["warped"], atol=2e-5)

    def test_full_interpolation(self, g):
        fc = params(g, "fc")
        at = params(g, "at")
        f01, f10 = compute_flows(fc, jnp.asarray(g["i0"]), jnp.asarray(g["i1"]))
        ft = interpolate_frame(at, jnp.asarray(g["i0"]), jnp.asarray(g["i1"]), f01, f10, 0.4)
        np.testing.assert_allclose(np.asarray(ft), g["ft"], atol=5e-5, rtol=1e-3)

    def test_adaptive_count(self, g):
        f = jnp.asarray(g["flow"])
        n = adaptive_insert_count(f, f)
        mag = float(np.sqrt((np.asarray(f) ** 2).sum(1)).max())
        assert n == int(np.ceil(mag))
