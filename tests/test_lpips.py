"""LPIPS parity vs reference PNetLin goldens (random backbones + shipped
v0.1 linear heads)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from bmcnet_esr_tpu.losses.lpips import (
    LPIPS,
    convert_backbone_state_dict,
    load_lin_weights,
    perceptual_loss,
)

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
LIN_DIR = "/root/reference/loss/PerceptualSimilarity/models/weights/v0.1"


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "lpips_goldens.npz"))


def build(g, net):
    sd = {k.split("/sd/")[1]: g[k] for k in g.files if k.startswith(f"{net}/sd/")}
    lin_name = "vgg" if net in ("vgg", "vgg16") else net
    lins = load_lin_weights(os.path.join(LIN_DIR, f"{lin_name}.pth"), net)
    return LPIPS(convert_backbone_state_dict(sd, net), lins, net)


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_matches_reference(g, net):
    lp = build(g, net)
    out = np.asarray(lp(jnp.asarray(g["in0"]), jnp.asarray(g["in1"])))
    np.testing.assert_allclose(out, g[f"{net}/out"], atol=2e-5, rtol=1e-4)


def test_zero_distance_for_identical(g):
    lp = build(g, "alex")
    out = np.asarray(lp(jnp.asarray(g["in0"]), jnp.asarray(g["in0"])))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_perceptual_loss_channel_broadcast(g):
    lp = build(g, "alex")
    rng = np.random.default_rng(0)
    one = jnp.asarray(rng.random((1, 1, 33, 37)).astype(np.float32))
    two = jnp.asarray(rng.random((1, 1, 33, 37)).astype(np.float32))
    d1 = float(perceptual_loss(lp, one, two))
    assert np.isfinite(d1) and d1 > 0
    # 2-channel path averages per-channel distances
    p2 = jnp.concatenate([one, one], axis=1)
    t2 = jnp.concatenate([two, two], axis=1)
    d2 = float(perceptual_loss(lp, p2, t2))
    assert d2 == pytest.approx(d1, rel=1e-5)
