"""LPIPS parity vs reference PNetLin goldens over the full option surface:
{alex, vgg, squeeze} x {v0.0, v0.1} x {scalar, spatial} net-lin (shipped head
weights), plain-`net` mode, and the resnet feature extractors.

Backbones are seeded-random nets rebuilt here from tools/lpips_fixture_nets
(the same constructors the golden generator stubbed into torchvision), so the
goldens ship only inputs + outputs.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from bmcnet_esr_tpu.losses.lpips import (
    LPIPS,
    convert_backbone_state_dict,
    convert_resnet_state_dict,
    load_lin_weights,
    perceptual_loss,
    resnet_features,
)

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
WEIGHTS = "/root/reference/loss/PerceptualSimilarity/models/weights"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import lpips_fixture_nets as nets  # noqa: E402

_BUILDERS = {
    "alex": nets.make_alex_features,
    "vgg": nets.make_vgg16_features,
    "squeeze": nets.make_squeeze_features,
}


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "lpips_goldens.npz"))


@pytest.fixture(scope="module")
def backbones():
    return {
        net: convert_backbone_state_dict(
            {k: v.numpy() for k, v in builder().state_dict().items()}, net
        )
        for net, builder in _BUILDERS.items()
    }


def build(backbones, net, version="0.1", spatial=False, lpips=True):
    lin_name = "vgg" if net in ("vgg", "vgg16") else net
    lins = (
        load_lin_weights(os.path.join(WEIGHTS, f"v{version}", f"{lin_name}.pth"), net)
        if lpips
        else None
    )
    return LPIPS(backbones[net], lins, net, version=version, spatial=spatial, lpips=lpips)


def inputs(g, spatial):
    if spatial:
        return jnp.asarray(g["in0_sq"]), jnp.asarray(g["in1_sq"])
    return jnp.asarray(g["in0"]), jnp.asarray(g["in1"])


class TestNetLin:
    @pytest.mark.slow
    @pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
    @pytest.mark.parametrize("version", ["0.0", "0.1"])
    @pytest.mark.parametrize("spatial", [False, True], ids=["scalar", "spatial"])
    def test_matches_reference(self, g, backbones, net, version, spatial):
        lp = build(backbones, net, version, spatial)
        in0, in1 = inputs(g, spatial)
        out = np.asarray(lp(in0, in1))
        want = g[f"{net}/v{version}/{'spatial' if spatial else 'scalar'}"]
        assert out.shape == want.shape
        np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)

    def test_zero_distance_for_identical(self, g, backbones):
        lp = build(backbones, "alex")
        out = np.asarray(lp(jnp.asarray(g["in0"]), jnp.asarray(g["in0"])))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_ret_per_layer(self, g, backbones):
        lp = build(backbones, "squeeze")
        val, res = lp(jnp.asarray(g["in0"]), jnp.asarray(g["in1"]), ret_per_layer=True)
        assert len(res) == 7  # squeeze taps
        np.testing.assert_allclose(
            np.asarray(sum(res[1:], res[0])), np.asarray(val), rtol=1e-6
        )


class TestPlainNet:
    @pytest.mark.parametrize("net", ["alex", "squeeze"])
    @pytest.mark.parametrize("spatial", [False, True], ids=["scalar", "spatial"])
    def test_matches_reference(self, g, backbones, net, spatial):
        lp = build(backbones, net, spatial=spatial, lpips=False)
        in0, in1 = inputs(g, spatial)
        out = np.asarray(lp(in0, in1))
        want = g[f"{net}/plain/{'spatial' if spatial else 'scalar'}"]
        assert out.shape == want.shape
        np.testing.assert_allclose(out, want, atol=5e-5, rtol=1e-4)


class TestResnet:
    @pytest.mark.parametrize("num", [18, 50])
    def test_taps_match_reference(self, g, num):
        net = nets.make_resnet(num)
        params = convert_resnet_state_dict(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )
        taps = resnet_features(params, jnp.asarray(g["in0"]), num)
        assert len(taps) == 5
        for i, tap in enumerate(taps):
            want = g[f"resnet{num}/tap{i}"]
            assert tap.shape == want.shape
            np.testing.assert_allclose(np.asarray(tap), want, atol=1e-4, rtol=1e-4)

    @pytest.mark.slow
    def test_deep_variants_construct(self, g):
        """34/101/152 share the block code; one forward sanity each."""
        for num in (34, 101, 152):
            net = nets.make_resnet(num)
            params = convert_resnet_state_dict(
                {k: v.numpy() for k, v in net.state_dict().items()}
            )
            taps = resnet_features(params, jnp.asarray(g["in0"][:1]), num)
            assert len(taps) == 5 and all(np.isfinite(np.asarray(t)).all() for t in taps)


class TestFakeNets:
    def test_l2_matches_reference_formula(self, g):
        import torch

        from bmcnet_esr_tpu.losses.lpips import l2_distance

        in0, in1 = g["in0"], g["in1"]
        got = np.asarray(l2_distance(jnp.asarray(in0), jnp.asarray(in1)))
        # reference L2.forward RGB (networks_basic.py:163-167), oracled
        t0, t1 = torch.tensor(in0), torch.tensor(in1)
        n, c, x, y = t0.shape
        want = torch.mean(
            torch.mean(torch.mean((t0 - t1) ** 2, dim=1).view(n, 1, x, y), dim=2).view(n, 1, 1, y),
            dim=3,
        ).view(n)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)

    def test_dssim_quantization_and_range(self, g):
        from bmcnet_esr_tpu.losses.lpips import _tensor2im_quantize, dssim_distance

        # tensor2im quantization: [-1,1] -> truncated [0,255]
        x = jnp.asarray(np.array([[-1.0, -0.5, 0.0, 0.996, 1.0]], np.float32))
        np.testing.assert_array_equal(
            np.asarray(_tensor2im_quantize(x)), [[0.0, 63.0, 127.0, 254.0, 255.0]]
        )
        d_same = np.asarray(dssim_distance(jnp.asarray(g["in0"]), jnp.asarray(g["in0"])))
        np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
        d = np.asarray(dssim_distance(jnp.asarray(g["in0"]), jnp.asarray(g["in1"])))
        assert d.shape == (2,) and (d > 0).all() and (d <= 0.5 + 1e-6).all()


class TestDistanceModelFacade:
    def test_dispatch_matches_components(self, g, backbones):
        import torch

        from bmcnet_esr_tpu.losses.lpips import DistanceModel, dssim_distance, l2_distance

        sd = {k: v.numpy() for k, v in _BUILDERS["alex"]().state_dict().items()}
        lin = os.path.join(WEIGHTS, "v0.1", "alex.pth")
        in0, in1 = jnp.asarray(g["in0"]), jnp.asarray(g["in1"])

        netlin = DistanceModel("net-lin", "alex", backbone_state_dict=sd, lin_weights_path=lin)
        np.testing.assert_allclose(
            np.asarray(netlin(in0, in1)), g["alex/v0.1/scalar"], atol=2e-5, rtol=1e-4
        )
        plain = DistanceModel("net", "alex", backbone_state_dict=sd)
        np.testing.assert_allclose(
            np.asarray(plain(in0, in1)), g["alex/plain/scalar"], atol=5e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(DistanceModel("L2")(in0, in1)), np.asarray(l2_distance(in0, in1))
        )
        np.testing.assert_allclose(
            np.asarray(DistanceModel("ssim")(in0, in1)), np.asarray(dssim_distance(in0, in1))
        )
        assert netlin.name == "net-lin [alex]" and DistanceModel("L2").name == "L2"
        with pytest.raises(ValueError, match="not recognized"):
            DistanceModel("nope")


def test_perceptual_loss_channel_broadcast(g, backbones):
    lp = build(backbones, "alex")
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
