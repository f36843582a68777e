"""Golden parity of the unsupervised flow/reconstruction losses + warp ops."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.losses.flow import averaged_iwe, event_warping_loss
from bmcnet_esr_tpu.losses.gradients import sobel
from bmcnet_esr_tpu.losses.iwe import (
    compute_pol_iwe,
    events_to_iwe_order,
    get_interpolation,
    interpolate,
)
from bmcnet_esr_tpu.losses.reconstruction import (
    generative_model_loss,
    temporal_consistency_loss,
    total_variation_loss,
)
from bmcnet_esr_tpu.ops.warp import grid_sample_bilinear

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "loss_goldens.npz"))


class TestGoldenParity:
    def test_event_warping(self, g):
        res = tuple(g["res"])
        got = event_warping_loss(
            [jnp.asarray(g["flow"])],
            jnp.asarray(g["event_list"]),
            jnp.asarray(g["pol_mask"]),
            res,
            flow_regul_weight=0.01,
        )
        assert float(got) == pytest.approx(float(g["ew_loss"]), rel=1e-4)

    def test_averaged_iwe(self, g):
        res = tuple(g["res"])
        got = averaged_iwe(
            jnp.asarray(g["flow"]),
            jnp.asarray(g["event_list"]),
            jnp.asarray(g["pol_mask"]),
            res,
        )
        np.testing.assert_allclose(np.asarray(got), g["aiwe"], atol=1e-4)

    def test_generative_model(self, g):
        res = tuple(g["res"])
        got = generative_model_loss(
            jnp.asarray(g["flow"]),
            jnp.asarray(g["img"]),
            jnp.asarray(g["cnt"]),
            jnp.asarray(g["event_list"]),
            jnp.asarray(g["pol_mask"]),
            res,
        )
        assert float(got) == pytest.approx(float(g["gm"]), rel=1e-3)

    def test_temporal_consistency(self, g):
        res = tuple(g["res"])
        got = temporal_consistency_loss(
            jnp.asarray(g["flow"]),
            jnp.asarray(g["prev_img"]),
            jnp.asarray(g["img"]),
            res,
            weight=0.2,
        )
        assert float(got) == pytest.approx(float(g["tc"]), rel=1e-4)

    def test_total_variation(self, g):
        got = total_variation_loss(jnp.asarray(g["img"]), weight=0.1)
        assert float(got) == pytest.approx(float(g["tv"]), rel=1e-5)


class TestWarpOps:
    def test_grid_sample_matches_torch(self):
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
        grid = (rng.random((2, 5, 7, 2)).astype(np.float32) * 2.4) - 1.2  # incl. OOB
        want = F.grid_sample(
            torch.tensor(img), torch.tensor(grid), mode="bilinear",
            padding_mode="zeros", align_corners=False,
        ).numpy()
        got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_sobel_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 1, 8, 10)).astype(np.float32)
        xp = F.pad(torch.tensor(x), (1, 1, 1, 1), mode="replicate")
        ka = torch.tensor([[[[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]]])
        kb = torch.tensor([[[[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]]]])
        want_gx = (F.conv2d(xp, ka) / 8).numpy()
        want_gy = (F.conv2d(xp, kb) / 8).numpy()
        gx, gy = sobel(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gx), want_gx, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy), want_gy, atol=1e-6)

    def test_interpolation_bilinear_weights_sum(self):
        # in-frame warped events distribute unit mass over 4 corners
        ev = jnp.asarray(
            np.array([[[0.5, 3.2, 4.7, 1.0], [0.25, 1.0, 1.0, -1.0]]], np.float32)
        )
        flow = jnp.zeros((1, 2, 2))
        idx, w = get_interpolation(ev, flow, 1.0, (8, 8), 8.0)
        np.testing.assert_allclose(np.asarray(w).sum(), 2.0, rtol=1e-5)
        img = interpolate(idx, w, (8, 8))
        np.testing.assert_allclose(np.asarray(img).sum(), 2.0, rtol=1e-5)

    def test_compute_pol_iwe_shape(self):
        rng = np.random.default_rng(2)
        n = 32
        ev = np.stack(
            [
                np.sort(rng.random(n)).astype(np.float32),
                rng.integers(0, 8, n).astype(np.float32),
                rng.integers(0, 8, n).astype(np.float32),
                (rng.integers(0, 2, n) * 2 - 1).astype(np.float32),
            ],
            axis=1,
        )[None]
        pos = jnp.asarray(np.maximum(ev[:, :, 3:4], 0))
        neg = jnp.asarray(-np.minimum(ev[:, :, 3:4], 0))
        flow = jnp.zeros((1, 2, 8, 8))
        out = compute_pol_iwe(flow, jnp.asarray(ev), (8, 8), pos, neg, 8.0)
        assert out.shape == (1, 2, 8, 8)
        # zero flow + round_idx: IWE == plain per-polarity counts
        assert float(out.sum()) == pytest.approx(n, rel=1e-5)

    def test_events_to_iwe_order(self):
        e = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))  # [4, N=2]
        out = np.asarray(events_to_iwe_order(e))
        # (x,y,t,p) columns -> rows (ts,y,x,p)
        np.testing.assert_array_equal(out[0], [4.0, 2.0, 0.0, 6.0])
