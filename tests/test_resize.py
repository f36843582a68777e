"""Resize parity vs torch.nn.functional.interpolate (the reference's resizer)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from bmcnet_esr_tpu.ops import resize_bicubic, resize_bilinear, upsample_bilinear


def _torch_resize(x_nchw, out_hw, mode):
    t = torch.tensor(x_nchw)
    return F.interpolate(t, size=out_hw, mode=mode, align_corners=False).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((22, 40), (90, 160)),  # the NFS down16->x4 shape-mismatch fixup
        ((45, 80), (180, 320)),
        ((16, 16), (7, 9)),  # downscale
        ((5, 7), (5, 7)),  # identity
    ],
)
def test_matches_torch(mode, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = _torch_resize(x, out_hw, mode)
    x_nhwc = jnp.array(x.transpose(0, 2, 3, 1))
    fn = resize_bicubic if mode == "bicubic" else resize_bilinear
    got = np.asarray(fn(x_nhwc, out_hw)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_upsample_bilinear_matches_scale_factor_path():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 11, 13)).astype(np.float32)
    want = F.interpolate(
        torch.tensor(x), scale_factor=4, mode="bilinear", align_corners=False
    ).numpy()
    got = np.asarray(
        upsample_bilinear(jnp.array(x.transpose(0, 2, 3, 1)), 4)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_channel_free_layout():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 10, 12)).astype(np.float32)
    want = _torch_resize(x[None], (20, 24), "bicubic")[0]
    got = np.asarray(resize_bicubic(jnp.array(x), (20, 24), channel_last=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
