"""Pixel (un)shuffle parity vs torch, across the NHWC<->NCHW layout change."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from bmcnet_esr_tpu.ops import pixel_shuffle, pixel_unshuffle


def torch_pixel_unshuffle(x, r):
    """Reference models/submodules.py:80-92."""
    b, c, h, w = x.shape
    oh, ow = h // r, w // r
    v = x.contiguous().view(b, c, oh, r, ow, r)
    return v.permute(0, 1, 3, 5, 2, 4).contiguous().view(b, c * r * r, oh, ow)


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_shuffle_matches_torch(r):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2 * r * r, 5, 7)).astype(np.float32)
    want = F.pixel_shuffle(torch.tensor(x), r).numpy()
    got = np.asarray(pixel_shuffle(jnp.array(x.transpose(0, 2, 3, 1)), r))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_unshuffle_matches_torch(r):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2, 6 * r, 4 * r)).astype(np.float32)
    want = torch_pixel_unshuffle(torch.tensor(x), r).numpy()
    got = np.asarray(pixel_unshuffle(jnp.array(x.transpose(0, 2, 3, 1)), r))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.array(rng.standard_normal((1, 8, 12, 2)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pixel_shuffle(pixel_unshuffle(x, 4), 4)), np.asarray(x)
    )
