"""Sobel spatial gradients (reference ``myutils/gradients.py:7-33``):
replication-pad 1, 3x3 Sobel kernels, /8 normalization."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_KX = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_KY = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def sobel(x: Array):
    """:param x: ``[B, C, H, W]``  :return: (gradx, grady), each ``[B*C, 1, H, W]``."""
    b, c, h, w = x.shape
    x = x.reshape(b * c, 1, h, w)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")

    def conv(k):
        return jax.lax.conv_general_dilated(
            x,
            jnp.asarray(k)[None, None],
            (1, 1),
            "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )

    return conv(_KX) / 8.0, conv(_KY) / 8.0
