"""Brightness-constancy self-supervised reconstruction loss.

JAX re-design of ``/root/reference/loss/reconstruction.py`` (Paredes-Valles
et al. CVPR'21): (1) generative-model brightness increment error, (2) warped
temporal consistency, (3) total-variation regularization.

Shapes follow the reference: flow ``[B, 2, H, W]`` (ch 0 = x), images
``[B, 1, H, W]``, event lists IWE-ordered ``[B, N, 4]`` (ts, y, x, p).  The
reference's grid normalization uses the align_corners=True convention with an
align_corners=False sampler (``reconstruction.py:64-68``) — replicated as-is.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.losses.flow import averaged_iwe
from bmcnet_esr_tpu.losses.gradients import sobel
from bmcnet_esr_tpu.ops.warp import grid_sample_bilinear

Array = jax.Array


def _warp_grid(flow: Array, res: Tuple[int, int], flow_scaling: float) -> Array:
    """Backward-sampling grid in [-1, 1] (x, y), ``[B, H, W, 2]``
    (``reconstruction.py:64-68,108-112``)."""
    h, w = res
    my, mx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij")
    warped_y = my[None] - flow[:, 1] * flow_scaling
    warped_x = mx[None] - flow[:, 0] * flow_scaling
    gy = 2.0 * warped_y / (h - 1) - 1.0
    gx = 2.0 * warped_x / (w - 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)


def generative_model_loss(
    flow: Array,
    img: Array,
    event_cnt: Array,
    event_list: Array,
    pol_mask: Array,
    resolution: Tuple[int, int],
) -> Array:
    """Brightness increment L2 error (``reconstruction.py:46-97``).

    :param event_cnt: ``[B, 2, H, W]`` input count images (flow mask source)
    """
    res = resolution
    flow_scaling = max(res)

    # mask flow where no input events
    flow_mask = (jnp.sum(event_cnt, axis=1, keepdims=True) > 0).astype(flow.dtype)
    flow = flow * flow_mask

    grid = _warp_grid(flow, res, flow_scaling)
    img_gradx, img_grady = sobel(img)
    warped_grady = grid_sample_bilinear(img_grady, grid)
    warped_gradx = grid_sample_bilinear(img_gradx, grid)
    pred_delta_l = (warped_gradx * flow[:, 0:1] + warped_grady * flow[:, 1:2]) * flow_scaling

    avg_iwe = averaged_iwe(flow, event_list, pol_mask, res)
    event_delta_l = avg_iwe[:, 0:1] - avg_iwe[:, 1:2]

    bc_error = event_delta_l + pred_delta_l
    per_batch = jnp.sum(jnp.square(bc_error.reshape(bc_error.shape[0], -1)), axis=1)
    return jnp.sum(per_batch)


def temporal_consistency_loss(
    flow: Array,
    prev_img: Array,
    img: Array,
    resolution: Tuple[int, int],
    weight: float,
) -> Array:
    """L1 warping error between consecutive reconstructions
    (``reconstruction.py:99-132``)."""
    grid = _warp_grid(flow, resolution, max(resolution))
    warped_prev = grid_sample_bilinear(prev_img, grid)
    err = jnp.sum(jnp.abs(img - warped_prev))
    return weight * err


def total_variation_loss(img: Array, weight: float) -> Array:
    """Forward-difference TV (``reconstruction.py:134-145``)."""
    dx = jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :])
    dy = jnp.abs(img[:, :, :, :-1] - img[:, :, :, 1:])
    return weight * (jnp.sum(dx) + jnp.sum(dy))


class BrightnessConstancy:
    """Facade bundling the three components (reference class interface)."""

    def __init__(self, resolution: Tuple[int, int], regul_weights: Sequence[float] = (0.1, 0.1)):
        self.res = tuple(resolution)
        self.weights = tuple(regul_weights)

    def generative_model(self, flow, img, inputs: Dict) -> Array:
        return generative_model_loss(
            flow, img, inputs["inp_cnt"], inputs["inp_list"], inputs["inp_pol_mask"], self.res
        )

    def temporal_consistency(self, flow, prev_img, img) -> Array:
        return temporal_consistency_loss(flow, prev_img, img, self.res, self.weights[1])

    def regularization(self, img) -> Array:
        return total_variation_loss(img, self.weights[0])
