"""Unsupervised flow losses: contrast maximization + averaged IWE.

JAX re-design of ``/root/reference/loss/flow.py``:

* :func:`event_warping_loss` — per-polarity images of averaged timestamps of
  forward/backward warped events, minimized, plus Charbonnier flow smoothness
  (``flow.py:15-110``, Zhu et al. CVPR'19 contrast maximization).
* :func:`averaged_iwe` — per-pixel average of warped event counts where the
  average is over the number of *distinct source pixels* contributing to each
  destination pixel per polarity (``flow.py:113-232``).  The reference counts
  with a per-batch ``torch.unique`` python loop (data-dependent shapes); here
  the unique-triple count is computed with a fixed-shape lexicographic
  ``lax.sort`` + first-occurrence mask + scatter — fully jittable.

Event lists are IWE-ordered ``[B, N, 4]`` (ts, y, x, p); ``pol_mask`` is
``[B, N, 2]`` as produced by :func:`...ops.encodings.events_polarity_mask`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.losses.iwe import (
    event_flow_lookup,
    get_interpolation,
    interpolate,
)

Array = jax.Array


def event_warping_loss(
    flow_list: Sequence[Array],
    event_list: Array,
    pol_mask: Array,
    resolution: Tuple[int, int],
    flow_regul_weight: float,
) -> Array:
    """Contrast-maximization loss over a list of ``[B, 2, H, W]`` flow maps."""
    res = resolution
    flow_scaling = max(res)
    pol4 = jnp.concatenate([pol_mask] * 4, axis=1)
    ts4 = jnp.concatenate([event_list[:, :, 0:1]] * 4, axis=1)

    total = 0.0
    for flow in flow_list:
        event_flow = event_flow_lookup(flow, event_list, res)

        def avg_ts_images(tref, ts_weight):
            idx, weights = get_interpolation(event_list, event_flow, tref, res, flow_scaling)
            iwe_pos = interpolate(idx, weights, res, polarity_mask=pol4[:, :, 0:1])
            iwe_neg = interpolate(idx, weights, res, polarity_mask=pol4[:, :, 1:2])
            ts_pos = interpolate(idx, weights * ts_weight, res, polarity_mask=pol4[:, :, 0:1])
            ts_neg = interpolate(idx, weights * ts_weight, res, polarity_mask=pol4[:, :, 1:2])
            return ts_pos / (iwe_pos + 1e-9), ts_neg / (iwe_neg + 1e-9)

        fw_pos_ts, fw_neg_ts = avg_ts_images(1.0, ts4)
        bw_pos_ts, bw_neg_ts = avg_ts_images(0.0, 1.0 - ts4)

        flow_map = flow.reshape(flow.shape[0], 2, res[0], res[1])
        flow_dx = flow_map[:, :, :-1, :] - flow_map[:, :, 1:, :]
        flow_dy = flow_map[:, :, :, :-1] - flow_map[:, :, :, 1:]
        smooth = jnp.sum(jnp.sqrt(flow_dx**2 + 1e-6)) + jnp.sum(jnp.sqrt(flow_dy**2 + 1e-6))

        total = total + (
            jnp.sum(fw_pos_ts**2)
            + jnp.sum(fw_neg_ts**2)
            + jnp.sum(bw_pos_ts**2)
            + jnp.sum(bw_neg_ts**2)
            + flow_regul_weight * smooth
        )
    return total


def _unique_contrib(pol: Array, src: Array, dst: Array, hw: int) -> Tuple[Array, Array]:
    """#distinct (pol, src) combos per dst pixel, split by polarity.

    ``pol`` in {0 neg, 1 pos, 2 unfeasible}; shapes ``[N]``.  Jittable
    replacement for the reference's per-batch ``torch.unique`` counting
    (``flow.py:179-224``).
    """
    pol32 = pol.astype(jnp.int32)
    src32 = src.astype(jnp.int32)
    dst32 = dst.astype(jnp.int32)
    spol, ssrc, sdst = jax.lax.sort((pol32, src32, dst32), num_keys=3)
    first = jnp.ones_like(spol, dtype=jnp.bool_)
    same = (spol[1:] == spol[:-1]) & (ssrc[1:] == ssrc[:-1]) & (sdst[1:] == sdst[:-1])
    first = first.at[1:].set(~same)
    pos_w = (first & (spol == 1)).astype(jnp.float32)
    neg_w = (first & (spol == 0)).astype(jnp.float32)
    pos = jnp.zeros((hw,), jnp.float32).at[sdst].add(pos_w, mode="drop")
    neg = jnp.zeros((hw,), jnp.float32).at[sdst].add(neg_w, mode="drop")
    return pos, neg


def averaged_iwe(
    flow: Array,
    event_list: Array,
    pol_mask: Array,
    resolution: Tuple[int, int],
) -> Array:
    """Per-pixel, per-polarity average number of warped events
    (``flow.py:113-232``), ``[B, 2, H, W]``."""
    res = resolution
    hw = res[0] * res[1]
    flow_scaling = max(res)

    src_idx = (event_list[:, :, 1] * res[1] + event_list[:, :, 2]).astype(jnp.int32)
    event_flow = event_flow_lookup(flow, event_list, res)
    fw_idx, fw_weights = get_interpolation(
        event_list, event_flow, 1.0, res, flow_scaling, round_idx=True
    )
    iwe_pos = interpolate(fw_idx, fw_weights, res, polarity_mask=pol_mask[:, :, 0:1])
    iwe_neg = interpolate(fw_idx, fw_weights, res, polarity_mask=pol_mask[:, :, 1:2])

    # polarity code: 1 pos, 0 neg, 2 unfeasible mapping (flow.py:161-163)
    pol = jnp.where(event_list[:, :, 3] < 1, 0, 1)
    pol = jnp.where(fw_weights[:, :, 0] == 0, 2, pol)

    pos_c, neg_c = jax.vmap(lambda p, s, d: _unique_contrib(p, s, d, hw))(
        pol, src_idx, fw_idx[:, :, 0].astype(jnp.int32)
    )
    pos_c = pos_c.reshape(-1, 1, res[0], res[1])
    neg_c = neg_c.reshape(-1, 1, res[0], res[1])

    iwe_pos = jnp.where(pos_c > 0, iwe_pos / jnp.maximum(pos_c, 1.0), iwe_pos)
    iwe_neg = jnp.where(neg_c > 0, iwe_neg / jnp.maximum(neg_c, 1.0), iwe_neg)
    return jnp.concatenate([iwe_pos, iwe_neg], axis=1)
