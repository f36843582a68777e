"""Image-of-warped-events (IWE) ops — jittable counterparts of
``/root/reference/myutils/iwe.py``.

Event lists here follow the reference IWE convention ``[B, N, 4]`` with
columns ``(ts, y, x, p)`` (``iwe.py:20-35``); ``ts`` normalized to [0, 1].
All functions are batch-first, fixed-shape, autodiff-friendly (the losses
differentiate through the warp weights).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def purge_unfeasible(idx: Array, res: Tuple[int, int]) -> Tuple[Array, Array]:
    """Zero out-of-frame (y, x) indices and return the validity mask
    (``iwe.py:4-17``)."""
    mask = (
        (idx[..., 0:1] >= 0)
        & (idx[..., 0:1] < res[0])
        & (idx[..., 1:2] >= 0)
        & (idx[..., 1:2] < res[1])
    ).astype(idx.dtype)
    return idx * mask, mask


def get_interpolation(
    events: Array,
    flow: Array,
    tref: float,
    res: Tuple[int, int],
    flow_scaling: float,
    round_idx: bool = False,
) -> Tuple[Array, Array]:
    """Warp events by per-event flow and compute scatter indices + weights
    (``iwe.py:20-72``).

    :param events: ``[B, N, 4]`` (ts, y, x, p)
    :param flow: ``[B, N, 2]`` per-event (y, x) flow
    :return: flat indices ``[B, M, 1]`` (M = N if rounded else 4N) and
        bilinear weights ``[B, M, 1]``
    """
    warped = events[:, :, 1:3] + (tref - events[:, :, 0:1]) * flow * flow_scaling

    if round_idx:
        idx = jnp.round(warped)
        weights = jnp.ones_like(idx)
    else:
        top_y = jnp.floor(warped[:, :, 0:1])
        bot_y = top_y + 1.0
        left_x = jnp.floor(warped[:, :, 1:2])
        right_x = left_x + 1.0
        idx = jnp.concatenate(
            [
                jnp.concatenate([top_y, left_x], 2),
                jnp.concatenate([top_y, right_x], 2),
                jnp.concatenate([bot_y, left_x], 2),
                jnp.concatenate([bot_y, right_x], 2),
            ],
            axis=1,
        )
        warped4 = jnp.concatenate([warped] * 4, axis=1)
        weights = jnp.maximum(0.0, 1.0 - jnp.abs(warped4 - idx))

    idx, mask = purge_unfeasible(idx, res)
    weights = jnp.prod(weights, axis=-1, keepdims=True) * mask
    flat = idx[..., 0:1] * res[1] + idx[..., 1:2]
    return flat, weights


def interpolate(
    idx: Array,
    weights: Array,
    res: Tuple[int, int],
    polarity_mask: Optional[Array] = None,
) -> Array:
    """Scatter warped events into ``[B, 1, H, W]`` (``iwe.py:75-90``)."""
    if polarity_mask is not None:
        weights = weights * polarity_mask
    b = idx.shape[0]
    flat = jax.vmap(
        lambda i, w: jnp.zeros((res[0] * res[1],), weights.dtype)
        .at[i[:, 0].astype(jnp.int32)]
        .add(w[:, 0], mode="drop")
    )(idx, weights)
    return flat.reshape(b, 1, res[0], res[1])


def event_flow_lookup(flow_map: Array, events: Array, res: Tuple[int, int]) -> Array:
    """Per-event (y, x) flow gathered at each event's source pixel
    (``iwe.py:107-117`` / ``flow.py:44-57``).

    :param flow_map: ``[B, 2, H, W]`` (channel 0 = x, 1 = y flow)
    :param events: ``[B, N, 4]`` (ts, y, x, p)
    :return: ``[B, N, 2]`` (y, x) flow per event
    """
    flat_idx = (events[:, :, 1] * res[1] + events[:, :, 2]).astype(jnp.int32)
    fm = flow_map.reshape(flow_map.shape[0], 2, -1)
    fy = jnp.take_along_axis(fm[:, 1, :], flat_idx, axis=1)
    fx = jnp.take_along_axis(fm[:, 0, :], flat_idx, axis=1)
    return jnp.stack([fy, fx], axis=-1)


def deblur_events(
    flow_map: Array,
    event_list: Array,
    res: Tuple[int, int],
    flow_scaling: float = 128,
    round_idx: bool = True,
    polarity_mask: Optional[Array] = None,
) -> Array:
    """Forward-warp events to ``tref = 1`` (``iwe.py:93-127``)."""
    event_flow = event_flow_lookup(flow_map, event_list, res)
    fw_idx, fw_weights = get_interpolation(
        event_list, event_flow, 1.0, res, flow_scaling, round_idx=round_idx
    )
    if not round_idx and polarity_mask is not None:
        polarity_mask = jnp.concatenate([polarity_mask] * 4, axis=1)
    return interpolate(fw_idx, fw_weights, res, polarity_mask=polarity_mask)


def compute_pol_iwe(
    flow_map: Array,
    event_list: Array,
    res: Tuple[int, int],
    pos_mask: Array,
    neg_mask: Array,
    flow_scaling: float = 128,
    round_idx: bool = True,
) -> Array:
    """Per-polarity IWE, ``[B, 2, H, W]`` (``iwe.py:130-151``)."""
    iwe_pos = deblur_events(
        flow_map, event_list, res, flow_scaling, round_idx, polarity_mask=pos_mask
    )
    iwe_neg = deblur_events(
        flow_map, event_list, res, flow_scaling, round_idx, polarity_mask=neg_mask
    )
    return jnp.concatenate([iwe_pos, iwe_neg], axis=1)


def events_to_iwe_order(events_xytp: Array) -> Array:
    """Adapter: pipeline layout ``[..., 4, N]`` (x, y, t, p) ->
    IWE layout ``[..., N, 4]`` (ts, y, x, p)."""
    e = jnp.moveaxis(events_xytp, -2, -1)
    return jnp.stack([e[..., 2], e[..., 1], e[..., 0], e[..., 3]], axis=-1)
