"""Trainer-attachable loss-term builders.

The reference ships a loss zoo (LPIPS, flow contrast-maximization,
brightness-constancy reconstruction — ``/root/reference/loss/``) but its
trainer only ever builds MSE (``train.py:647-649``); nothing else is
reachable from a config.  Here every term is reachable: the ``loss:`` config
block (``bmcnet_esr_tpu.training.losses``) resolves names — builtin or
dotted-path — to the builders in this module.

A builder is ``build(cfg: dict, ctx: LossContext) -> term``, where the term
is ``fn(pred_fit, gt, aux) -> scalar`` traced inside the BPTT scan body:

* ``pred_fit`` — HR prediction, resized to the GT grid when needed (NHWC)
* ``gt``       — GT count image of the step's second window (NHWC)
* ``aux``      — per-step context dict:
    ``pred``       raw model output before any resize (NHWC)
    ``prev_pred``  previous step's output (the recurrent ``o`` carry slot)
    ``inp``        the step's input windows ``[B, seqn, H, W, 2]``
    ``step``       scan index (int32 scalar)
    ``events``     the step's raw event window ``[B, 4, N]`` (x, y, ts, p) —
                   present only when a term sets ``needs_events`` (requires
                   ``compact_transfer: False``, since the compact format
                   drops timestamps)

Terms must be jit-traceable (static shapes, no data-dependent Python).

Flow/reconstruction terms (``event_warping``, ``brightness_constancy``)
consume a flow map from ``aux`` — for the BMCNet ESR models that key does not
exist (they predict counts), so those terms serve recipes whose model emits
flow (``flow_key: pred`` reads the model's own prediction as the flow map).
The recon-family term that IS meaningful for count-image SR is
``lr_consistency``: mean-pooling the HR prediction back to the LR grid must
reproduce the observed LR counts (the GT window holds ``scale^2 x`` the
events of the input window over the same span — ``h5dataset.py:362-390`` —
so per-pixel densities match under mean pooling).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LossContext:
    """Static shape/config facts available to term builders."""

    inp_resolution: Tuple[int, int]
    gt_resolution: Tuple[int, int]
    scale: int
    seqn: int = 2


def _require_ctx(ctx, name):
    if ctx is None:
        raise ValueError(
            f"loss term {name!r} needs a LossContext (resolutions/scale); "
            "build it through the Trainer or pass ctx= to build_extra_losses"
        )
    return ctx


def _iwe_event_list(
    events: Array, n_valid: Array | None = None
) -> Tuple[Array, Array]:
    """Raw ``[B, 4, N]`` (x, y, ts, p) window -> IWE-ordered ``[B, N, 4]``
    (ts, y, x, p) event list + ``[B, N, 2]`` polarity mask (the layouts
    ``losses.flow``/``losses.iwe`` consume; ts normalized to [0, 1] like
    ``BaseDataset.event_formatting``, ``base_dataset.py:24-31``).

    ``n_valid`` (``[B]``, from ``aux['events_len']``): valid counts of
    zero-padded windows.  Without it a padded window's ``ts[-1] == 0``
    poisons the normalization denominator for every REAL event in the
    window (the pad events themselves are already excluded by the polarity
    mask, but the corrupted timestamps are not)."""
    from bmcnet_esr_tpu.ops.encodings import (
        events_polarity_mask,
        normalize_event_times,
    )

    xs, ys, ts, ps = events[:, 0], events[:, 1], events[:, 2], events[:, 3]
    if n_valid is None:
        ts_n = jax.vmap(normalize_event_times)(ts)
    else:
        ts_n = jax.vmap(normalize_event_times)(ts, n_valid.astype(jnp.int32))
    event_list = jnp.stack([ts_n, ys, xs, ps], axis=-1)
    pol_mask = jax.vmap(events_polarity_mask)(ps)
    return event_list, pol_mask


def _flow_nchw(aux: Dict, flow_key: str, name: str) -> Array:
    flow = aux.get(flow_key)
    if flow is None:
        raise ValueError(
            f"loss term {name!r} reads the flow map from aux[{flow_key!r}], "
            "which this model does not provide — it applies to recipes whose "
            "model outputs flow (set flow_key: pred to use the prediction)"
        )
    if flow.shape[-1] == 2 and flow.shape[1] != 2:  # NHWC -> NCHW
        flow = jnp.moveaxis(flow, -1, 1)
    return flow


# -- reconstruction family ---------------------------------------------------

def lr_consistency(cfg: Dict, ctx: "LossContext | None") -> Callable:
    """Self-supervised recon term for count-image SR: the HR prediction,
    mean-pooled back to the LR grid, must match the observed LR input counts
    (see module docstring for why mean pooling is density-preserving)."""
    norm = cfg.get("norm", "l1")
    if norm not in ("l1", "l2"):
        raise ValueError(f"lr_consistency norm must be l1|l2, got {norm!r}")

    def fn(pred, gt, aux):
        # the step's CURRENT window is the pair's index 1 — the one the GT
        # aligns to (train_step._rollout_losses gts_seq slicing); [:, -1]
        # would read a LATER window whenever seqn > 2
        x = aux["inp"][:, 1]  # [B, H, W, 2]
        b, kh, kw, c = pred.shape
        h, w = x.shape[1], x.shape[2]
        if kh % h or kw % w:
            raise ValueError(
                f"lr_consistency needs integer HR/LR factor, got {kh}x{kw} "
                f"over {h}x{w}"
            )
        down = pred.reshape(b, h, kh // h, w, kw // w, c).mean(axis=(2, 4))
        err = down - x
        return jnp.mean(jnp.abs(err)) if norm == "l1" else jnp.mean(jnp.square(err))

    return fn


def temporal_consistency(cfg: Dict, ctx: "LossContext | None") -> Callable:
    """Consecutive-prediction consistency (``reconstruction.py:99-132``).

    With a flow source (``flow_key`` present in aux) the previous prediction
    is backward-warped by it before the L1, exactly like the reference; for
    flow-free ESR models the zero-flow case reduces to an identity warp —
    plain L1 between consecutive HR predictions.  Step 0 (previous output is
    the zero init state) is masked out.
    """
    flow_key = cfg.get("flow_key")

    def fn(pred, gt, aux):
        cur, prev = aux["pred"], aux["prev_pred"]
        if flow_key is not None:
            from bmcnet_esr_tpu.losses.reconstruction import _warp_grid
            from bmcnet_esr_tpu.ops.warp import grid_sample_bilinear

            flow = _flow_nchw(aux, flow_key, "temporal_consistency")
            res = (cur.shape[1], cur.shape[2])
            grid = _warp_grid(flow, res, max(res))
            prev = jnp.moveaxis(
                grid_sample_bilinear(jnp.moveaxis(prev, -1, 1), grid), 1, -1
            )
        valid = (aux["step"] > 0).astype(cur.dtype)
        return valid * jnp.mean(jnp.abs(cur - prev))

    return fn


def total_variation(cfg: Dict, ctx: "LossContext | None") -> Callable:
    """TV regularizer on the prediction (``reconstruction.py:134-145``;
    mean-reduced so the weight is resolution-independent)."""

    def fn(pred, gt, aux):
        dx = jnp.abs(pred[:, :-1] - pred[:, 1:])
        dy = jnp.abs(pred[:, :, :-1] - pred[:, :, 1:])
        return jnp.mean(dx) + jnp.mean(dy)

    return fn


def brightness_constancy(cfg: Dict, ctx: "LossContext | None") -> Callable:
    """The reference's self-supervised recon loss (``reconstruction.py:17``)
    as a trainer term, for recipes whose model predicts flow and/or image
    brightness: generative-model brightness-increment error on the step's
    event window.  ``flow_key``/``img_key`` select the aux entries
    (``img_key: pred`` reads the model prediction as the reconstruction)."""
    ctx = _require_ctx(ctx, "brightness_constancy")
    flow_key = cfg.get("flow_key", "flow")
    img_key = cfg.get("img_key", "pred")

    def fn(pred, gt, aux):
        from bmcnet_esr_tpu.losses.reconstruction import generative_model_loss
        from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

        flow = _flow_nchw(aux, flow_key, "brightness_constancy")
        img = aux[img_key]
        if img.shape[-1] in (1, 2) and img.ndim == 4:
            img = jnp.moveaxis(img, -1, 1)
        img = jnp.mean(img, axis=1, keepdims=True)  # [B, 1, H, W] brightness
        events = aux["events"]
        res = ctx.inp_resolution
        event_cnt = jnp.moveaxis(batch_events_to_counts(events, res), -1, 1)
        event_list, pol_mask = _iwe_event_list(events, aux.get("events_len"))
        raw = generative_model_loss(flow, img, event_cnt, event_list, pol_mask, res)
        return raw / event_list.shape[1]  # per-event scale

    fn.needs_events = True
    return fn


# -- flow family -------------------------------------------------------------

def event_warping(cfg: Dict, ctx: "LossContext | None") -> Callable:
    """Contrast-maximization flow loss (``flow.py:15-110``) as a trainer
    term, for recipes whose model predicts flow: warp the step's events by
    the predicted flow and minimize the averaged-timestamp images."""
    ctx = _require_ctx(ctx, "event_warping")
    flow_key = cfg.get("flow_key", "pred")
    regul = float(cfg.get("flow_regul_weight", 0.001))

    def fn(pred, gt, aux):
        from bmcnet_esr_tpu.losses.flow import event_warping_loss

        flow = _flow_nchw(aux, flow_key, "event_warping")
        event_list, pol_mask = _iwe_event_list(aux["events"], aux.get("events_len"))
        raw = event_warping_loss(
            [flow], event_list, pol_mask, ctx.inp_resolution, regul
        )
        return raw / event_list.shape[1]  # per-event scale

    fn.needs_events = True
    return fn


# -- fidelity extras ---------------------------------------------------------

def ssim(cfg: Dict, ctx: "LossContext | None") -> Callable:
    """``1 - SSIM`` on the fitted prediction (skimage semantics,
    ``loss/restore.py:44-65``); data_range from the GT like the reference's
    ``ssim_loss`` wrapper unless pinned in the spec."""
    win = int(cfg.get("win_size", 7))
    pinned_range = cfg.get("data_range")

    def fn(pred, gt, aux):
        from bmcnet_esr_tpu.losses.restore import ssim as ssim_fn

        dr = (
            jnp.asarray(pinned_range, pred.dtype)
            if pinned_range is not None
            else jnp.maximum(jnp.max(gt) - jnp.min(gt), 1e-6)
        )
        # channels are independent 2-D images (counts): mean over B x C maps
        p = jnp.moveaxis(pred, -1, 1)
        g = jnp.moveaxis(gt, -1, 1)
        return 1.0 - ssim_fn(p, g, dr, win_size=win)

    return fn
