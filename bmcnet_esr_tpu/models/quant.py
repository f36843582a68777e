"""Static activation-scale calibration for the int8 serving mode.

The int8 path (``QuantConv``, models/layers.py) quantizes activations with a
per-LANE (batch-entry) symmetric scale, so batched streams stay exactly
independent.  By default the scale is *dynamic* (per-lane max|x|/127
recomputed every call).  Calibrating static scales removes that max-reduce
pass from the rollout hot loop — measured on v5e bench shapes: bf16 932 →
dynamic int8 990 → static int8 1051 voxel-frames/sec (+12.8% over bf16).

Calibration runs the recurrent model step-by-step over a few representative
window pairs with ``mutable=["quant_stats"]``; every ``QuantConv`` sows its
running activation max, which this module folds into a ``quant`` variable
collection (leaf ``act_scale`` per conv) that rides along with ``params`` in
the variables dict.  No new checkpoint format: scales are derived at serving
time from the data actually being served (the reference has no counterpart —
this is a TPU-native capability beyond parity).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# the |x| quantile grid every calibration pass records (layers._CALIB_QUANTILES
# is the sow site); `calibrate_act_scales(percentile=...)` picks one
from bmcnet_esr_tpu.models.layers import _CALIB_QUANTILES as CALIB_QUANTILES


# module-level so repeated calibrations (the engine re-derives scales per
# rollout group) hit the SAME jit cache instead of re-tracing a fresh closure
@functools.partial(jax.jit, static_argnums=0)
def _calib_step(model, v, pair, carry):
    outs, upd = model.apply(v, pair, *carry, mutable=["quant_stats"])
    return tuple(outs), upd["quant_stats"]


def _stats_to_scales(node: Any, q_index: int | None = None) -> Any:
    """quant_stats tree -> quant tree: turn the sown range stats (flax sow
    wraps them in a tuple) into ``act_scale`` leaves, preserving nesting.

    ``q_index is None`` uses the per-lane max (``act_max``); otherwise the
    ``act_q`` quantile-grid row at that index — percentile calibration clips
    the heavy outlier tail of event activations so the 254 int8 steps cover
    the mass of the distribution (values past the clip saturate at ±127,
    which the int8 conv tolerates by design)."""
    if isinstance(node, dict):
        out: Dict[str, Any] = {}
        for k, v in node.items():
            if k == "act_max" and q_index is None:
                leaf = v[0] if isinstance(v, (tuple, list)) else v
                out["act_scale"] = jnp.maximum(jnp.asarray(leaf, jnp.float32), 1e-12) / 127.0
            elif k == "act_q" and q_index is not None:
                leaf = v[0] if isinstance(v, (tuple, list)) else v
                out["act_scale"] = (
                    jnp.maximum(jnp.asarray(leaf[q_index], jnp.float32), 1e-12) / 127.0
                )
            elif k in ("act_max", "act_q"):
                continue  # the unselected stat
            else:
                out[k] = _stats_to_scales(v, q_index)
        return out
    return node


def calibrate_act_scales(
    model,
    variables: Dict[str, Any],
    pairs: Array,
    carry: Tuple[Array, ...],
    max_steps: int = 16,
    percentile: float | None = None,
) -> Dict[str, Any]:
    """Run ``max_steps`` recurrent steps over ``pairs`` (``[S, B, 2, H, W, 2]``
    count-window pairs, engine layout) recording per-conv activation ranges,
    and return ``variables`` extended with the calibrated ``quant``
    collection.  The recurrent carry is advanced exactly as the serving
    rollout advances it (the model returns the next carry with ``pred`` in
    the feedback slot), so recorded ranges include recurrent-state growth.

    ``percentile``: ``None`` (default) calibrates scales from the per-lane
    max|x|; a value from :data:`CALIB_QUANTILES` instead clips at that |x|
    quantile — event activations are heavy-tailed, and spending the int8
    range on a few outliers costs resolution everywhere else (measured on
    the released checkpoint: see tests/test_model_parity.py::TestInt8Serving
    and docs/DESIGN.md §6).

    No-op (returns ``variables`` unchanged) for non-quantized models.
    """
    q_index = None
    if percentile is not None:
        if percentile not in CALIB_QUANTILES:
            raise ValueError(
                f"percentile must be one of {CALIB_QUANTILES} (the grid the "
                f"calibration pass records), got {percentile!r}"
            )
        q_index = CALIB_QUANTILES.index(percentile)
    if not getattr(model, "quant", False):
        return variables

    stats = None
    carry = tuple(carry)
    n = min(int(pairs.shape[0]), max_steps)
    for i in range(n):
        outs, upd = _calib_step(model, variables, pairs[i], carry)
        carry = outs
        stats = upd if stats is None else jax.tree.map(jnp.maximum, stats, upd)

    if stats is None:
        return variables
    return {**variables, "quant": _stats_to_scales(stats, q_index)}


def calibrate_from_h5(
    model,
    variables: Dict[str, Any],
    path: str,
    prefix: str,
    resolution: Tuple[int, int],
    window: int,
    n_windows: int = 16,
) -> Dict[str, Any]:
    """Startup calibration from a representative recording: rasterize the
    first ``n_windows`` event windows of ``{prefix}_events`` in ``path``
    (packager schema, SURVEY §2 `event_packagers.py:128-156`) and fold their
    activation maxima into static scales via :func:`calibrate_act_scales`.

    Static scales are the serving FAST path (no per-call max pass; +6% over
    dynamic on v5e); correctness does not depend on them — scales are
    per-lane either way, so pooled/batched streams always equal their solo
    rollouts.  A single-lane calibration broadcasts to any pool width.
    """
    import h5py
    import numpy as np

    from bmcnet_esr_tpu.inference.streaming import pad_window
    from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

    h, w = int(resolution[0]), int(resolution[1])
    with h5py.File(path, "r") as f:
        g = f[f"{prefix}_events"]
        need = (n_windows + 1) * window
        xs = np.asarray(g["xs"][:need], np.float32)
        ys = np.asarray(g["ys"][:need], np.float32)
        ts = np.asarray(g["ts"][:need], np.float64)
        ps = np.asarray(g["ps"][:need], np.float32)
    count = len(xs) // window
    if count < 2:
        raise ValueError(
            f"{path}:{prefix}_events has {len(xs)} events — need at least "
            f"2 windows of {window} for calibration"
        )
    # every window goes through THE serving pad/ts-normalize helper, so
    # calibration frames are byte-identical to what StreamingSR/StreamPool
    # would rasterize for the same events; absolute f64 stamps are shifted
    # to window-relative BEFORE the f32 cast (epoch-scale magnitudes would
    # otherwise swallow the deltas — harmless for counts, fatal for voxels)
    def _win(i):
        sl = slice(i * window, (i + 1) * window)
        t = (ts[sl] - ts[sl][0] if len(ts[sl]) else ts[sl]).astype(np.float32)
        return pad_window(np.stack([xs[sl], ys[sl], t, ps[sl]]), window)[None]

    ev = np.stack([_win(i) for i in range(count)])  # [S+1, 1, 4, window]
    frames = batch_events_to_counts(jnp.asarray(ev), (h, w))  # [S+1, 1, H, W, 2]
    pairs = jnp.stack([frames[:-1], frames[1:]], axis=2)  # [S, 1, 2, H, W, 2]
    carry = tuple(model.init_state(1, h, w))
    return calibrate_act_scales(
        model, variables, pairs, carry, max_steps=int(pairs.shape[0])
    )
