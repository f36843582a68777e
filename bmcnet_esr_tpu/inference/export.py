"""AOT serving bundles: deploy the streaming step without model code.

``jax.export`` serializes the jitted stream step (on-device rasterization +
recurrent model forward) to a portable StableHLO artifact with versioning
guarantees; this module pairs it with the weights and stream metadata as an
on-disk *serving bundle*::

    bundle/
      step.hlo        jax.export serialized Exported (StableHLO bytes)
      variables.npz   flattened variable collections (params [+ quant scales])
      meta.json       stream geometry + model identity

A consumer process loads the bundle with :class:`ExportedStream` and serves a
live event stream exactly like ``StreamingSR`` — but needs neither the model
definitions nor Flax, only jax + numpy.  This replaces the reference's
deployment story (ship the repo + ``torch.load`` a pickle,
``infer_BMCNet.py:106-116``) with a hermetic, non-executable artifact.

Export where you serve: the artifact records the lowering platform(s); pass
``platforms=("tpu",)`` (or export on the target chip) for TPU serving, or
``("cpu", "tpu")`` for an artifact that runs on both.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.inference.streaming import pad_window
from bmcnet_esr_tpu.ops.batch import batch_events_to_counts  # export side only

Array = jax.Array

_SEP = "//"  # path separator inside the flat variables.npz keys


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    if not isinstance(tree, dict):
        return {prefix: np.asarray(tree)}
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else k))
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        parts = path.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def export_serving_bundle(
    model,
    variables: Dict[str, Any],
    out_dir: str,
    inp_resolution: Tuple[int, int],
    window_size: int = 2048,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize the stateful stream step + weights + metadata to ``out_dir``.

    The exported callable has signature
    ``(variables, carry, prev_frame, events[B, 4, W]) -> (carry', frame,
    pred)`` with the prediction already rotated into the carry's feedback
    slot — the exact step :class:`~bmcnet_esr_tpu.inference.streaming.
    StreamingSR` compiles, so serving semantics match by construction (the
    parity test additionally pins the two against each other).
    """
    h, w = int(inp_resolution[0]), int(inp_resolution[1])
    res = (h, w)

    def step(variables, carry, prev_frame, events):
        frame = batch_events_to_counts(events, res)  # [B, H, W, 2]
        x = jnp.stack([prev_frame, frame], axis=1)  # [B, 2, H, W, 2]
        outs = model.apply(variables, x, *carry)
        return tuple(outs), frame, outs[-1]

    carry = tuple(model.init_state(batch, h, w))
    prev = jnp.zeros((batch, h, w, 2), jnp.float32)
    events = jnp.zeros((batch, 4, window_size), jnp.float32)

    exported = jax.export.export(
        jax.jit(step), platforms=list(platforms) if platforms else None
    )(variables, carry, prev, events)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "step.hlo"), "wb") as f:
        f.write(exported.serialize())
    np.savez_compressed(os.path.join(out_dir, "variables.npz"), **_flatten(variables))
    meta = {
        "inp_resolution": [h, w],
        "window_size": int(window_size),
        "batch": int(batch),
        "carry_shapes": [list(c.shape) for c in carry],
        "carry_dtypes": [str(c.dtype) for c in carry],
        "scale": int(model.scale),
        "n_c": int(model.n_c),
        "n_b": int(model.n_b),
        "variant": type(model).__name__,
        # "quant" stays a strict bool (external tooling may schema-check it);
        # the mode string matters for audit — an int8_pconv bundle's lowered
        # program contains the Pallas kernel, a plain int8 one does not — so
        # it ships as the separate "quant_mode" key
        "quant": bool(getattr(model, "quant", False)),
        "quant_mode": (lambda q: "xla" if q is True else str(q) if q else None)(
            getattr(model, "quant", False)
        ),
        # static scales baked in (calibrated) vs dynamic per-call scales
        "quant_static": "quant" in variables,
        "platforms": list(exported.platforms),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ExportedStream:
    """Serve a live event stream from a bundle directory — no model code.

    Mirrors :class:`~bmcnet_esr_tpu.inference.streaming.StreamingSR.push`:
    push ``[4, n]`` event windows (or ``[B, 4, n]`` when the bundle was
    exported with ``batch > 1``), receive HR count images once two windows
    have been seen.
    """

    def __init__(self, bundle_dir: str):
        with open(os.path.join(bundle_dir, "meta.json")) as f:
            self.meta = json.load(f)
        with open(os.path.join(bundle_dir, "step.hlo"), "rb") as f:
            self._exported = jax.export.deserialize(f.read())
        with np.load(os.path.join(bundle_dir, "variables.npz")) as z:
            self._variables = _unflatten({k: z[k] for k in z.files})
        self._call = jax.jit(self._exported.call)
        self._batch = int(self.meta["batch"])
        self._res = tuple(self.meta["inp_resolution"])
        self._window = int(self.meta["window_size"])
        self.reset()

    def reset(self) -> None:
        """Start a new stream (reference: ``init=True`` once per file)."""
        self._carry = None
        self._prev_frame = None
        self.windows_seen = 0

    def _init_carry(self) -> Tuple[Array, ...]:
        return tuple(
            jnp.zeros(shape, dtype)
            for shape, dtype in zip(self.meta["carry_shapes"], self.meta["carry_dtypes"])
        )

    def _pad(self, events: np.ndarray) -> np.ndarray:
        events = np.asarray(events, np.float32)
        if events.ndim == 2:
            events = events[None]
        if events.shape[0] != self._batch:
            raise ValueError(
                f"bundle serves batch {self._batch}, got {events.shape[0]} streams"
            )
        return pad_window(events, self._window)

    def push(self, events: np.ndarray) -> Optional[np.ndarray]:
        ev = jnp.asarray(self._pad(events))
        if self._carry is None:
            # first window: rasterize via the exported step itself (its
            # ``frame`` output) so the consumer needs NO package ops — the
            # step's carry/pred outputs are discarded, the stream starts
            # from the init carry exactly like StreamingSR
            self._carry = self._init_carry()
            zero_prev = jnp.zeros((self._batch, *self._res, 2), jnp.float32)
            _, self._prev_frame, _ = self._call(
                self._variables, self._carry, zero_prev, ev
            )
            self.windows_seen = 1
            return None
        self._carry, self._prev_frame, pred = self._call(
            self._variables, self._carry, self._prev_frame, ev
        )
        self.windows_seen += 1
        return np.asarray(pred)
