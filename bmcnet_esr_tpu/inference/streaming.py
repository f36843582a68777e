"""Online streaming super-resolution: the production-serving entry point.

The batch engine (``inference/engine.py``) evaluates whole files; this class
serves a *live* event stream: push raw events as they arrive, get the HR
count image for each completed window with recurrent state carried across
pushes — the deployment shape for an event camera feeding a TPU.

One jitted step (rasterize window pair -> model -> HR prediction) is compiled
once per stream shape; windows are padded to ``window_size`` so shapes stay
static (zero-polarity padding adds nothing).  Timestamps are normalized
per-window like the offline pipeline (``base_dataset.py:24-31`` semantics).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

Array = jax.Array


class StreamingSR:
    """Stateful stride-1 super-resolution over a live event stream.

    >>> stream = StreamingSR(model, variables, inp_resolution=(45, 80))
    >>> for events in camera:              # events: [4, n] (x, y, t, p)
    ...     hr = stream.push(events)       # HR count image after >= 2 windows
    """

    def __init__(
        self,
        model,
        variables,
        inp_resolution: Tuple[int, int],
        window_size: int = 2048,
    ):
        self.model = model
        self.variables = variables
        self.inp_resolution = tuple(inp_resolution)
        self.window_size = window_size
        self._carry = None
        self._prev_frame = None
        self._step = self._build_step()
        self.windows_seen = 0

    def _build_step(self):
        model = self.model
        res = self.inp_resolution

        @jax.jit
        def step(variables, carry, prev_frame, events):
            frame = batch_events_to_counts(events[None], res)  # [1, H, W, 2]
            x = jnp.stack([prev_frame, frame], axis=1)  # [1, 2, H, W, 2]
            outs = model.apply(variables, x, *carry)
            return tuple(outs), frame, outs[-1]

        return step

    def reset(self) -> None:
        """Start a new stream (reference: ``init=True`` once per file,
        ``infer_BMCNet.py:45``)."""
        self._carry = None
        self._prev_frame = None
        self.windows_seen = 0

    def _pad(self, events: np.ndarray) -> np.ndarray:
        n = events.shape[1]
        if n > self.window_size:
            raise ValueError(
                f"window of {n} events exceeds window_size {self.window_size}"
            )
        out = np.zeros((4, self.window_size), np.float32)
        out[:, :n] = events
        if n:  # normalize ts within the window
            ts = out[2, :n]
            out[2, :n] = (ts - ts[0]) / (ts[-1] - ts[0] + 1e-6)
        return out

    def push(self, events: np.ndarray) -> Optional[np.ndarray]:
        """Feed one event window ``[4, n]`` (x, y, t, p); returns the HR
        prediction ``[kH, kW, 2]`` once two windows have been seen, else
        ``None``."""
        ev = jnp.asarray(self._pad(np.asarray(events, np.float32)))
        if self._carry is None:
            h, w = self.inp_resolution
            self._carry = tuple(self.model.init_state(1, h, w))
            self._prev_frame = batch_events_to_counts(ev[None], self.inp_resolution)
            self.windows_seen = 1
            return None
        self._carry, self._prev_frame, pred = self._step(
            self.variables, self._carry, self._prev_frame, ev
        )
        self.windows_seen += 1
        return np.asarray(pred[0])
