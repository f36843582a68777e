"""Flow-era visualisation: HSV flow encoding, IWE/window renderers.

Counterpart of ``/root/reference/myutils/vis_events/visualization.py``
(headless-safe: renders to arrays/files; the interactive cv2 windows of the
reference become optional)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def flow_to_image(flow_x: np.ndarray, flow_y: np.ndarray) -> np.ndarray:
    """HSV-encoded optical flow (``visualization.py:289-314``): hue = angle,
    value = normalized magnitude."""
    import matplotlib.colors

    mag = np.sqrt(flow_x**2 + flow_y**2)
    min_mag = mag.min()
    mag_range = mag.max() - min_mag

    ang = np.arctan2(flow_y, flow_x) + np.pi
    ang = ang / (2.0 * np.pi)

    hsv = np.zeros((*flow_x.shape[:2], 3))
    hsv[..., 0] = np.squeeze(ang) if ang.ndim == 3 else ang
    hsv[..., 1] = 1.0
    v = np.squeeze(mag) if mag.ndim == 3 else mag
    hsv[..., 2] = v - min_mag
    if mag_range != 0.0:
        hsv[..., 2] = hsv[..., 2] / mag_range
    return (255 * matplotlib.colors.hsv_to_rgb(hsv)).astype(np.uint8)


def minmax_norm(x: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Robust (percentile) min-max normalization (``visualization.py:317-326``)."""
    den = np.percentile(x, 99) - np.percentile(x, 1)
    return np.clip((x - np.percentile(x, 1)) / (den + eps), 0.0, 1.0)


class FlowVisualizer:
    """Render/store per-step flow, IWE and reconstruction streams
    (reference ``Visualization`` class)."""

    def __init__(self, out_dir: Optional[str] = None, color_scheme: str = "green_red"):
        self.out_dir = out_dir
        self.color_scheme = color_scheme
        self._frame = 0

    def store(
        self,
        event_cnt: Optional[np.ndarray] = None,  # [H, W, 2]
        flow: Optional[np.ndarray] = None,  # [2, H, W] (x, y)
        iwe: Optional[np.ndarray] = None,  # [H, W, 2]
        brightness: Optional[np.ndarray] = None,  # [H, W]
        sequence: str = "seq",
    ) -> Dict[str, str]:
        """Write one step's renderings; returns written paths."""
        import cv2

        from bmcnet_esr_tpu.vis.events import render_event_count

        assert self.out_dir is not None, "construct with out_dir to store"
        base = os.path.join(self.out_dir, sequence)
        written = {}
        streams = {}
        if event_cnt is not None:
            streams["events"] = render_event_count(event_cnt, self.color_scheme)
        if flow is not None:
            streams["flow"] = flow_to_image(flow[0], flow[1])
        if iwe is not None:
            streams["iwe"] = render_event_count(iwe, self.color_scheme)
        if brightness is not None:
            streams["frames"] = (np.clip(minmax_norm(brightness), 0, 1) * 255).astype(np.uint8)

        for name, img in streams.items():
            d = os.path.join(base, name)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{self._frame:09d}.png")
            if img.ndim == 3:
                cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            else:
                cv2.imwrite(path, img)
            written[name] = path
        self._frame += 1
        return written
