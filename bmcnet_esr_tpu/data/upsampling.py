"""Super SloMo adaptive frame upsampling (dataset-generation pre-step).

JAX re-design of ``/root/reference/generate_dataset/upsampling/``: before
event simulation, video frames are interpolated adaptively — the number of
in-between frames per pair equals the ceil of the max optical-flow magnitude
(``utils/upsampler.py:160-210``).  Architecture (``utils/model.py``):

* ``flow_comp``  UNet(6 -> 4): stacked frame pair -> bidirectional flow.
* ``arb_time``   UNet(20 -> 5): warped intermediates -> flow refinements +
  visibility map.
* UNet: 7x7/5x5/3x3 conv stacks, avg-pool downs, align_corners=True bilinear
  ups, LeakyReLU(0.1) everywhere.
* ``backwarp``: grid_sample of a frame by a flow field.

Weights load from the public ``SuperSloMo.ckpt`` (keys ``state_dictFC`` /
``state_dictAT``) via :func:`convert_superslomo_checkpoint` — the checkpoint
is a download in the reference (``upsampler.py:44-53``); offline environments
pass a local path.

NCHW layout (small offline tool; weight-layout parity over throughput).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.ops.resize import _resize_matrix
from bmcnet_esr_tpu.ops.warp import grid_sample_bilinear

Array = jax.Array

MEAN = np.array([0.429, 0.431, 0.397], np.float32)  # utils/const.py

# (name, in, out, ksize) conv spec for one UNet, matching torch module names
_UNET_CONVS = [
    ("conv1", None, 32, 7),
    ("conv2", 32, 32, 7),
    ("down1.conv1", 32, 64, 5),
    ("down1.conv2", 64, 64, 5),
    ("down2.conv1", 64, 128, 3),
    ("down2.conv2", 128, 128, 3),
    ("down3.conv1", 128, 256, 3),
    ("down3.conv2", 256, 256, 3),
    ("down4.conv1", 256, 512, 3),
    ("down4.conv2", 512, 512, 3),
    ("down5.conv1", 512, 512, 3),
    ("down5.conv2", 512, 512, 3),
    ("up1.conv1", 512, 512, 3),
    ("up1.conv2", 1024, 512, 3),
    ("up2.conv1", 512, 256, 3),
    ("up2.conv2", 512, 256, 3),
    ("up3.conv1", 256, 128, 3),
    ("up3.conv2", 256, 128, 3),
    ("up4.conv1", 128, 64, 3),
    ("up4.conv2", 128, 64, 3),
    ("up5.conv1", 64, 32, 3),
    ("up5.conv2", 64, 32, 3),
    ("conv3", 32, None, 3),
]


def _lrelu(x: Array) -> Array:
    return jax.nn.leaky_relu(x, 0.1)


def _conv(params: Dict, name: str, x: Array, k: int) -> Array:
    w = params[f"{name}.weight"]
    b = params[f"{name}.bias"]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b[None, :, None, None]


def _avg_pool2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) / 4.0


def _up2_ac(x: Array) -> Array:
    """x2 bilinear upsample, align_corners=True (utils/model.py:111-124)."""
    b, c, h, w = x.shape
    my = jnp.asarray(_resize_matrix(h, 2 * h, "bilinear_ac"))
    mx = jnp.asarray(_resize_matrix(w, 2 * w, "bilinear_ac"))
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("Oh,bchw->bcOw", my, x, precision=hi)
    return jnp.einsum("Pw,bcOw->bcOP", mx, y, precision=hi)


def unet_apply(params: Dict, x: Array) -> Array:
    """Super SloMo UNet forward (utils/model.py:154-209)."""
    x = _lrelu(_conv(params, "conv1", x, 7))
    s1 = _lrelu(_conv(params, "conv2", x, 7))

    def down(name, k, xin):
        h = _avg_pool2(xin)
        h = _lrelu(_conv(params, f"{name}.conv1", h, k))
        return _lrelu(_conv(params, f"{name}.conv2", h, k))

    s2 = down("down1", 5, s1)
    s3 = down("down2", 3, s2)
    s4 = down("down3", 3, s3)
    s5 = down("down4", 3, s4)
    x = down("down5", 3, s5)

    def up(name, xin, skip):
        h = _up2_ac(xin)
        h = _lrelu(_conv(params, f"{name}.conv1", h, 3))
        return _lrelu(_conv(params, f"{name}.conv2", jnp.concatenate([h, skip], 1), 3))

    x = up("up1", x, s5)
    x = up("up2", x, s4)
    x = up("up3", x, s3)
    x = up("up4", x, s2)
    x = up("up5", x, s1)
    return _lrelu(_conv(params, "conv3", x, 3))


def backwarp(img: Array, flow: Array) -> Array:
    """I0 = backwarp(I1, F_0_1) (utils/model.py:212-283): sample ``img`` at
    ``grid + flow``; the reference normalizes by W/H (not W-1/H-1) and uses
    ``align_corners=True`` — replicated exactly."""
    b, c, h, w = img.shape
    my, mx = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij"
    )
    x = mx[None] + flow[:, 0]
    y = my[None] + flow[:, 1]
    gx = 2.0 * (x / w - 0.5)
    gy = 2.0 * (y / h - 0.5)
    return grid_sample_bilinear(img, jnp.stack([gx, gy], axis=-1), align_corners=True)


def convert_superslomo_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """SuperSloMo.ckpt -> (flow_comp params, arb_time params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)

    def grab(sd):
        return {k: jnp.asarray(v.numpy()) for k, v in sd.items()}

    return grab(ckpt["state_dictFC"]), grab(ckpt["state_dictAT"])


def compute_flows(fc_params: Dict, i0: Array, i1: Array) -> Tuple[Array, Array]:
    """Bidirectional flow from the flow-computation UNet
    (``upsampler.py:~110``: out[:, :2] = F_0_1, out[:, 2:] = F_1_0)."""
    out = unet_apply(fc_params, jnp.concatenate([i0, i1], 1))
    return out[:, :2], out[:, 2:4]


def interpolate_frame(
    fc_at_params: Dict,
    i0: Array,
    i1: Array,
    f01: Array,
    f10: Array,
    t: float,
) -> Array:
    """Synthesize the frame at fractional time ``t``
    (``upsampler.py:180-207``, Jiang et al. CVPR'18 eq. set)."""
    temp = -t * (1.0 - t)
    f_t0 = temp * f01 + (t * t) * f10
    f_t1 = ((1.0 - t) ** 2) * f01 + temp * f10

    g0 = backwarp(i0, f_t0)
    g1 = backwarp(i1, f_t1)
    intrp = unet_apply(
        fc_at_params,
        jnp.concatenate([i0, i1, f01, f10, f_t1, f_t0, g1, g0], 1),
    )
    f_t0_f = intrp[:, 0:2] + f_t0
    f_t1_f = intrp[:, 2:4] + f_t1
    v0 = jax.nn.sigmoid(intrp[:, 4:5])
    v1 = 1.0 - v0

    g0f = backwarp(i0, f_t0_f)
    g1f = backwarp(i1, f_t1_f)
    w0, w1 = 1.0 - t, t
    return (w0 * v0 * g0f + w1 * v1 * g1f) / (w0 * v0 + w1 * v1)


def adaptive_insert_count(f01: Array, f10: Array) -> int:
    """Frames to insert = ceil(max flow magnitude) (``upsampler.py:171-177``)."""
    m01 = jnp.sqrt(jnp.sum(f01**2, axis=1)).max()
    m10 = jnp.sqrt(jnp.sum(f10**2, axis=1)).max()
    return int(np.ceil(float(jnp.maximum(m01, m10))))


class SuperSloMoUpsampler:
    """Adaptive sequence upsampler (reference ``Upsampler`` class).

    Frames are float [0,1] RGB ``[H, W, 3]``; internally normalized by MEAN
    (std = 1) like the reference transforms (``utils/const.py``).
    """

    def __init__(self, checkpoint_path: str):
        self.fc, self.at = convert_superslomo_checkpoint(checkpoint_path)
        self._interp = jax.jit(
            lambda i0, i1, f01, f10, t: interpolate_frame(self.at, i0, i1, f01, f10, t)
        )
        self._flows = jax.jit(lambda i0, i1: compute_flows(self.fc, i0, i1))

    def upsample_pair(
        self, img0: np.ndarray, img1: np.ndarray, t0: float, t1: float
    ) -> Tuple[List[np.ndarray], List[float]]:
        """All frames in [t0, t1): the input frame plus the adaptive
        intermediates, with timestamps."""
        mean = MEAN[None, :, None, None]
        i0 = jnp.asarray(img0.transpose(2, 0, 1)[None]) - mean
        i1 = jnp.asarray(img1.transpose(2, 0, 1)[None]) - mean
        f01, f10 = self._flows(i0, i1)
        n = adaptive_insert_count(f01, f10)
        frames = [img0]
        stamps = [t0]
        for k in range(1, n):
            t = k / n
            out = self._interp(i0, i1, f01, f10, t) + mean
            frames.append(np.clip(np.asarray(out)[0].transpose(1, 2, 0), 0.0, 1.0))
            stamps.append(t0 + t * (t1 - t0))
        return frames, stamps

    def upsample_sequence(
        self, images: Sequence[np.ndarray], timestamps: Sequence[float]
    ) -> Tuple[List[np.ndarray], List[float]]:
        frames: List[np.ndarray] = []
        stamps: List[float] = []
        for a, b in zip(range(len(images) - 1), range(1, len(images))):
            fr, st = self.upsample_pair(images[a], images[b], timestamps[a], timestamps[b])
            frames += fr
            stamps += st
        frames.append(images[-1])
        stamps.append(timestamps[-1])
        return frames, stamps
