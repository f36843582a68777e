"""LPIPS perceptual distance (net-lin), JAX-native.

Re-design of the vendored PerceptualSimilarity stack
(``/root/reference/loss/PerceptualSimilarity/``):

* :class:`LPIPS` reproduces ``PNetLin`` v0.1 (``networks_basic.py:31-101``):
  scaling layer -> backbone features at 5 taps -> channel-unit-normalize ->
  squared diff -> learned 1x1 heads -> spatial mean -> sum over taps.
* Backbones are functional AlexNet / VGG16 feature stacks with torchvision
  layout (``pretrained_networks.py:57-136``), loaded from a torchvision
  ``state_dict`` via :func:`convert_backbone_state_dict` — this environment
  cannot download torchvision weights, so backbone weights are an input
  artifact; the **linear-head** weights ship with the reference
  (``models/weights/v0.1/{alex,vgg}.pth``) and load via
  :func:`load_lin_weights`.
* :func:`perceptual_loss` reproduces the channel-broadcasting wrapper
  (``loss/restore.py:12-41``): 1ch -> repeat 3, 3ch direct, Nch -> mean over
  per-channel distances; ``normalize=True`` maps [0,1] -> [-1,1]
  (``models/__init__.py:30-44``).

Layout: NCHW (LPIPS images are small; parity with the torch weights matters
more than conv layout here).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision .features layer indices: (kind, params) per index
_ALEX_FEATURES = [
    ("conv", dict(out=64, k=11, s=4, p=2)),   # 0
    ("relu", None),                            # 1
    ("pool", dict(k=3, s=2)),                  # 2
    ("conv", dict(out=192, k=5, s=1, p=2)),    # 3
    ("relu", None),                            # 4
    ("pool", dict(k=3, s=2)),                  # 5
    ("conv", dict(out=384, k=3, s=1, p=1)),    # 6
    ("relu", None),                            # 7
    ("conv", dict(out=256, k=3, s=1, p=1)),    # 8
    ("relu", None),                            # 9
    ("conv", dict(out=256, k=3, s=1, p=1)),    # 10
    ("relu", None),                            # 11
]
_ALEX_SLICES = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]
_ALEX_CHNS = [64, 192, 384, 256, 256]

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]


def _vgg_features():
    layers = []
    for v in _VGG_CFG:
        if v == "M":
            layers.append(("pool", dict(k=2, s=2)))
        else:
            layers.append(("conv", dict(out=v, k=3, s=1, p=1)))
            layers.append(("relu", None))
    return layers


_VGG_FEATURES = _vgg_features()
_VGG_SLICES = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
_VGG_CHNS = [64, 128, 256, 512, 512]

_NETS = {
    "alex": (_ALEX_FEATURES, _ALEX_SLICES, _ALEX_CHNS),
    "vgg": (_VGG_FEATURES, _VGG_SLICES, _VGG_CHNS),
    "vgg16": (_VGG_FEATURES, _VGG_SLICES, _VGG_CHNS),
}


def _conv2d(x: Array, w: Array, b: Array, stride: int, pad: int) -> Array:
    y = jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b[None, :, None, None]


def _maxpool(x: Array, k: int, s: int) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def convert_backbone_state_dict(state: Dict[str, np.ndarray], net: str = "alex") -> Dict:
    """torchvision ``<net>.features`` state dict -> backbone param dict.

    Accepts either bare ``{i}.weight`` keys (from ``.features.state_dict()``)
    or full ``features.{i}.weight`` keys.
    """
    feats, _, _ = _NETS[net]
    # normalize keys to "{feature_idx}.{weight|bias}": accepts torchvision
    # "features.{i}.*", bare "{i}.*", and the reference's slice-wrapped
    # "slice{n}.{i}.*" (pretrained_networks.py keeps original indices as
    # module names inside each slice)
    norm = {}
    for key, value in state.items():
        parts = key.split(".")
        if len(parts) >= 2 and parts[-1] in ("weight", "bias") and parts[-2].isdigit():
            norm[f"{parts[-2]}.{parts[-1]}"] = value
    params = {}
    for i, (kind, _) in enumerate(feats):
        if kind != "conv":
            continue
        for suffix in ("weight", "bias"):
            key = f"{i}.{suffix}"
            if key not in norm:
                raise KeyError(f"missing backbone param features.{key}")
            params[key] = jnp.asarray(np.asarray(norm[key]))
    return params


def load_lin_weights(path: str, net: str = "alex") -> List[Array]:
    """Load the shipped LPIPS linear-head weights
    (``weights/v0.1/{alex,vgg}.pth``: keys ``lin{k}.model.1.weight``)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    _, slices, chns = _NETS[net]
    lins = []
    for k in range(len(chns)):
        w = state[f"lin{k}.model.1.weight"].numpy()  # [1, C, 1, 1]
        lins.append(jnp.asarray(w[:, :, 0, 0]))  # [1, C]
    return lins


def backbone_features(params: Dict, x: Array, net: str = "alex") -> List[Array]:
    """Run the feature stack, returning the 5 slice outputs."""
    feats, slices, _ = _NETS[net]
    outs = []
    h = x
    for start, end in slices:
        for i in range(start, end):
            kind, cfg = feats[i]
            if kind == "conv":
                h = _conv2d(h, params[f"{i}.weight"], params[f"{i}.bias"], cfg["s"], cfg["p"])
            elif kind == "relu":
                h = jnp.maximum(h, 0.0)
            elif kind == "pool":
                h = _maxpool(h, cfg["k"], cfg["s"])
        outs.append(h)
    return outs


def _unit_normalize(feat: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(feat**2, axis=1, keepdims=True))
    return feat / (norm + eps)


class LPIPS:
    """net-lin LPIPS distance (v0.1)."""

    def __init__(self, backbone_params: Dict, lin_weights: Sequence[Array], net: str = "alex"):
        self.net = net
        self.backbone = backbone_params
        self.lins = list(lin_weights)

    @classmethod
    def from_torch(
        cls,
        backbone_state_dict: Dict[str, np.ndarray],
        lin_weights_path: str,
        net: str = "alex",
    ) -> "LPIPS":
        return cls(
            convert_backbone_state_dict(backbone_state_dict, net),
            load_lin_weights(lin_weights_path, net),
            net,
        )

    def __call__(self, in0: Array, in1: Array) -> Array:
        """``[B, 3, H, W]`` inputs in [-1, 1] -> ``[B, 1, 1, 1]`` distances."""
        shift = jnp.asarray(_SHIFT)[None, :, None, None]
        scale = jnp.asarray(_SCALE)[None, :, None, None]
        x0 = (in0 - shift) / scale
        x1 = (in1 - shift) / scale
        f0 = backbone_features(self.backbone, x0, self.net)
        f1 = backbone_features(self.backbone, x1, self.net)
        val = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            head = jnp.einsum("oc,bchw->bohw", self.lins[k], diff)
            val = val + jnp.mean(head, axis=(2, 3), keepdims=True)
        return val


def perceptual_loss(
    lpips: LPIPS, pred: Array, target: Array, *, normalize: bool = True, weight: float = 1.0
) -> Array:
    """Reference wrapper semantics (``loss/restore.py:12-41``)."""
    if normalize:
        pred = 2.0 * pred - 1.0
        target = 2.0 * target - 1.0

    c = pred.shape[1]
    if c == 1:
        pred = jnp.concatenate([pred] * 3, axis=1)
        target = jnp.concatenate([target] * 3, axis=1)
        dist = lpips(pred, target)
    elif c == 3:
        dist = lpips(pred, target)
    else:
        dist = 0.0
        for idx in range(c):
            p = jnp.repeat(pred[:, idx : idx + 1], 3, axis=1)
            t = jnp.repeat(target[:, idx : idx + 1], 3, axis=1)
            dist = dist + lpips(p, t)
        dist = dist / c
    return weight * jnp.mean(dist)
