"""LPIPS perceptual distance, JAX-native — the full vendored-stack surface.

Re-design of the reference PerceptualSimilarity stack
(``/root/reference/loss/PerceptualSimilarity/``):

* :class:`LPIPS` reproduces ``PNetLin`` (``networks_basic.py:31-101``) over
  its whole option surface: backbones ``alex`` / ``vgg16`` / ``squeeze``
  (5/5/7 feature taps, ``pretrained_networks.py:6-136``), ``version`` 0.1
  (scaling layer) and 0.0 (the original release skipped input scaling —
  ``networks_basic.py:74-75``), ``spatial=True`` per-pixel distance maps
  (bilinear-upsampled to the input height with torch ``nn.Upsample``
  scale-factor semantics, ``networks_basic.py:25-29,85``), ``lpips=False``
  plain-``net`` mode (channel-summed squared feature diffs instead of learned
  heads, ``networks_basic.py:88-92``), and ``retPerLayer``.
* Backbones are functional feature stacks with torchvision layout, loaded
  from a torchvision ``state_dict`` via :func:`convert_backbone_state_dict`
  (this environment cannot download torchvision weights, so backbone weights
  are an input artifact); the **linear-head** weights ship with the reference
  (``models/weights/v{0.0,0.1}/{alex,vgg,squeeze}.pth``) and load via
  :func:`load_lin_weights`.
* :func:`resnet_features` covers the reference's resnet-18/34/50/101/152
  feature extractors (``pretrained_networks.py:139-181``).  Quirk preserved
  by documentation rather than code: the reference's ``PNetLin`` has no
  ``chns`` branch for resnet, so ``net='resnet'`` crashes upstream — the
  extractor is the reachable capability, the head wiring is not.
* :func:`perceptual_loss` reproduces the channel-broadcasting wrapper
  (``loss/restore.py:12-41``).

Layout: NCHW (LPIPS images are small; parity with the torch weights matters
more than conv layout here).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

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

# torchvision squeezenet1_1 .features: note the CEIL-MODE max pools
_SQUEEZE_FEATURES = [
    ("conv", dict(out=64, k=3, s=2, p=0)),            # 0
    ("relu", None),                                    # 1
    ("pool", dict(k=3, s=2, ceil=True)),               # 2
    ("fire", dict(s=16, e=64)),                        # 3
    ("fire", dict(s=16, e=64)),                        # 4
    ("pool", dict(k=3, s=2, ceil=True)),               # 5
    ("fire", dict(s=32, e=128)),                       # 6
    ("fire", dict(s=32, e=128)),                       # 7
    ("pool", dict(k=3, s=2, ceil=True)),               # 8
    ("fire", dict(s=48, e=192)),                       # 9
    ("fire", dict(s=48, e=192)),                       # 10
    ("fire", dict(s=64, e=256)),                       # 11
    ("fire", dict(s=64, e=256)),                       # 12
]
# 7 taps (pretrained_networks.py:18-31)
_SQUEEZE_SLICES = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 11), (11, 12), (12, 13)]
_SQUEEZE_CHNS = [64, 128, 256, 384, 384, 512, 512]

_NETS = {
    "alex": (_ALEX_FEATURES, _ALEX_SLICES, _ALEX_CHNS),
    "vgg": (_VGG_FEATURES, _VGG_SLICES, _VGG_CHNS),
    "vgg16": (_VGG_FEATURES, _VGG_SLICES, _VGG_CHNS),
    "squeeze": (_SQUEEZE_FEATURES, _SQUEEZE_SLICES, _SQUEEZE_CHNS),
}

_FIRE_PARTS = ("squeeze", "expand1x1", "expand3x3")


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


def _maxpool(x: Array, k: int, s: int, ceil: bool = False) -> Array:
    pads = [(0, 0), (0, 0)]
    for n in x.shape[2:]:
        if ceil:
            out = -(-(n - k) // s) + 1
            pads.append((0, max((out - 1) * s + k - n, 0)))
        else:
            pads.append((0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        padding=pads,
    )


def _fire(x: Array, params: Dict, i: int) -> Array:
    sq = jnp.maximum(_conv2d(x, params[f"{i}.squeeze.weight"], params[f"{i}.squeeze.bias"], 1, 0), 0.0)
    e1 = jnp.maximum(_conv2d(sq, params[f"{i}.expand1x1.weight"], params[f"{i}.expand1x1.bias"], 1, 0), 0.0)
    e3 = jnp.maximum(_conv2d(sq, params[f"{i}.expand3x3.weight"], params[f"{i}.expand3x3.bias"], 1, 1), 0.0)
    return jnp.concatenate([e1, e3], axis=1)


def convert_backbone_state_dict(state: Dict[str, np.ndarray], net: str = "alex") -> Dict:
    """torchvision ``<net>.features`` state dict -> backbone param dict.

    Accepts bare ``{i}.weight`` keys (from ``.features.state_dict()``), full
    ``features.{i}.weight`` keys, the reference's slice-wrapped
    ``slice{n}.{i}.*`` keys, and squeezenet Fire sub-params
    (``{i}.{squeeze,expand1x1,expand3x3}.{weight,bias}``).
    """
    feats, _, _ = _NETS[net]
    pat = re.compile(r"(\d+)\.(?:(squeeze|expand1x1|expand3x3)\.)?(weight|bias)$")
    norm = {}
    for key, value in state.items():
        m = pat.search(key)
        if m:
            idx, part, leaf = m.groups()
            norm[f"{idx}.{part}.{leaf}" if part else f"{idx}.{leaf}"] = value
    params = {}
    for i, (kind, _) in enumerate(feats):
        if kind == "conv":
            wanted = [f"{i}.weight", f"{i}.bias"]
        elif kind == "fire":
            wanted = [f"{i}.{part}.{leaf}" for part in _FIRE_PARTS for leaf in ("weight", "bias")]
        else:
            continue
        for key in wanted:
            if key not in norm:
                raise KeyError(f"missing backbone param features.{key}")
            params[key] = jnp.asarray(np.asarray(norm[key]))
    return params


def load_lin_weights(path: str, net: str = "alex") -> List[Array]:
    """Load the shipped LPIPS linear-head weights
    (``weights/v{0.0,0.1}/{alex,vgg,squeeze}.pth``: ``lin{k}.model.1.weight``;
    squeeze carries 7 heads, ``networks_basic.py:68-71``)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    _, slices, chns = _NETS[net]
    lins = []
    for k in range(len(chns)):
        w = state[f"lin{k}.model.1.weight"].numpy()  # [1, C, 1, 1]
        lins.append(jnp.asarray(w[:, :, 0, 0]))  # [1, C]
    return lins


def backbone_features(params: Dict, x: Array, net: str = "alex") -> List[Array]:
    """Run the feature stack, returning the slice outputs (5 or 7 taps)."""
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
                h = _maxpool(h, cfg["k"], cfg["s"], cfg.get("ceil", False))
            elif kind == "fire":
                h = _fire(h, params, i)
        outs.append(h)
    return outs


def _unit_normalize(feat: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(feat**2, axis=1, keepdims=True))
    return feat / (norm + eps)


def _upsample_torch(x: Array, out_h: int) -> Array:
    """torch ``nn.Upsample(scale_factor=out_H/in_H, bilinear,
    align_corners=False)`` (``networks_basic.py:25-29``): BOTH axes use the
    HEIGHT-derived scale factor, and output sizes floor — so for non-square
    inputs the width mapping intentionally differs from an exact resize."""
    f = out_h / x.shape[2]

    def axis_weights(n, m):
        src = (jnp.arange(m) + 0.5) / f - 0.5
        src = jnp.clip(src, 0.0, n - 1)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n - 1)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (src - lo).astype(x.dtype)
        return lo, hi, w

    m_h = int(np.floor(x.shape[2] * f + 1e-9))
    m_w = int(np.floor(x.shape[3] * f + 1e-9))
    lo_h, hi_h, w_h = axis_weights(x.shape[2], m_h)
    lo_w, hi_w, w_w = axis_weights(x.shape[3], m_w)
    top = x[:, :, lo_h] * (1 - w_h)[None, None, :, None] + x[:, :, hi_h] * w_h[None, None, :, None]
    out = (
        top[:, :, :, lo_w] * (1 - w_w)[None, None, None, :]
        + top[:, :, :, hi_w] * w_w[None, None, None, :]
    )
    return out


class LPIPS:
    """``PNetLin`` distance over the full reference option surface.

    Args:
      backbone_params: converted torchvision feature weights.
      lin_weights: learned 1x1 heads (None for the plain-``net`` mode).
      net: ``alex`` | ``vgg``/``vgg16`` | ``squeeze``.
      version: ``"0.1"`` (input scaling layer) or ``"0.0"`` (no scaling —
        the original-release bug kept for checkpoint parity).
      spatial: return per-pixel distance maps upsampled to the input height
        instead of spatially-averaged scalars.
      lpips: ``True`` = learned-head weighting (net-lin); ``False`` =
        channel-summed feature distances (plain ``net`` model,
        ``dist_model.py:79-80``).
    """

    def __init__(
        self,
        backbone_params: Dict,
        lin_weights: Optional[Sequence[Array]] = None,
        net: str = "alex",
        *,
        version: str = "0.1",
        spatial: bool = False,
        lpips: bool = True,
    ):
        self.net = net
        self.backbone = backbone_params
        self.lins = list(lin_weights) if lin_weights is not None else None
        self.version = version
        self.spatial = spatial
        self.lpips = lpips
        if lpips and self.lins is None:
            raise ValueError("net-lin mode needs lin_weights (or pass lpips=False)")
        _, _, chns = _NETS[net]
        if lpips and len(self.lins) != len(chns):
            raise ValueError(f"{net} needs {len(chns)} lin heads, got {len(self.lins)}")

    @classmethod
    def from_torch(
        cls,
        backbone_state_dict: Dict[str, np.ndarray],
        lin_weights_path: Optional[str] = None,
        net: str = "alex",
        **kwargs,
    ) -> "LPIPS":
        lins = load_lin_weights(lin_weights_path, net) if lin_weights_path else None
        return cls(convert_backbone_state_dict(backbone_state_dict, net), lins, net, **kwargs)

    # -- torch-free weight bundles (tools/convert_lpips.py) -----------------
    # Pre-converting the .pth pair to one .npz keeps torch OUT of training
    # runtime: the LPIPS loss term in a recipe (training/losses.py) loads
    # bundles without importing torch.

    def to_npz(self, path: str) -> str:
        data: Dict[str, np.ndarray] = {
            "meta/net": np.asarray(self.net),
            "meta/version": np.asarray(self.version),
            "meta/lpips": np.asarray(int(self.lpips)),
        }
        for k, v in self.backbone.items():
            data[f"backbone/{k}"] = np.asarray(v)
        for i, lin in enumerate(self.lins or ()):
            data[f"lin/{i}"] = np.asarray(lin)
        np.savez_compressed(path, **data)
        return path

    @classmethod
    def from_npz(cls, path: str, **kwargs) -> "LPIPS":
        with np.load(path) as z:
            net = str(z["meta/net"])
            kwargs.setdefault("version", str(z["meta/version"]))
            kwargs.setdefault("lpips", bool(int(z["meta/lpips"])))
            backbone = {
                k[len("backbone/"):]: jnp.asarray(z[k])
                for k in z.files
                if k.startswith("backbone/")
            }
            lin_keys = sorted(
                (k for k in z.files if k.startswith("lin/")),
                key=lambda k: int(k.split("/")[1]),
            )
            lins = [jnp.asarray(z[k]) for k in lin_keys] or None
        return cls(backbone, lins, net, **kwargs)

    def __call__(
        self,
        in0: Array,
        in1: Array,
        ret_per_layer: bool = False,
        drop_masks: Optional[Sequence[Array]] = None,
    ):
        """``[B, 3, H, W]`` inputs in [-1, 1] -> ``[B, 1, 1, 1]`` distances
        (or ``[B, 1, H, W]`` maps when ``spatial``).

        ``drop_masks``: optional per-layer inverted-dropout masks (0 or
        1/(1-p), shaped like each layer's feature diff) applied to the squared
        diffs before the heads — the training path's ``Dropout(0.5)``
        (reference ``networks_basic.py:113-120``; used by
        ``losses/lpips_train.LPIPSTrainer``)."""
        if self.version == "0.1":
            shift = jnp.asarray(_SHIFT)[None, :, None, None]
            scale = jnp.asarray(_SCALE)[None, :, None, None]
            x0 = (in0 - shift) / scale
            x1 = (in1 - shift) / scale
        else:  # v0.0: inputs used unscaled (networks_basic.py:74-75)
            x0, x1 = in0, in1
        f0 = backbone_features(self.backbone, x0, self.net)
        f1 = backbone_features(self.backbone, x1, self.net)
        res = []
        for k, (a, b) in enumerate(zip(f0, f1)):
            diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            if drop_masks is not None:
                diff = diff * drop_masks[k]
            if self.lpips:
                head = jnp.einsum("oc,bchw->bohw", self.lins[k], diff)
            else:
                head = jnp.sum(diff, axis=1, keepdims=True)
            if self.spatial:
                res.append(_upsample_torch(head, int(in0.shape[2])))
            else:
                res.append(jnp.mean(head, axis=(2, 3), keepdims=True))
        val = res[0]
        for r in res[1:]:
            val = val + r
        if ret_per_layer:
            return val, res
        return val


# -- resnet feature extractors (pretrained_networks.py:139-181) --------------

_RESNET_BLOCKS = {
    18: ("basic", [2, 2, 2, 2]),
    34: ("basic", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
    101: ("bottleneck", [3, 4, 23, 3]),
    152: ("bottleneck", [3, 8, 36, 3]),
}


def _bn(x: Array, params: Dict, name: str, eps: float = 1e-5) -> Array:
    """Eval-mode BatchNorm2d from torch running stats."""
    mean = params[f"{name}.running_mean"][None, :, None, None]
    var = params[f"{name}.running_var"][None, :, None, None]
    w = params[f"{name}.weight"][None, :, None, None]
    b = params[f"{name}.bias"][None, :, None, None]
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def _conv_bn(x, params, conv, bn, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, params[f"{conv}.weight"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return _bn(y, params, bn)


def convert_resnet_state_dict(state: Dict[str, np.ndarray]) -> Dict[str, Array]:
    """torchvision resnet state dict -> flat param dict (keys kept;
    ``num_batches_tracked`` dropped)."""
    return {
        k: jnp.asarray(np.asarray(v))
        for k, v in state.items()
        if not k.endswith("num_batches_tracked") and not k.startswith("fc.")
    }


def resnet_features(params: Dict[str, Array], x: Array, num: int = 18) -> List[Array]:
    """The reference resnet extractor's 5 taps (relu1, layer1..4 outputs,
    ``pretrained_networks.py:163-181``)."""
    kind, layers = _RESNET_BLOCKS[num]

    h = _conv_bn(x, params, "conv1", "bn1", 2, 3)
    h = jnp.maximum(h, 0.0)
    taps = [h]
    h = _maxpool(jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-np.inf), 3, 2)

    for li, blocks in enumerate(layers, start=1):
        stride = 1 if li == 1 else 2
        for bi in range(blocks):
            prefix = f"layer{li}.{bi}"
            s = stride if bi == 0 else 1
            identity = h
            if f"{prefix}.downsample.0.weight" in params:
                identity = _conv_bn(h, params, f"{prefix}.downsample.0", f"{prefix}.downsample.1", s, 0)
            if kind == "basic":
                out = jnp.maximum(_conv_bn(h, params, f"{prefix}.conv1", f"{prefix}.bn1", s, 1), 0.0)
                out = _conv_bn(out, params, f"{prefix}.conv2", f"{prefix}.bn2", 1, 1)
            else:
                out = jnp.maximum(_conv_bn(h, params, f"{prefix}.conv1", f"{prefix}.bn1", 1, 0), 0.0)
                out = jnp.maximum(_conv_bn(out, params, f"{prefix}.conv2", f"{prefix}.bn2", s, 1), 0.0)
                out = _conv_bn(out, params, f"{prefix}.conv3", f"{prefix}.bn3", 1, 0)
            h = jnp.maximum(out + identity, 0.0)
        taps.append(h)
    return taps


# -- FakeNet distance modes (dist_model.py:81-86, networks_basic.py:153-189) -

def l2_distance(in0: Array, in1: Array) -> Array:
    """``DistModel(model='L2', colorspace='RGB')``: plain mean squared
    difference of the [-1, 1] tensors, one value per image
    (``networks_basic.py:163-167``).  The Lab colorspace variant needs
    skimage's rgb2lab (not in this environment) and is not provided."""
    return jnp.mean(jnp.square(in0 - in1), axis=(1, 2, 3))


def _tensor2im_quantize(x: Array) -> Array:
    """The reference's ``tensor2im`` maps [-1, 1] -> uint8 ([0, 255] with
    truncation) before DSSIM (``models/__init__.py:112-113``); quantization
    replicated exactly."""
    return jnp.clip(jnp.floor((x + 1.0) * 127.5), 0.0, 255.0)


def dssim_distance(in0: Array, in1: Array) -> Array:
    """``DistModel(model='SSIM', colorspace='RGB')``: ``(1 - SSIM)/2`` on
    uint8-quantized images, data_range 255, per-channel SSIM averaged
    (skimage ``multichannel=True`` semantics; ``models/__init__.py:58-59``,
    ``networks_basic.py:176-189``).  One value per image."""
    from bmcnet_esr_tpu.losses.restore import ssim_metric

    q0 = _tensor2im_quantize(in0)
    q1 = _tensor2im_quantize(in1)
    vals = [
        (1.0 - ssim_metric(q0[b], q1[b], 255.0)) / 2.0 for b in range(in0.shape[0])
    ]
    return jnp.stack(vals)


class DistanceModel:
    """``DistModel.initialize`` dispatch (``dist_model.py:28-113``) as a thin
    facade: ``model`` selects net-lin (learned heads), net (plain feature
    distances), L2 or SSIM/DSSIM; calling the instance computes distances.

    Unlike the reference there is no implicit ``weights/v{version}/{net}.pth``
    download path — backbone/head artifacts are explicit inputs (this
    environment cannot fetch torchvision weights; the reference's own heads
    ship in its tree and can be passed via ``lin_weights_path``).
    """

    def __init__(
        self,
        model: str = "net-lin",
        net: str = "alex",
        *,
        backbone_state_dict: Optional[Dict] = None,
        lin_weights_path: Optional[str] = None,
        version: str = "0.1",
        spatial: bool = False,
    ):
        self.model = model
        self.name = f"{model} [{net}]"
        if model == "net-lin":
            self._fn = LPIPS.from_torch(
                backbone_state_dict, lin_weights_path, net,
                version=version, spatial=spatial, lpips=True,
            )
        elif model == "net":
            self._fn = LPIPS.from_torch(
                backbone_state_dict, None, net,
                version=version, spatial=spatial, lpips=False,
            )
        elif model in ("L2", "l2"):
            self._fn = l2_distance
            self.name = "L2"
        elif model in ("DSSIM", "dssim", "SSIM", "ssim"):
            self._fn = dssim_distance
            self.name = "SSIM"
        else:
            raise ValueError(f"Model [{model}] not recognized.")

    def __call__(self, in0: Array, in1: Array, ret_per_layer: bool = False):
        if isinstance(self._fn, LPIPS):
            return self._fn(in0, in1, ret_per_layer)
        return self._fn(in0, in1)

    forward = __call__  # torch-style alias


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
