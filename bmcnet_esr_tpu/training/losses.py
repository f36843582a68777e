"""Config-driven loss composition for the trainer.

The reference trains MSE-only (``train.py:647-649``) but ships LPIPS /
flow / reconstruction losses for its other recipes (BASELINE config #4:
"recon + LPIPS perceptual + flow losses").  A ``loss:`` config block builds
the extra per-step terms added to the base MSE:

.. code-block:: yaml

    loss:
        l1: 0.1
        lpips:
            weight: 1.0
            net: alex
            backbone_weights: /path/torchvision_alexnet_features.pth
            lin_weights: /path/lpips_v0.1_alex.pth

Each term is ``fn(pred_fit, gt)`` on NHWC count images -> scalar.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp


def _l1(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def _charbonnier(pred, gt, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt(jnp.square(pred - gt) + eps))


def _build_lpips_term(cfg: Dict) -> Callable:
    import numpy as np
    import torch

    from bmcnet_esr_tpu.losses.lpips import LPIPS, perceptual_loss

    net = cfg.get("net", "alex")
    backbone_sd = {
        k: v.numpy()
        for k, v in torch.load(cfg["backbone_weights"], map_location="cpu", weights_only=True).items()
    }
    lp = LPIPS.from_torch(backbone_sd, cfg["lin_weights"], net)

    def fn(pred, gt):
        # NHWC -> NCHW; count images broadcast per channel inside
        return perceptual_loss(
            lp, jnp.moveaxis(pred, -1, 1), jnp.moveaxis(gt, -1, 1), normalize=True
        )

    return fn


def build_extra_losses(cfg: Dict | None) -> Tuple:
    """``loss:`` config block -> tuple of ``(name, weight, fn)``."""
    if not cfg:
        return ()
    out: List = []
    for name, spec in cfg.items():
        if name == "mse":
            continue  # the base term, always present
        if name == "l1":
            out.append(("l1", float(spec), _l1))
        elif name == "charbonnier":
            out.append(("charbonnier", float(spec), _charbonnier))
        elif name == "lpips":
            weight = float(spec.get("weight", 1.0))
            out.append(("lpips", weight, _build_lpips_term(spec)))
        else:
            raise KeyError(
                f"unknown loss term {name!r} (have: l1, charbonnier, lpips; "
                "flow/reconstruction losses attach via bmcnet_esr_tpu.losses directly)"
            )
    return tuple(out)
