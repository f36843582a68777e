"""Config-driven loss composition for the trainer.

The reference trains MSE-only (``train.py:647-649``) but ships LPIPS /
flow / reconstruction losses for its other recipes (BASELINE config #4:
"recon + LPIPS perceptual + flow losses").  A ``loss:`` config block builds
the extra per-step terms added to the base MSE:

.. code-block:: yaml

    loss:
        l1: 0.1                       # builtin, bare weight
        lr_consistency:               # recon family (losses/terms.py)
            weight: 0.5
        lpips:
            weight: 1.0
            weights: /path/lpips_alex.npz   # pre-converted, no torch needed
        my_term:                      # any importable builder
            fn: my_pkg.losses:build_my_term
            weight: 0.2

Resolution rules, per entry ``name: spec``:

* ``spec`` a bare number -> weight, builder config ``{}``;
* ``spec`` a dict -> ``weight`` key (default 1.0) plus builder kwargs;
* ``name`` in the builtin registry -> that builder;
* otherwise the spec must carry ``fn: "module.path:attr"`` — imported and
  called as ``attr(spec, ctx) -> term`` (the open extension point; this is
  how EventWarping / BrightnessConstancy and user losses attach).

Each term is ``fn(pred_fit, gt, aux)`` on NHWC count images -> scalar (see
``bmcnet_esr_tpu.losses.terms`` for the aux contract).  Two-argument
``fn(pred, gt)`` callables are accepted and adapted.
"""

from __future__ import annotations

import importlib
import inspect
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp

from bmcnet_esr_tpu.losses.terms import (
    LossContext,
    brightness_constancy,
    event_warping,
    lr_consistency,
    ssim,
    temporal_consistency,
    total_variation,
)


def _l1(pred, gt, aux=None):
    return jnp.mean(jnp.abs(pred - gt))


def _charbonnier(pred, gt, aux=None, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt(jnp.square(pred - gt) + eps))


def _build_lpips_term(cfg: Dict, ctx=None) -> Callable:
    """LPIPS perceptual term.

    Preferred spec: ``weights: /path/bundle.npz`` — a pre-converted bundle
    from ``tools/convert_lpips.py`` (keeps torch OUT of the training
    runtime).  The legacy ``backbone_weights``/``lin_weights`` ``.pth`` pair
    still works where torch is installed.
    """
    from bmcnet_esr_tpu.losses.lpips import LPIPS, perceptual_loss

    if "weights" in cfg:
        lp = LPIPS.from_npz(cfg["weights"])
    else:
        import numpy as np
        import torch

        net = cfg.get("net", "alex")
        backbone_sd = {
            k: v.numpy()
            for k, v in torch.load(
                cfg["backbone_weights"], map_location="cpu", weights_only=True
            ).items()
        }
        lp = LPIPS.from_torch(backbone_sd, cfg["lin_weights"], net)

    def fn(pred, gt, aux=None):
        # NHWC -> NCHW; count images broadcast per channel inside
        return perceptual_loss(
            lp, jnp.moveaxis(pred, -1, 1), jnp.moveaxis(gt, -1, 1), normalize=True
        )

    return fn


# builtin name -> builder(cfg, ctx) -> term
REGISTRY: Dict[str, Callable] = {
    "l1": lambda cfg, ctx: _l1,
    "charbonnier": lambda cfg, ctx: _charbonnier,
    "lpips": _build_lpips_term,
    "ssim": ssim,
    "lr_consistency": lr_consistency,
    "recon": lr_consistency,  # the recon-family alias (BASELINE config #4)
    "temporal_consistency": temporal_consistency,
    "total_variation": total_variation,
    "event_warping": event_warping,
    "brightness_constancy": brightness_constancy,
}


def _resolve_dotted(path: str) -> Callable:
    """``module.sub:attr`` (or ``module.sub.attr``) -> the attribute."""
    if ":" in path:
        mod_name, attr = path.split(":", 1)
    else:
        mod_name, _, attr = path.rpartition(".")
    if not mod_name:
        raise KeyError(f"loss fn spec {path!r} is not an importable path")
    obj = importlib.import_module(mod_name)
    for part in attr.split("."):
        obj = getattr(obj, part)
    if not callable(obj):
        raise TypeError(f"loss fn {path!r} resolved to non-callable {obj!r}")
    return obj


def adapt_term(fn: Callable) -> Callable:
    """Accept legacy two-argument ``fn(pred, gt)`` terms alongside the full
    ``fn(pred, gt, aux)`` contract; ``needs_events`` marks carry over."""
    try:
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.kind
            in (inspect.Parameter.POSITIONAL_ONLY, inspect.Parameter.POSITIONAL_OR_KEYWORD)
            or p.kind == inspect.Parameter.VAR_POSITIONAL
        ]
        takes_aux = any(p.kind == inspect.Parameter.VAR_POSITIONAL for p in params) or (
            len(params) >= 3
        )
    except (TypeError, ValueError):
        takes_aux = True  # builtins/partials: assume the full contract
    if takes_aux:
        return fn

    def wrapped(pred, gt, aux=None):
        return fn(pred, gt)

    if getattr(fn, "needs_events", False):
        wrapped.needs_events = True
    return wrapped


def build_extra_losses(
    cfg: Optional[Dict], ctx: Optional[LossContext] = None
) -> Tuple:
    """``loss:`` config block -> tuple of ``(name, weight, fn)``."""
    if not cfg:
        return ()
    out: List = []
    for name, spec in cfg.items():
        if name == "mse":
            continue  # the base term, always present
        if isinstance(spec, dict):
            spec = dict(spec)
            weight = float(spec.pop("weight", 1.0))
        else:
            weight, spec = float(spec), {}
        if name in REGISTRY:
            builder = REGISTRY[name]
        elif "fn" in spec:
            builder = _resolve_dotted(spec.pop("fn"))
        else:
            raise KeyError(
                f"unknown loss term {name!r} (builtins: {sorted(REGISTRY)}; "
                "custom terms attach via fn: 'module.path:builder')"
            )
        out.append((name, weight, adapt_term(builder(spec, ctx))))
    return tuple(out)


def needs_events(extra_losses: Tuple) -> bool:
    """True when any term consumes per-step raw event windows (``aux['events']``)."""
    return any(getattr(fn, "needs_events", False) for _, _, fn in extra_losses)
