"""Reference .pth checkpoint -> bmcnet_esr_tpu parameter-tree converter.

The reference serializes one entry *per tied alias*: BMCNet_plain's state
dict holds 120 keys summing to 4,459,552 scalars while only 1,003,296 are
unique trainable parameters (SURVEY.md §2.1 "Weight tying"; aliases:
``submodules.py:43-45``, ``BMCNet_plain.py:8,11``, ``BMCNet.py:7,9,41,43,46``).
This converter:

1. canonicalizes every torch key (alias segments and ``para_reschunk.N``
   depth indices collapse onto the single shared module),
2. verifies all aliases are bit-identical before deduping (a corrupted or
   foreign checkpoint fails loudly),
3. transposes conv kernels OIHW -> HWIO for NHWC/TPU,
4. maps ``LayerNorm2d.{weight,bias}`` -> ``ChannelLayerNorm.{scale,bias}``,
5. returns a ``{'params': ...}`` pytree matching :class:`~.bmcnet.BMCNet` /
   :class:`~.bmcnet.BMCNetPlain` and validates it structurally against a
   freshly initialized model.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# torch module aliases (tied weights) -> canonical module name.
# 'conv2' is context-dependent: inside ResidualBlock it is a distinct leaf
# conv (key ends '.conv2.weight'); at BIE/ParallelBlk level it aliases conv1
# and is followed by a further module segment.
_ALWAYS_ALIAS = {
    "convf2": "convf1",
    "conv2_st": "conv1_st",
    "conv_fnst": "conv_fpst",
    "conv_fns": "conv_fps",
    "conv_f2": "conv_f1",
}
_LEAF_NAMES = {"weight", "bias"}


def _canonical_key(key: str) -> str:
    parts = key.split(".")
    out = []
    for i, part in enumerate(parts):
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if part in _ALWAYS_ALIAS:
            out.append(_ALWAYS_ALIAS[part])
        elif part == "conv2" and nxt not in _LEAF_NAMES:
            out.append("conv1")  # module-level tied alias (BIE/ParallelBlk)
        elif part.isdigit():
            continue  # para_reschunk.N -> shared single block
        else:
            out.append(part)
    return ".".join(out)


def _to_jax(canon_key: str, value: np.ndarray) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Map one canonical torch entry to (flax path, array)."""
    parts = canon_key.split(".")
    leaf = parts[-1]
    path = parts[:-1]
    if leaf == "weight":
        if value.ndim == 4:  # conv OIHW -> HWIO
            return tuple(path + ["kernel"]), value.transpose(2, 3, 1, 0)
        if path and path[-1] == "norm_s":  # LayerNorm2d scale
            return tuple(path + ["scale"]), value
        return tuple(path + ["kernel"]), value
    if leaf == "bias":
        return tuple(path + ["bias"]), value
    raise ValueError(f"unhandled leaf {canon_key!r}")


def convert_torch_state_dict(
    state: Mapping[str, np.ndarray], *, atol: float = 0.0
) -> Dict[str, Any]:
    """Convert a torch ``state_dict`` (values as numpy) to ``{'params': tree}``.

    Tied aliases must agree within ``atol`` (default: bit-identical, which
    holds for the released checkpoints — verified in SURVEY.md §6).
    """
    seen: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, value in state.items():
        value = np.asarray(value)
        path, arr = _to_jax(_canonical_key(key), value)
        if path in seen:
            if not np.allclose(seen[path], arr, atol=atol, rtol=0):
                raise ValueError(
                    f"tied alias mismatch at {key} -> {'/'.join(path)}: "
                    f"max|d|={np.abs(seen[path] - arr).max()}"
                )
        else:
            seen[path] = arr

    tree: Dict[str, Any] = {}
    for path, arr in seen.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(arr, jnp.float32)
    return {"params": tree}


_BIE_MODULES = [
    "clustering", "conv1.conv1", "conv1.conv2", "conv2.conv1", "conv2.conv2",
    "convf1", "convf2", "norm_s", "unclustering", "v1", "v2",
]
_PLAIN_TOP = ["conv_f1", "conv_f2", "conv_fs", "conv_h", "conv_o"]
_FULL_TOP = [
    "conv_fns", "conv_fnst", "conv_fps", "conv_fpst", "conv_fs",
    "conv_hn", "conv_hp", "conv_hs", "conv_o",
]
_FULL_BLK = [
    "conv1.conv1", "conv1.conv2", "conv1_st.conv1", "conv1_st.conv2",
    "conv2.conv1", "conv2.conv2", "conv2_st.conv1", "conv2_st.conv2",
] + [f"{b}.{m}" for b in ("gBIE", "lBIE") for m in _BIE_MODULES]


def torch_key_manifest(variant: str = "plain", n_b: int = 5) -> list:
    """The reference state dict's key list for a model variant (every tied
    alias present, ``para_reschunk.{0..n_b-1}`` expanded — 120 keys for
    plain n_b=5, matching the released checkpoint)."""
    if variant == "plain":
        mods = [f"neuro.{m}" for m in _PLAIN_TOP]
        blk = _BIE_MODULES
    elif variant == "full":
        mods = [f"neuro.{m}" for m in _FULL_TOP]
        blk = _FULL_BLK
    else:
        raise ValueError(f"unknown variant {variant!r}")
    for i in range(n_b):
        mods += [f"neuro.para_reschunk.{i}.{m}" for m in blk]
    return [f"{m}.{leaf}" for m in mods for leaf in ("weight", "bias")]


def export_torch_state_dict(
    variables: Dict[str, Any], variant: str = "plain", n_b: int = 5
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: a bmcnet_esr_tpu param
    tree -> a reference-layout torch ``state_dict`` (numpy values).

    Re-expands every tied alias and depth index onto the single shared
    tensor and transposes conv kernels HWIO -> OIHW, so the result loads
    into the reference ``BMCNet``/``BMCNet_plain`` with ``load_state_dict``
    — trained-on-TPU weights run in the torch implementation unchanged.
    """
    params = variables.get("params", variables)
    out: Dict[str, np.ndarray] = {}
    for key in torch_key_manifest(variant, n_b):
        parts = _canonical_key(key).split(".")
        path, leaf = parts[:-1], parts[-1]
        node = params
        for p in path:
            node = node[p]
        flax_leaf = (
            "bias" if leaf == "bias" else ("scale" if path[-1] == "norm_s" else "kernel")
        )
        arr = np.asarray(node[flax_leaf])
        if flax_leaf == "kernel" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        out[key] = arr
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` file and convert it (requires torch)."""
    import torch  # local import: torch is a conversion-time-only dependency

    state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict({k: v.numpy() for k, v in state.items()})


def validate_against(variables: Dict[str, Any], reference_variables: Dict[str, Any]) -> None:
    """Assert the converted tree matches a model-initialized tree's structure."""
    conv = jax.tree_util.tree_structure(variables)
    ref = jax.tree_util.tree_structure(reference_variables)
    if conv != ref:
        got = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
        want = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(reference_variables)
        }
        missing = sorted(want - got)[:10]
        extra = sorted(got - want)[:10]
        raise ValueError(f"structure mismatch; missing={missing} extra={extra}")
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(reference_variables),
    ):
        if a.shape != b.shape:
            raise ValueError(f"shape mismatch at {jax.tree_util.keystr(pa)}: {a.shape} vs {b.shape}")
