"""Deterministic synthetic weights for the Super SloMo parity fixtures.

The SloMo UNet pair is ~40M parameters; round 1 shipped their random state
dicts inside slomo_goldens.npz (140 MB in git).  Instead, both the golden
generator (which loads these arrays into the reference torch models) and the
tests (which feed them to the JAX implementation) synthesize identical
weights from a shape manifest + a fixed numpy seed — the goldens ship only
inputs, outputs and the manifest.

Weights are fan-in-scaled normals (kaiming-like) so activations stay bounded
through the 20+ conv layers; draw order is the sorted key order.
"""

from typing import Dict, Sequence

import numpy as np

SEED = 33


def synth_state_dict(shapes: Dict[str, Sequence[int]], seed: int = SEED) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    out = {}
    for key in sorted(shapes):
        shape = tuple(int(s) for s in shapes[key])
        if key.endswith("weight") and len(shape) == 4:
            scale = 1.0 / np.sqrt(np.prod(shape[1:]))
        else:
            scale = 0.05
        out[key] = (rng.standard_normal(shape) * scale).astype(np.float32)
    return out


def manifest_to_npz_entries(prefix: str, shapes: Dict[str, Sequence[int]]) -> Dict[str, np.ndarray]:
    return {
        f"manifest/{prefix}/{k}": np.asarray(v, np.int64) for k, v in shapes.items()
    }


def shapes_from_npz(z, prefix: str) -> Dict[str, tuple]:
    plen = len(f"manifest/{prefix}/")
    return {
        k[plen:]: tuple(z[k].tolist())
        for k in z.files
        if k.startswith(f"manifest/{prefix}/")
    }
