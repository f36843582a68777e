"""Record Super SloMo UNet / backWarp goldens from the reference model code
with synthetic weights (the public checkpoint is not downloadable offline).

Weights come from tools/slomo_fixture_weights.py — a seeded numpy recipe the
tests replay, so the goldens ship only inputs/outputs/shape-manifest (KBs)
instead of the 140 MB of state dicts round 1 committed."""

import importlib.util
import os
import sys
import types

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from slomo_fixture_weights import manifest_to_npz_entries, synth_state_dict  # noqa: E402

REF_MODEL = "/root/reference/generate_dataset/upsampling/utils/model.py"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens"
)

# model.py imports torchvision at module scope but never uses it here
tv = types.ModuleType("torchvision")
tv.transforms = types.ModuleType("torchvision.transforms")
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.transforms", tv.transforms)

spec = importlib.util.spec_from_file_location("slomo_model", REF_MODEL)
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)


def main():
    h, w = 32, 64  # must be divisible by 2**5 (five down blocks)

    fc = m.UNet(6, 4).eval()
    at = m.UNet(20, 5).eval()
    bw = m.backWarp(w, h, "cpu")

    # synthetic deterministic weights (see module docstring)
    fc_shapes = {k: tuple(v.shape) for k, v in fc.state_dict().items()}
    at_shapes = {k: tuple(v.shape) for k, v in at.state_dict().items()}
    fc.load_state_dict({k: torch.tensor(v) for k, v in synth_state_dict(fc_shapes, seed=33).items()})
    at.load_state_dict({k: torch.tensor(v) for k, v in synth_state_dict(at_shapes, seed=34).items()})

    rng = np.random.default_rng(0)
    i0 = rng.random((1, 3, h, w)).astype(np.float32)
    i1 = rng.random((1, 3, h, w)).astype(np.float32)
    flow = (rng.standard_normal((1, 2, h, w)) * 1.5).astype(np.float32)

    with torch.no_grad():
        fc_out = fc(torch.cat([torch.tensor(i0), torch.tensor(i1)], 1)).numpy()
        warped = bw(torch.tensor(i1), torch.tensor(flow)).numpy()
        # full interpolation at t = 0.4 using the reference formulas
        # (upsampler.py:180-207)
        t = 0.4
        f01 = torch.tensor(fc_out[:, :2])
        f10 = torch.tensor(fc_out[:, 2:4])
        temp = -t * (1 - t)
        f_t0 = temp * f01 + (t * t) * f10
        f_t1 = ((1 - t) ** 2) * f01 + temp * f10
        g0 = bw(torch.tensor(i0), f_t0)
        g1 = bw(torch.tensor(i1), f_t1)
        intrp = at(
            torch.cat(
                [torch.tensor(i0), torch.tensor(i1), f01, f10, f_t1, f_t0, g1, g0], 1
            )
        )
        f_t0_f = intrp[:, 0:2] + f_t0
        f_t1_f = intrp[:, 2:4] + f_t1
        v0 = torch.sigmoid(intrp[:, 4:5])
        v1 = 1 - v0
        g0f = bw(torch.tensor(i0), f_t0_f)
        g1f = bw(torch.tensor(i1), f_t1_f)
        ft = ((1 - t) * v0 * g0f + t * v1 * g1f) / ((1 - t) * v0 + t * v1)

    payload = {
        "i0": i0, "i1": i1, "flow": flow,
        "fc_out": fc_out, "warped": warped, "ft": ft.numpy(),
    }
    payload.update(manifest_to_npz_entries("fc", fc_shapes))
    payload.update(manifest_to_npz_entries("at", at_shapes))
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "slomo_goldens.npz")
    np.savez_compressed(path, **payload)
    print(f"wrote slomo_goldens.npz ({os.path.getsize(path)/1e6:.2f} MB); "
          f"ft mean: {float(ft.mean())}")


if __name__ == "__main__":
    main()
