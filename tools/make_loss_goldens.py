"""Record golden outputs of the reference unsupervised losses.

Loads /root/reference/loss/{flow,reconstruction}.py (bypassing the package
__init__, which needs skimage/torchvision) and runs them on fixed random
inputs; saves tests/goldens/loss_goldens.npz.
"""

import importlib
import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens"
)

sys.path.insert(0, REF)
pkg = types.ModuleType("refloss")
pkg.__path__ = [os.path.join(REF, "loss")]
sys.modules["refloss"] = pkg
flow_mod = importlib.import_module("refloss.flow")
recon_mod = importlib.import_module("refloss.reconstruction")


def main():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, N, H, W = 2, 96, 12, 16
    res = [H, W]

    ts = np.sort(rng.random((B, N)), axis=1).astype(np.float32)
    ys = rng.integers(0, H, (B, N)).astype(np.float32)
    xs = rng.integers(0, W, (B, N)).astype(np.float32)
    ps = (rng.integers(0, 2, (B, N)) * 2 - 1).astype(np.float32)
    # zero-pad tail like pack_tensor (quirk: padding counts as events at (0,0))
    ts[:, -8:] = 0
    ys[:, -8:] = 0
    xs[:, -8:] = 0
    ps[:, -8:] = 0
    event_list = np.stack([ts, ys, xs, ps], axis=2)  # [B, N, 4] (ts, y, x, p)
    pol_mask = np.stack([np.maximum(ps, 0), -np.minimum(ps, 0)], axis=2)
    flow = (rng.standard_normal((B, 2, H, W)) * 0.01).astype(np.float32)

    el_t = torch.tensor(event_list)
    pm_t = torch.tensor(pol_mask)
    fl_t = torch.tensor(flow)

    ew = flow_mod.EventWarping({"loss": {"flow_regul_weight": 0.01}}, "cpu")
    ew_loss = ew([fl_t], el_t, pm_t, res).item()

    aiwe = flow_mod.AveragedIWE(
        {"loader": {"resolution": res, "batch_size": B}}, "cpu"
    )
    aiwe_out = aiwe(fl_t, el_t, pm_t).numpy()

    # brightness constancy
    img = torch.tensor(rng.random((B, 1, H, W)).astype(np.float32))
    prev_img = torch.tensor(rng.random((B, 1, H, W)).astype(np.float32))
    cnt = torch.tensor(rng.integers(0, 3, (B, 2, H, W)).astype(np.float32))
    bc = recon_mod.BrightnessConstancy(
        {
            "loader": {"resolution": res, "batch_size": B},
            "loss": {"reconstruction_regul_weight": [0.1, 0.2]},
        },
        "cpu",
    )
    gm = bc.generative_model(
        fl_t.clone(), img, {"inp_cnt": cnt, "inp_list": el_t, "inp_pol_mask": pm_t}
    ).item()
    tc = bc.temporal_consistency(fl_t, prev_img, img).item()
    tv = bc.regularization(img).item()

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT, "loss_goldens.npz"),
        event_list=event_list,
        pol_mask=pol_mask,
        flow=flow,
        img=img.numpy(),
        prev_img=prev_img.numpy(),
        cnt=cnt.numpy(),
        res=np.array(res),
        ew_loss=np.array(ew_loss),
        aiwe=aiwe_out,
        gm=np.array(gm),
        tc=np.array(tc),
        tv=np.array(tv),
    )
    print("wrote loss_goldens.npz:", dict(ew_loss=ew_loss, gm=gm, tc=tc, tv=tv))


if __name__ == "__main__":
    main()
