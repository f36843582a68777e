"""Generate golden parity fixtures from the reference torch implementation.

Runs the reference models (imported from /root/reference, torch CPU) on fixed
random inputs and records state dicts + multi-step rollout outputs as .npz
files under tests/goldens/.  The fixtures are committed; tests never import
the reference tree.

Usage: python tools/make_goldens.py
"""

import os
import sys

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")

sys.path.insert(0, REF)
# the reference imports torchvision at module scope but never uses it for
# these classes; stub it so the CPU image works without the package.
import types  # noqa: E402

sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

from models.BMCNet import BMCNet  # noqa: E402
from models.BMCNet_plain import BMCNet_plain  # noqa: E402


def rollout_plain(model, x_seq, scale, n_c):
    """x_seq: [S, B, 2, T, H, W] torch. Returns [S, B, 2, kH, kW] preds."""
    preds, hs = [], []
    init = True
    h = o = None
    for x in x_seq:
        if init:
            t = torch.zeros_like(x[:, 0:1, 0])
            o = t.repeat(1, scale * scale * 2, 1, 1)
            h = t.repeat(1, n_c, 1, 1)
            h, pred = model(x, h, o, init)
            init = False
        else:
            h, pred = model(x, h, pred, init)
        preds.append(pred.detach().numpy())
        hs.append(h.detach().numpy())
    return np.stack(preds), np.stack(hs)


def rollout_full(model, x_seq, scale, n_c):
    preds, hs = [], []
    init = True
    h = hp = hn = o = None
    for x in x_seq:
        if init:
            t = torch.zeros_like(x[:, 0:1, 0])
            o = t.repeat(1, scale * scale * 2, 1, 1)
            h = t.repeat(1, n_c, 1, 1)
            hp = t.repeat(1, n_c, 1, 1)
            hn = t.repeat(1, n_c, 1, 1)
            h, hp, hn, pred = model(x, h, hp, hn, o, init)
            init = False
        else:
            h, hp, hn, pred = model(x, h, hp, hn, pred, init)
        preds.append(pred.detach().numpy())
        hs.append(h.detach().numpy())
    return np.stack(preds), np.stack(hs)


def save(name, state_dict, extras):
    payload = {f"sd/{k}": v.numpy() for k, v in state_dict.items()}
    payload.update(extras)
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, name), **payload)
    print("wrote", name, "keys:", len(payload))


def make_x8_golden():
    """Scale-8 full BMCNet: exercises the x8 PixelShuffle output head and the
    x8 feedback unshuffle (o_hr channels 2*64 in LR space) that the scale-2/4
    goldens never touch."""
    torch.manual_seed(17)
    scale, n_c, n_b, hwin, wwin, steps = 8, 8, 2, 16, 8, 2
    m = BMCNet(scale, n_c, n_b).eval()
    x = torch.randn(steps, 1, 2, 2, hwin, wwin)
    with torch.no_grad():
        preds, hs = rollout_full(m, x, scale, n_c)
    save(
        "full_small_x8.npz",
        m.state_dict(),
        {"x": x.numpy(), "preds": preds, "hs": hs,
         "meta": np.array([scale, n_c, n_b])},
    )


def main():
    torch.manual_seed(7)

    # --- small random BMCNet_plain (scale 2, n_c 8, n_b 2), 3-step rollout ---
    scale, n_c, n_b, hwin, wwin, steps = 2, 8, 2, 12, 10, 3
    m = BMCNet_plain(scale, n_c, n_b).eval()
    x = torch.randn(steps, 2, 2, 2, hwin, wwin)  # [S,B,2ch,T,H,W]
    with torch.no_grad():
        preds, hs = rollout_plain(m, x, scale, n_c)
    save(
        "plain_small.npz",
        m.state_dict(),
        {"x": x.numpy(), "preds": preds, "hs": hs,
         "meta": np.array([scale, n_c, n_b])},
    )

    # --- small random full BMCNet (scale 2, n_c 8, n_b 2), 3-step rollout ---
    torch.manual_seed(11)
    m = BMCNet(scale, n_c, n_b).eval()
    x = torch.randn(steps, 2, 2, 2, hwin, wwin)
    with torch.no_grad():
        preds, hs = rollout_full(m, x, scale, n_c)
    save(
        "full_small.npz",
        m.state_dict(),
        {"x": x.numpy(), "preds": preds, "hs": hs,
         "meta": np.array([scale, n_c, n_b])},
    )

    make_x8_golden()

    # --- released checkpoint: BMCNet_plain(4,128,5), 3-step rollout, 16x16 ---
    ckpt = os.path.join(REF, "pretrain", "BMCNet_plain_nfs_x4.pth")
    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    m = BMCNet_plain(4, 128, 5).eval()
    m.load_state_dict(sd)
    torch.manual_seed(13)
    x = torch.rand(3, 1, 2, 2, 16, 16).round() * 3  # count-like integer input
    with torch.no_grad():
        preds, hs = rollout_plain(m, x, 4, 128)
    # ship the (deduped-on-load) checkpoint itself as fixture for the converter
    save(
        "plain_nfs_x4_ckpt.npz",
        sd,
        {"x": x.numpy(), "preds": preds,
         "meta": np.array([4, 128, 5])},
    )


if __name__ == "__main__":
    main()
