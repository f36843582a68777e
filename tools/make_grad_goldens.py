"""Record torch BPTT GRADIENT and TRAINING-TRAJECTORY goldens from the
reference implementation (imported from /root/reference, torch CPU).

Covers the one correctness surface round-1 left open: the full-model BPTT
gradient (grad flow through the state-rotation quirk, the n_b-times shared
block, the HR-feedback unshuffle, and the loss summing at
``/root/reference/train.py:227-237``), plus a 200-iteration Adam(amsgrad)
training trajectory of BMCNet_plain for stepwise optimizer/graph parity.

Writes tests/goldens/grad_goldens.npz with, per model variant:
  {v}/sd/<key>     init state dict (every tied alias, as serialized)
  {v}/grad/<key>   d(loss)/d(param) per state-dict key (aliases share grads)
  {v}/loss         the summed BPTT loss at init
  frames / gt_frames  the shared count-like input fixture
  traj_losses      [200] plain-model loss per optimizer iteration

Usage: python tools/make_grad_goldens.py
"""

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
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

from models.BMCNet import BMCNet  # noqa: E402
from models.BMCNet_plain import BMCNet_plain  # noqa: E402

SCALE, N_C, N_B = 2, 8, 2
B, L, H, W = 2, 4, 12, 10
S = L - 1  # seqn=2 sliding windows


def make_fixture(rng):
    """Count-like frames: [L, B, 2, H, W] inputs and [L, B, 2, kH, kW] GT."""
    frames = np.round(rng.random((L, B, 2, H, W)) * 3).astype(np.float32)
    gt = np.round(rng.random((L, B, 2, SCALE * H, SCALE * W)) * 3).astype(np.float32)
    return frames, gt


def windows(frames):
    """Torch input windows: x_s = [B, 2ch, T=2, H, W] stacking (s, s+1)."""
    return [
        torch.tensor(np.stack([frames[s], frames[s + 1]], axis=2)) for s in range(S)
    ]


def param_by_key(model, key):
    obj = model
    parts = key.split(".")
    for part in parts[:-1]:
        obj = obj[int(part)] if part.isdigit() else getattr(obj, part)
    return getattr(obj, parts[-1])


def bptt_loss(model, xs, gt, variant):
    """The reference training BPTT (train.py:205-237): summed per-window MSE
    against the SECOND frame's GT, full graph (no detach)."""
    mse = torch.nn.MSELoss()
    loss = 0.0
    init = True
    for s, x in enumerate(xs):
        gt_s = torch.tensor(gt[s + 1])
        if init:
            t = torch.zeros_like(x[:, 0:1, 0])
            o = t.repeat(1, SCALE * SCALE * 2, 1, 1)
            h = t.repeat(1, N_C, 1, 1)
            if variant == "plain":
                h, pred = model(x, h, o, init)
            else:
                hp, hn = h.clone(), h.clone()
                h, hp, hn, pred = model(x, h, hp, hn, o, init)
            init = False
        else:
            if variant == "plain":
                h, pred = model(x, h, pred, init)
            else:
                h, hp, hn, pred = model(x, h, hp, hn, pred, init)
        loss = loss + mse(pred, gt_s)
    return loss


def record_grads(model, xs, gt, variant):
    model.zero_grad()
    loss = bptt_loss(model, xs, gt, variant)
    loss.backward()
    sd_keys = list(model.state_dict().keys())
    grads = {}
    for key in sd_keys:
        p = param_by_key(model, key)
        grads[key] = p.grad.detach().numpy().copy()
    return float(loss.detach()), grads


def main():
    rng = np.random.default_rng(42)
    frames, gt = make_fixture(rng)
    xs = windows(frames)
    payload = {"frames": frames, "gt_frames": gt,
               "meta": np.array([SCALE, N_C, N_B, B, L, H, W])}

    torch.manual_seed(21)
    models = {
        "plain": BMCNet_plain(SCALE, N_C, N_B),
        "full": BMCNet(SCALE, N_C, N_B),
    }
    for variant, model in models.items():
        loss, grads = record_grads(model, xs, gt, variant)
        payload[f"{variant}/loss"] = np.array(loss, np.float64)
        for k, v in model.state_dict().items():
            # .copy(): .numpy() aliases the live parameter storage, which the
            # trajectory's in-place optimizer updates below would corrupt
            payload[f"{variant}/sd/{k}"] = v.numpy().copy()
        for k, v in grads.items():
            payload[f"{variant}/grad/{k}"] = v
        print(variant, "loss:", loss, "grad keys:", len(grads))

    # --- 200-iteration training trajectory, plain model, reference recipe
    # optimizer semantics (Adam + L2 wd + amsgrad, train_nfs.yml:28-35) ---
    model = models["plain"]
    opt = torch.optim.Adam(
        model.parameters(), lr=1e-3, weight_decay=1e-5, amsgrad=True
    )
    losses = []
    for _ in range(200):
        opt.zero_grad()
        loss = bptt_loss(model, xs, gt, "plain")
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    payload["traj_losses"] = np.asarray(losses, np.float64)
    print("trajectory: first", losses[0], "last", losses[-1])

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "grad_goldens.npz"), **payload)
    print("wrote grad_goldens.npz")


if __name__ == "__main__":
    main()
