"""Record LPIPS goldens from the reference PNetLin over its FULL option
surface: {alex, vgg, squeeze} x {v0.0, v0.1} x {scalar, spatial} net-lin
(shipped head weights), the plain-`net` (lpips=False) mode, and the resnet
feature extractors (pretrained_networks.py:139-181).

torchvision pretrained weights are not downloadable here; backbones are
deterministic seeded-random nets from tools/lpips_fixture_nets.py, injected
via a stub torchvision so the reference code path runs unmodified.  Tests
rebuild the SAME backbones from the same seeds, so the goldens ship only
inputs + outputs (KBs, not the 60 MB of round 1).

Usage: python tools/make_lpips_goldens.py
"""

import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, os.path.join(REPO, "tools"))
import lpips_fixture_nets as nets  # noqa: E402


def install_stubs():
    for name in ("skimage", "skimage.color", "skimage.metrics", "IPython"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage"].color = sys.modules["skimage.color"]
    sys.modules["skimage"].metrics = sys.modules["skimage.metrics"]
    sys.modules["skimage.metrics"].structural_similarity = lambda *a, **k: 0.0
    sys.modules["skimage.metrics"].peak_signal_noise_ratio = lambda *a, **k: 0.0
    sys.modules["IPython"].embed = lambda *a, **k: None

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")

    def wrap(builder):
        def ctor(pretrained=False, **kw):
            m = types.SimpleNamespace()
            m.features = builder()
            return m
        return ctor

    tv_models.alexnet = wrap(nets.make_alex_features)
    tv_models.vgg16 = wrap(nets.make_vgg16_features)
    tv_models.squeezenet1_1 = wrap(nets.make_squeeze_features)
    for num in (18, 34, 50, 101, 152):
        setattr(tv_models, f"resnet{num}", lambda pretrained=False, _n=num, **kw: nets.make_resnet(_n))
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models


def main():
    install_stubs()
    sys.path.insert(0, REF)
    from loss.PerceptualSimilarity.models import networks_basic as nb
    from loss.PerceptualSimilarity.models import pretrained_networks as pn

    rng = np.random.default_rng(0)
    in0 = (rng.random((2, 3, 33, 37)).astype(np.float32) * 2 - 1)
    in1 = (rng.random((2, 3, 33, 37)).astype(np.float32) * 2 - 1)
    t0, t1 = torch.tensor(in0), torch.tensor(in1)
    # spatial=True uses SQUARE inputs: the reference's per-tap upsample scales
    # width by the height-derived factor, so tap widths disagree and the sum
    # CRASHES for non-square inputs (networks_basic.py:25-29,94-96) — square
    # is its working domain, replicated as-is
    in0_sq = np.ascontiguousarray(in0[:, :, :, :33])
    in1_sq = np.ascontiguousarray(in1[:, :, :, :33])
    t0_sq, t1_sq = torch.tensor(in0_sq), torch.tensor(in1_sq)

    payload = {"in0": in0, "in1": in1, "in0_sq": in0_sq, "in1_sq": in1_sq}

    # net-lin over the full grid
    for net in ("alex", "vgg", "squeeze"):
        for version in ("0.0", "0.1"):
            for spatial in (False, True):
                model = nb.PNetLin(
                    pnet_type=net, pnet_rand=False, use_dropout=True,
                    spatial=spatial, version=version,
                ).eval()
                wpath = os.path.join(
                    REF, "loss", "PerceptualSimilarity", "models",
                    "weights", f"v{version}", f"{net}.pth",
                )
                model.load_state_dict(
                    torch.load(wpath, map_location="cpu"), strict=False
                )
                a, b = (t0_sq, t1_sq) if spatial else (t0, t1)
                with torch.no_grad():
                    out = model(a, b).numpy()
                tag = f"{net}/v{version}/{'spatial' if spatial else 'scalar'}"
                payload[tag] = out
                print(tag, out.shape, float(out.mean()))

    # plain-`net` mode (lpips=False, dist_model.py:79-80)
    for net in ("alex", "squeeze"):
        for spatial in (False, True):
            model = nb.PNetLin(pnet_type=net, pnet_rand=False, lpips=False,
                               spatial=spatial).eval()
            a, b = (t0_sq, t1_sq) if spatial else (t0, t1)
            with torch.no_grad():
                out = model(a, b).numpy()
            tag = f"{net}/plain/{'spatial' if spatial else 'scalar'}"
            payload[tag] = out
            print(tag, out.shape, float(out.mean()))

    # resnet feature extractors: record the 5 taps
    for num in (18, 50):
        model = pn.resnet(pretrained=False, num=num).eval()
        with torch.no_grad():
            taps = model(t0)
        for i, t in enumerate(taps):
            payload[f"resnet{num}/tap{i}"] = t.numpy()
        print(f"resnet{num} taps:", [tuple(t.shape) for t in taps])

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "lpips_goldens.npz"), **payload)
    size = os.path.getsize(os.path.join(OUT, "lpips_goldens.npz"))
    print(f"wrote lpips_goldens.npz ({size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
