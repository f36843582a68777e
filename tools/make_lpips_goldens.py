"""Record LPIPS goldens from the reference PNetLin with RANDOM backbone
weights (torchvision pretrained weights are not downloadable here; the
backbone is injected via a stub torchvision so the reference code path runs
unmodified) + the SHIPPED v0.1 linear-head weights.

Saves tests/goldens/lpips_goldens.npz with the random backbone state dict,
inputs, and reference outputs for alex and vgg16.
"""

import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens"
)


def make_alex_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=True), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=True),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2),
    )


def make_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, 1, 1), nn.ReLU(inplace=True)]
            in_c = v
    return nn.Sequential(*layers)


def install_stubs():
    for name in ("skimage", "skimage.color", "skimage.metrics", "IPython"):
        mod = types.ModuleType(name)
        sys.modules.setdefault(name, mod)
    sys.modules["skimage"].color = sys.modules["skimage.color"]
    sys.modules["skimage"].metrics = sys.modules["skimage.metrics"]
    sys.modules["skimage.metrics"].structural_similarity = lambda *a, **k: 0.0
    sys.modules["skimage.metrics"].peak_signal_noise_ratio = lambda *a, **k: 0.0
    sys.modules["IPython"].embed = lambda *a, **k: None

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")

    def alexnet(pretrained=False, **kw):
        torch.manual_seed(101)
        m = types.SimpleNamespace()
        m.features = make_alex_features()
        return m

    def vgg16(pretrained=False, **kw):
        torch.manual_seed(202)
        m = types.SimpleNamespace()
        m.features = make_vgg16_features()
        return m

    tv_models.alexnet = alexnet
    tv_models.vgg16 = vgg16
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models


def main():
    install_stubs()
    sys.path.insert(0, REF)
    from loss.PerceptualSimilarity.models import networks_basic as nb

    rng = np.random.default_rng(0)
    in0 = (rng.random((2, 3, 33, 37)).astype(np.float32) * 2 - 1)
    in1 = (rng.random((2, 3, 33, 37)).astype(np.float32) * 2 - 1)

    payload = {"in0": in0, "in1": in1}
    for net in ("alex", "vgg"):
        model = nb.PNetLin(pnet_type=net, pnet_rand=False, use_dropout=True, version="0.1").eval()
        wpath = os.path.join(
            REF, "loss", "PerceptualSimilarity", "models", "weights", "v0.1", f"{net}.pth"
        )
        model.load_state_dict(torch.load(wpath, map_location="cpu"), strict=False)
        with torch.no_grad():
            out = model(torch.tensor(in0), torch.tensor(in1)).numpy()
        payload[f"{net}/out"] = out
        # record the (stubbed-random) backbone feature weights actually used
        backbone_sd = {
            f"{net}/sd/{k}": v.numpy()
            for k, v in model.net.state_dict().items()
        }
        payload.update(backbone_sd)
        print(net, "dist:", out.squeeze())

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "lpips_goldens.npz"), **payload)
    print("wrote lpips_goldens.npz")


if __name__ == "__main__":
    main()
