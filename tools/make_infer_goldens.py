"""Record END-TO-END eval-pipeline goldens from the reference inference
path: its dataloader (windowing + GT alignment + CPU count rasterization,
``dataloader/h5dataloader.py:275``) + the released BMCNet_plain checkpoint +
the ``infer_BMCNet_plain.py:20-95`` metric loop (minus CUDA timing and PNG
side effects), on an h5 fixture written by OUR packager with a fixed seed —
the cross-load in both directions plus per-window esr/bicubic MSE pins the
whole eval stack in one set of numbers.

Writes tests/goldens/infer_goldens.npz: per-window esr_mse / bicubic_mse and
the fixture recipe (the test regenerates the identical h5 from the seed).

Usage: python tools/make_infer_goldens.py
"""

import os
import sys
import tempfile
import types

import numpy as np
import torch
import torch.nn.functional as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")

# fixture recipe — the test must regenerate an identical file
SENSOR = (64, 96)
PREFIXES = ("ori", "down4")
EVENTS = {"ori": 48000, "down4": 3000}
SEED = 17
SCALE, ORI_SCALE = 4, "down4"
WINDOW, SLIDING = 256, 128
SEQN, SEQL, STEP = 2, 4, 1

sys.path.insert(0, REPO)
sys.path.insert(0, REF)
os.environ.setdefault("MPLBACKEND", "Agg")


def install_stubs():
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    # the reference pins a matplotlib style removed in modern releases
    import matplotlib.pyplot as plt

    orig = plt.style.use
    plt.style.use = lambda *a, **k: None


def dataloader_config():
    return {
        "batch_size": 1,
        "shuffle": False,
        "num_workers": 0,
        "pin_memory": False,
        "drop_last": False,
        "dataset": {
            "scale": SCALE,
            "ori_scale": ORI_SCALE,
            "time_bins": 1,
            "need_gt_frame": False,
            "need_gt_events": True,
            "mode": "events",
            "window": WINDOW,
            "sliding_window": SLIDING,
            "data_augment": {"enabled": False,
                             "augment": ["Horizontal", "Vertical", "Polarity"],
                             "augment_prob": [0.5, 0.5, 0.5]},
            "hot_filter": {"enabled": False, "max_px": 100, "min_obvs": 5,
                           "max_rate": 0.8},
            "sequence": {
                "sequence_length": SEQL, "seqn": SEQN, "step_size": STEP,
                "pause": {"enabled": False, "proba_pause_when_running": 0.05,
                          "proba_pause_when_paused": 0.9},
            },
        },
    }


def main():
    install_stubs()
    from bmcnet_esr_tpu.data.packager import write_synthetic_fixture

    from dataloader.h5dataloader import InferenceHDF5DataLoaderSequence
    from models.BMCNet_plain import BMCNet_plain

    with tempfile.TemporaryDirectory() as d:
        h5path = os.path.join(d, "fixture.h5")
        write_synthetic_fixture(h5path, SENSOR, PREFIXES, EVENTS, seed=SEED)

        loader = InferenceHDF5DataLoaderSequence(h5path, dataloader_config())
        gt_res = loader.dataset.gt_sensor_resolution

        sd = torch.load(os.path.join(REF, "pretrain", "BMCNet_plain_nfs_x4.pth"),
                        map_location="cpu", weights_only=True)
        model = BMCNet_plain(SCALE, 128, 5).eval()
        model.load_state_dict(sd)

        esr_mses, bic_mses = [], []
        init = True
        with torch.no_grad():
            for inputs_seq in loader:
                inputs = inputs_seq[0]  # stride-1 rollout, infer quirk §8.7
                input_stack = inputs["inp_cnt"].transpose(1, 2)
                inp_cnt = inputs["inp_cnt"][:, 1]  # mid_idx = 1
                gt_stack = inputs["gt_cnt"][:, 1]
                if init:
                    t = torch.zeros_like(input_stack[:, 0:1, 0])
                    o = t.repeat(1, SCALE * SCALE * 2, 1, 1)
                    h = t.repeat(1, 128, 1, 1)
                    h, pred = model(input_stack, h, o, True)
                    init = False
                else:
                    h, pred = model(input_stack, h, pred, False)
                if pred.shape[-2:] != gt_stack.shape[-2:]:
                    pred = F.interpolate(pred, size=gt_stack.shape[-2:],
                                         mode="bicubic", align_corners=False)
                bic = F.interpolate(inp_cnt, size=gt_res, mode="bicubic",
                                    align_corners=False)
                esr_mses.append(float(torch.mean((pred - gt_stack) ** 2)))
                bic_mses.append(float(torch.mean((bic - gt_stack) ** 2)))

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT, "infer_goldens.npz"),
        esr_mse=np.asarray(esr_mses),
        bicubic_mse=np.asarray(bic_mses),
        meta=np.asarray([SCALE, WINDOW, SLIDING, SEQN, SEQL, STEP, SEED]),
        sensor=np.asarray(SENSOR),
        events_ori=np.asarray(EVENTS["ori"]),
        events_down4=np.asarray(EVENTS["down4"]),
    )
    print(f"wrote infer_goldens.npz: {len(esr_mses)} windows, "
          f"esr {np.mean(esr_mses):.5f} bicubic {np.mean(bic_mses):.5f}")


if __name__ == "__main__":
    main()
