"""End-to-end user journey: simulator txt -> h5 -> train -> checkpoint ->
inference with the trained weights (exercises the Orbax-load path of the
inference engine)."""

import os

import numpy as np
import pytest

from bmcnet_esr_tpu.data import synthesis
from bmcnet_esr_tpu.inference import InferenceEngine, load_model_for_inference
from bmcnet_esr_tpu.training.checkpoint import latest_checkpoint
from bmcnet_esr_tpu.training.config import RunConfig
from bmcnet_esr_tpu.training.trainer import Trainer
from tests.test_synthesis import write_sim_txt


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    sim = root / "sim"
    # one "nfs-like" sequence at two scales (relabeled ori/down2 by preset)
    for scale_dir, n in [("down2", 24000), ("down4", 6000), ("down8", 1500), ("down16", 380)]:
        d = sim / scale_dir
        d.mkdir(parents=True)
        write_sim_txt(str(d / "seq.txt"), n, 32, 32, seed=hash(scale_dir) % 97)
    h5s = synthesis.synthesize_dataset(str(sim), str(root / "h5"), "nfs")
    datalist = root / "train.txt"
    datalist.write_text("\n".join(h5s))
    return root, h5s, str(datalist)


@pytest.mark.slow
def test_full_pipeline(workspace, tmp_path):
    root, h5s, datalist = workspace

    cfg = {
        "experiment": "e2e",
        "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 1e-5, "amsgrad": True}},
        "lr_scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.95}},
        "trainer": {
            "output_path": str(tmp_path),
            "monitor": "off",
            "tensorboard": False,
            "iteration_based_train": {
                "enabled": True, "iterations": 4, "save_period": 10,
                "train_log_step": 2, "valid_log_step": 5, "valid_step": 10,
                "lr_change_rate": 4,
            },
        },
        "train_dataloader": {
            "path_to_datalist_txt": datalist,
            "batch_size": 2, "shuffle": True, "drop_last": True, "num_workers": 1,
            "dataset": {
                "scale": 2, "ori_scale": "down2", "window": 64, "sliding_window": 32,
                "need_gt_events": True, "mode": "events", "time_bins": 1,
                "data_augment": {"enabled": True},
                "sequence": {"sequence_length": 3, "seqn": 2, "step_size": 3},
            },
        },
    }
    run = RunConfig(cfg, runid="e2e0")
    trainer = Trainer(run, seed=1)
    result = trainer.train()
    assert np.isfinite(result["train_loss"])

    ckpt = latest_checkpoint(run.save_dir)
    assert ckpt is not None

    # inference with the TRAINED orbax checkpoint
    from bmcnet_esr_tpu.data import DatasetConfig
    from bmcnet_esr_tpu.data.h5dataset import SequenceConfig

    model, variables = load_model_for_inference(ckpt, scale=2, n_c=8, n_b=2, variant="plain")
    engine = InferenceEngine(
        model, variables,
        DatasetConfig(scale=2, ori_scale="down2", window=64, sliding_window=32,
                      sequence=SequenceConfig(3, 2, 1)),
        chunk_size=8, visualize=True,
    )
    out = engine.infer_datalist(h5s, str(tmp_path / "infer_out"), ckpt)
    assert np.isfinite(out["mean"]["esr_mse"])
    # visual streams + YAML written
    name = os.path.basename(h5s[0])
    assert os.path.isdir(tmp_path / "infer_out" / name / "event_img" / "hr_esr_event_img")
