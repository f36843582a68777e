"""Quickstart demo dataset: `cli.generate demo` must yield data on which
the STOCK configs/train_nfs.yml recipe runs out of the box.

The generator simulates one video per file at two scales (down2 + down8 —
exactly the groups the NFS x4 recipe consumes) and self-checks clip counts
against the real dataset layer before writing the datalists."""

import json
import os

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    from bmcnet_esr_tpu.data.demo import generate_demo

    root = tmp_path_factory.mktemp("demo")
    summary = generate_demo(
        str(root / "h5"), str(root / "dl"), n_train=1, n_valid=1
    )
    return root, summary


class TestGenerateDemo:
    def test_zero_file_splits_rejected_before_any_simulation(self, tmp_path):
        """n_train/n_valid == 0 would write a blank-line datalist the
        loaders read as path '' — must fail at entry, before the expensive
        simulation writes any file."""
        from bmcnet_esr_tpu.data.demo import generate_demo

        for kwargs in ({"n_train": 0}, {"n_valid": 0}):
            with pytest.raises(RuntimeError, match="n_train >= 1"):
                generate_demo(str(tmp_path / "h5"), str(tmp_path / "dl"),
                              **kwargs)
        assert not os.path.exists(tmp_path / "h5")  # nothing was generated

    def test_files_satisfy_nfs_recipe_shapes(self, demo):
        root, summary = demo
        for name, info in summary["files"].items():
            # >= one training batch of clips, and the 16x event-count ratio
            # that count-based GT alignment (h5dataset) relies on
            assert info["clips"] >= 2, (name, info)
            ratio = info["events_down2"] / info["events_down8"]
            assert 14.0 < ratio < 18.0, (name, ratio)
            assert info["mbytes"] < 12.0, (name, info)  # quickstart-sized
        for key in ("train_datalist", "valid_datalist"):
            paths = open(summary[key]).read().split()
            assert paths and all(os.path.isabs(p) and os.path.exists(p) for p in paths)

    def test_nfs_loader_pulls_a_real_batch(self, demo):
        """The EXACT dataloader block of configs/train_nfs.yml (no demo-side
        tweaks) must produce a full training batch from the generated h5."""
        from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader

        root, summary = demo
        with open(os.path.join(REPO, "configs", "train_nfs.yml")) as f:
            cfg = yaml.safe_load(f)
        dl = cfg["train_dataloader"]
        files = open(summary["train_datalist"]).read().split()
        loader = SequenceLoader(
            files, DatasetConfig.from_dict(dl["dataset"]),
            batch_size=dl["batch_size"], shuffle=True, drop_last=True,
            num_workers=1, seed=0, compact=True,
        )
        it = iter(loader)
        batch = next(it)
        assert batch["inp_xy"].shape[0] == dl["batch_size"]
        assert batch["inp_xy"].shape[1] == dl["dataset"]["sequence"]["sequence_length"]
        it.close()  # generator finally shuts the worker threads down

    @pytest.mark.slow
    def test_stock_recipe_trains_two_iterations(self, demo, tmp_path):
        """cli.train -c configs/train_nfs.yml on the demo data: 2 optimizer
        iterations end-to-end (model downsized via the same ;-override
        surface a user has, purely to keep the CPU test fast — the data,
        recipe, loader, and step wiring are stock)."""
        from bmcnet_esr_tpu.cli import train as train_cli

        root, summary = demo
        train_cli.main([
            "-c", os.path.join(REPO, "configs", "train_nfs.yml"),
            "-o", "train_dataloader;path_to_datalist_txt", summary["train_datalist"],
            "-o", "valid_dataloader;path_to_datalist_txt", summary["valid_datalist"],
            "-o", "trainer;output_path", str(tmp_path),
            "-o", "trainer;iteration_based_train;iterations", "2",
            "-o", "trainer;iteration_based_train;train_log_step", "1",
            "-o", "trainer;tensorboard", "False",
            "-o", "model;args;n_c", "8",
            "-o", "model;args;n_b", "2",
            "-o", "train_dataloader;num_workers", "1",
            "-o", "valid_dataloader;num_workers", "1",
        ])
        # the run directory carries the archived config + a metrics trail
        runs = list(tmp_path.rglob("config.yml"))
        assert runs, list(tmp_path.rglob("*"))
