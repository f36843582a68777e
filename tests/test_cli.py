"""CLI plumbing tests (arg parsing, override wiring) — no device work."""

import pytest


class TestTrainCLI:
    def test_parse_overrides(self):
        import argparse

        from bmcnet_esr_tpu.cli.train import parse_overrides

        ns = argparse.Namespace(
            learning_rate=5e-5,
            batch_size=4,
            override=[["trainer;iteration_based_train;iterations", "100"],
                      ["model;args;variant", "plain"]],
        )
        ov = dict(parse_overrides(ns))
        assert ov["optimizer;args;lr"] == 5e-5
        assert ov["train_dataloader;batch_size"] == 4
        assert ov["trainer;iteration_based_train;iterations"] == 100  # literal_eval
        assert ov["model;args;variant"] == "plain"  # stays a string


class TestInferCLI:
    def test_seqn_other_than_two_is_tolerated(self, tmp_path, capsys):
        from bmcnet_esr_tpu.cli.infer import main

        # seqn != 2 prints a note (reference ignores extra windows) and then
        # fails on the missing checkpoint, not on seqn
        with pytest.raises(SystemExit, match="model_path"):
            main(["--output_path", str(tmp_path), "--seqn", "3", "--model_path", "/nope.pth"])
        assert "behaves identically" in capsys.readouterr().out

    def test_requires_checkpoint(self, tmp_path):
        from bmcnet_esr_tpu.cli.infer import main

        with pytest.raises(SystemExit, match="model_path"):
            main(["--output_path", str(tmp_path), "--model_path", "/nonexistent.pth"])

    def test_mesh_devices_wiring(self, monkeypatch, tmp_path):
        """--mesh_devices N builds a 1-D 'data' mesh and hands it to the
        engine (the engine's sharded-rollout equality is pinned in
        tests/test_parallel.py; the CLI only has to wire it through)."""
        import os

        from bmcnet_esr_tpu.cli import infer as infer_cli

        seen = {}

        class FakeEngine:
            def __init__(self, *a, **kw):
                seen["mesh"] = kw.get("mesh")

            def infer_datalist(self, *a, **kw):
                return {"mean": {}}

        # main() imports from bmcnet_esr_tpu.inference lazily — patch there
        import bmcnet_esr_tpu.inference as inference_pkg

        monkeypatch.setattr(inference_pkg, "InferenceEngine", FakeEngine)
        monkeypatch.setattr(
            inference_pkg, "load_model_for_inference",
            lambda *a, **kw: (None, None),
        )
        ckpt = os.path.join(
            os.path.dirname(__file__), "goldens", "plain_small.npz"
        )
        base = [
            "--model_path", ckpt, "--data_path", "/dev/null",
            "--output_path", str(tmp_path),
        ]
        infer_cli.main(base + ["--mesh_devices", "8", "--batch_streams", "8"])
        assert seen["mesh"] is not None and seen["mesh"].size == 8
        assert seen["mesh"].axis_names == ("data",)
        infer_cli.main(base)
        assert seen["mesh"] is None  # default stays single-device

    def test_dataset_config_flags(self):
        import argparse

        from bmcnet_esr_tpu.cli.infer import build_dataset_config

        ns = argparse.Namespace(
            scale=4, ori_scale="down16", window=2048, sliding_window=1024,
            mode="events", time_bins=1, need_gt_events=True, need_gt_frame=False,
            real_world_test=False, seql=9, seqn=2, step_size=1,
        )
        cfg = build_dataset_config(ns)
        assert cfg.scale == 4 and cfg.ori_scale == "down16"
        assert cfg.sequence.step_size == 1


class TestGenerateCLI:
    def test_inspect_roundtrip(self, tmp_path, capsys):
        from bmcnet_esr_tpu.cli.generate import main
        from tests.test_synthesis import write_sim_txt

        txt = str(tmp_path / "a.txt")
        write_sim_txt(txt, 30, 8, 8, 0)
        out = str(tmp_path / "a.h5")
        main(["txt", "--txt", txt, "--out", out, "--resolution", "8", "8"])
        main(["inspect", "--h5", out])
        assert '"num_events": 30' in capsys.readouterr().out


class TestRecipeConfigs:
    @pytest.mark.parametrize("name", ["train_nfs", "train_RGB", "train_EventZoom"])
    def test_recipe_parses_into_framework_types(self, name, tmp_path):
        import yaml

        from bmcnet_esr_tpu.data import DatasetConfig
        from bmcnet_esr_tpu.training.config import RunConfig
        from bmcnet_esr_tpu.training.optim import build_optimizer

        cfg = yaml.safe_load(open(f"configs/{name}.yml"))
        run = RunConfig(cfg, runid="t", overrides=(("trainer;output_path", str(tmp_path)),))
        for dl in ("train_dataloader", "valid_dataloader"):
            dc = DatasetConfig.from_dict(run[dl]["dataset"])
            assert dc.mode == "events" and dc.window > dc.sliding_window
        tx, sched = build_optimizer(
            run["optimizer"], run["lr_scheduler"], run["trainer"]["iteration_based_train"]
        )
        assert float(sched(0)) == pytest.approx(1e-4)
        tcfg = run["trainer"]["iteration_based_train"]
        assert tcfg["enabled"] and tcfg["iterations"] == 100000


class TestHelpRenders:
    """Every CLI must render --help (a literal '%' in a help string once made
    argparse crash with '%o format: an integer is required' — cli/infer.py)."""

    @pytest.mark.parametrize(
        "mod",
        ["infer", "train", "serve", "convert", "export", "generate", "upsample", "visualize"],
    )
    def test_help(self, mod, capsys):
        import importlib

        cli = importlib.import_module(f"bmcnet_esr_tpu.cli.{mod}")
        with pytest.raises(SystemExit) as e:
            cli.main(["--help"])
        assert e.value.code == 0
        assert "usage" in capsys.readouterr().out.lower()
