"""Coverage for less-traveled paths: frame-mode windows + GT frames,
3-D cloud movies, the LPIPS trainer loss term, profiling helpers."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data import DatasetConfig, EventH5Dataset
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import MultiScaleEventPackager


@pytest.fixture(scope="module")
def frame_fixture(tmp_path_factory):
    """Multi-scale h5 WITH stored ori_images + timestamps."""
    path = str(tmp_path_factory.mktemp("frames") / "f.h5")
    rng = np.random.default_rng(0)
    with MultiScaleEventPackager(path) as pk:
        pk.set_sensor_resolution([32, 32])
        for prefix, n in [("ori", 20000), ("down2", 5000)]:
            factor = 1 if prefix == "ori" else 2
            ts = np.sort(rng.random(n))
            pk.append_events(
                prefix,
                rng.integers(0, 32 // factor, n),
                rng.integers(0, 32 // factor, n),
                ts,
                rng.integers(0, 2, n) * 2 - 1,
            )
        for i in range(6):
            pk.append_image("ori", rng.integers(0, 255, (32, 32)), timestamp=i / 5.0)
        pk.annotate_image_event_indices("ori", "ori")
    return path


class TestFrameMode:
    def test_frame_mode_windows(self, frame_fixture):
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=64, sliding_window=32,
            mode="frame", need_gt_events=True, need_gt_frame=True,
            sequence=SequenceConfig(2, 2, 2),
        )
        ds = EventH5Dataset(frame_fixture, cfg)
        # frame mode: one window per inter-frame interval
        assert len(ds) == ds.num_frames - 1
        item = ds.get_window(1, seed=0)
        assert "gt_frame" in item
        assert item["gt_frame"].shape == (1, 32, 32)  # resized to gt res
        assert 0.0 <= item["gt_frame"].min() and item["gt_frame"].max() <= 1.0

    def test_image_event_idx_attrs(self, frame_fixture):
        import h5py

        with h5py.File(frame_fixture, "r") as f:
            grp = f["ori_images"]
            names = sorted(grp.keys())
            idxs = [grp[n].attrs["ori_event_idx"] for n in names]
            assert all(b >= a for a, b in zip(idxs, idxs[1:]))  # monotone


class TestCloudMovie:
    def test_writes_frames(self, tmp_path):
        from bmcnet_esr_tpu.vis import EventVisualizer

        rng = np.random.default_rng(0)
        ev = np.stack(
            [rng.integers(0, 16, 300), rng.integers(0, 16, 300),
             np.sort(rng.random(300)), rng.integers(0, 2, 300) * 2 - 1], axis=1
        ).astype(np.float32)
        paths = EventVisualizer().plot_event_cloud_movie(
            ev, str(tmp_path / "mv"), n_frames=3, max_points=100
        )
        assert len(paths) == 3 and all(os.path.exists(p) for p in paths)


class TestLpipsLossTerm:
    def test_builds_and_runs(self, tmp_path):
        from bmcnet_esr_tpu.training.losses import build_extra_losses
        from tools.lpips_fixture_nets import make_alex_features

        torch.manual_seed(0)
        backbone = str(tmp_path / "alex_features.pth")
        torch.save(make_alex_features().state_dict(), backbone)
        lin = "/root/reference/loss/PerceptualSimilarity/models/weights/v0.1/alex.pth"

        extra = build_extra_losses(
            {"lpips": {"weight": 0.5, "net": "alex",
                       "backbone_weights": backbone, "lin_weights": lin}}
        )
        assert extra[0][0] == "lpips" and extra[0][1] == 0.5
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.random((1, 64, 64, 2)).astype(np.float32))
        gt = jnp.asarray(rng.random((1, 64, 64, 2)).astype(np.float32))
        val = float(extra[0][2](pred, gt))
        assert np.isfinite(val) and val > 0
        assert float(extra[0][2](pred, pred)) == pytest.approx(0.0, abs=1e-6)


class TestProfiling:
    def test_device_time(self):
        from bmcnet_esr_tpu.utils import device_time

        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((64, 64))
        sec, rate = device_time(f, x, iters=3, warmup=1)
        assert sec > 0 and rate == pytest.approx(1 / sec)

    def test_annotate_context(self):
        from bmcnet_esr_tpu.utils import annotate

        with annotate("test_span"):
            _ = jnp.ones(4).sum()
