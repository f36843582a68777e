"""Auxiliary tooling tests: dataset encodings, flow vis, viewer CLI."""

import os

import numpy as np
import pytest

from bmcnet_esr_tpu.data import DatasetConfig, EventH5Dataset
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.vis.flow import FlowVisualizer, flow_to_image, minmax_norm


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aux") / "a.h5")
    write_synthetic_fixture(path, (32, 32), ("ori", "down2"), {"ori": 20000, "down2": 5000}, seed=9)
    return path


def dataset(fixture_h5, **kw):
    base = dict(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        time_bins=3, sequence=SequenceConfig(2, 2, 2),
    )
    base.update(kw)
    return EventH5Dataset(fixture_h5, DatasetConfig(**base))


class TestAuxEncodings:
    def test_voxel_and_stack_shapes(self, fixture_h5):
        ds = dataset(fixture_h5)
        item = ds.get_window(0, seed=0)
        ev = item["inp_events"][:, : item["inp_len"]]
        vox = ds.create_voxel_encoding(ev, ds.layout.inp_resolution)
        stk = ds.create_stack_encoding(ev, ds.layout.inp_resolution)
        assert vox.shape == (3, 16, 16) and stk.shape == (3, 16, 16)
        # voxel mass == signed event count (partition of unity over bins)
        assert np.isclose(vox.sum(), ev[3].sum(), atol=1e-3)

    def test_cnt_encoding_matches_native(self, fixture_h5):
        ds = dataset(fixture_h5)
        item = ds.get_window(0, seed=0)
        ev = item["inp_events"]
        cnt = ds.create_cnt_encoding(ev, ds.layout.inp_resolution)
        assert cnt.shape == (2, 16, 16)
        assert cnt.sum() == item["inp_len"]

    def test_scaled_and_unsupervised(self, fixture_h5):
        ds = dataset(fixture_h5)
        item = ds.get_window(0, seed=0)
        ev = item["inp_events"][:, : item["inp_len"]]
        norm = ds.normalize_events(ev, ds.layout.inp_resolution)
        assert norm[0].max() <= 1.0
        big = ds.create_scaled_encoding(norm, (32, 32), "cnt")
        assert big.shape == (2, 32, 32)
        down_cnt, down_scaled = ds.create_unsupervised_data(norm)
        assert down_cnt.shape[0] == 2 and down_scaled.shape == (2, 16, 16)

    def test_custom_data(self, fixture_h5):
        ds = dataset(fixture_h5, custom_resolution=(10, 12))
        z = np.zeros((2, 16, 16), np.float32)
        outs = ds.create_custom_data(z, np.zeros((2, 32, 32), np.float32), z, z, np.zeros((2, 32, 32), np.float32))
        assert outs[0].shape == (2, 10, 12)
        assert outs[1].shape == (2, 20, 24)


class TestFlowVis:
    def test_flow_to_image_properties(self):
        h = w = 16
        fx = np.ones((h, w)) * 0.5
        fy = np.zeros((h, w))
        img = flow_to_image(fx, fy)
        assert img.shape == (h, w, 3) and img.dtype == np.uint8

    def test_minmax_norm_range(self):
        x = np.random.default_rng(0).standard_normal((20, 20))
        y = minmax_norm(x)
        assert y.min() >= 0 and y.max() <= 1

    def test_store_streams(self, tmp_path):
        vis = FlowVisualizer(str(tmp_path))
        cnt = np.random.default_rng(0).integers(0, 3, (16, 16, 2)).astype(np.float32)
        flow = np.random.default_rng(1).standard_normal((2, 16, 16)).astype(np.float32)
        paths = vis.store(event_cnt=cnt, flow=flow, iwe=cnt, brightness=cnt[..., 0], sequence="s")
        for p in paths.values():
            assert os.path.exists(p)


class TestViewerCLI:
    def test_renders_windows(self, fixture_h5, tmp_path):
        from bmcnet_esr_tpu.cli.visualize import main

        out = str(tmp_path / "viz")
        main([
            "--h5", fixture_h5, "--prefix", "down2", "--window", "256",
            "--sliding_window", "128", "--out", out, "--num", "3",
        ])
        files = os.listdir(out)
        assert sum(f.startswith("cnt_") for f in files) == 3


class TestDaemonHostpathBench:
    def test_instant_pool_drives_real_daemon(self):
        """tools/bench_daemon_hostpath's InstantPool must stay duck-typed
        to the exact pool surface EventSRServer touches — a drift (new
        attr, changed return shape) shows up here as a crash or a wrong
        reply count.  Tiny shapes: the point is the surface, not the
        number."""
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, os.path.join(repo, "tools"))
        from bench_daemon_hostpath import bench_hostpath

        for wire in ("float32", "float16", "int8"):
            wps, stats = bench_hostpath(
                wire, n_clients=2, windows_per_client=6, scan_k=2,
                resolution=(8, 8), window_size=32,
            )
            assert wps > 0
            assert stats["windows_served"] == 2 * 6 - 2  # first = PENDING
            assert stats["errors_sent"] == 0
