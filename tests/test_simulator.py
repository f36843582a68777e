"""Video -> event simulator: analytic single-pixel cases, stochastic rates,
path consistency (event list vs direct counts), multi-scale packaging, and
the CLI."""

import numpy as np
import pytest

from bmcnet_esr_tpu.data.simulator import (
    EventSimulator,
    SimulatorConfig,
    downscale_frames,
    simulate_multiscale,
    write_voltmeter_txt,
)


def gray(v, shape=(8, 12)):
    return np.full(shape, v, np.float32)


def moving_gradient(t_frames, h, w, seed=0):
    """Smooth drifting intensity pattern with real contrast changes."""
    rng = np.random.default_rng(seed)
    phase = rng.random() * 6.28
    tt = np.arange(t_frames)[:, None, None]
    yy, xx = np.mgrid[0:h, 0:w]
    img = 0.5 + 0.4 * np.sin(0.3 * xx + 0.5 * yy + 0.7 * tt + phase)
    return img.astype(np.float32)


class TestAnalytic:
    def test_constant_video_no_events(self):
        frames = np.stack([gray(0.5)] * 5)
        sim = EventSimulator((8, 12), SimulatorConfig())
        ev = sim.simulate(frames, np.arange(5) / 100.0)
        assert ev.shape == (0, 4)

    def test_rising_edge_counts_and_times(self):
        # one pixel ramps up by 3.5 thresholds over one 10ms interval:
        # exactly 3 ON events at the analytic crossing times
        c = 0.2
        cfg = SimulatorConfig(contrast_threshold=c, log_eps=1e-3)
        f0 = gray(0.2)
        l0 = np.log(0.2 + 1e-3)
        l1 = l0 + 3.5 * c
        f1 = gray(0.2)
        f1[3, 7] = np.exp(l1) - 1e-3
        sim = EventSimulator((8, 12), cfg)
        ev = sim.simulate(np.stack([f0, f1]), np.array([0.0, 0.01]))
        assert len(ev) == 3
        assert (ev[:, 0] == 7).all() and (ev[:, 1] == 3).all()
        assert (ev[:, 3] == 1).all()
        # linear signal: crossing k at dt * k*c / (3.5*c)
        expected = 0.01 * np.arange(1, 4) * c / (3.5 * c)
        np.testing.assert_allclose(np.sort(ev[:, 2]), expected, atol=1e-6)

    def test_falling_edge_polarity(self):
        cfg = SimulatorConfig(contrast_threshold=0.15)
        f0, f1 = gray(0.8), gray(0.8)
        f1[2, 2] = 0.1
        sim = EventSimulator((8, 12), cfg)
        ev = sim.simulate(np.stack([f0, f1]), np.array([0.0, 0.01]))
        assert len(ev) > 0
        assert (ev[:, 3] == -1).all()
        assert (ev[:, 0] == 2).all() and (ev[:, 1] == 2).all()

    def test_residual_carries_across_intervals(self):
        # 0.7 thresholds per interval: events fire on accumulated change
        # (intervals 2, 3, 5, ... in the floor pattern of 0.7k)
        c = 0.1
        cfg = SimulatorConfig(contrast_threshold=c)
        levels = np.log(0.3) + 0.7 * c * np.arange(6)
        frames = np.stack([gray(np.exp(l)) for l in levels])
        sim = EventSimulator((8, 12), cfg)
        ev = sim.simulate(frames, np.arange(6) / 100.0)
        per_px = len(ev) / (8 * 12)
        assert per_px == pytest.approx(np.floor(0.7 * 5), abs=1e-9)

    def test_refractory_absorbs(self):
        # 10-threshold jump in 1 ms with a 0.3 ms refractory: crossings are
        # ~0.1 ms apart, so only every 3rd-to-4th survives; none are delayed
        cfg = SimulatorConfig(contrast_threshold=0.1, refractory_s=3e-4)
        l1 = np.log(0.2 + 1e-3) + 10 * 0.1
        f0, f1 = gray(0.2, (2, 2)), gray(np.exp(l1) - 1e-3, (2, 2))
        sim = EventSimulator((2, 2), cfg)
        ev = sim.simulate(np.stack([f0, f1]), np.array([0.0, 1e-3]))
        per_px = np.sort(ev[(ev[:, 0] == 0) & (ev[:, 1] == 0), 2])
        assert 2 <= len(per_px) <= 4  # rate-capped, well under 10
        assert (np.diff(per_px) >= 3e-4 - 1e-7).all()
        # absorbed, not delayed: a following static interval emits nothing
        ev2 = sim.simulate(np.stack([f1, f1]), np.array([1e-3, 2e-3]))
        assert len(ev2) == 0

    def test_cap_saturates_emission(self):
        cfg = SimulatorConfig(contrast_threshold=0.05, max_events_per_pixel=4)
        f0, f1 = gray(0.1, (2, 2)), gray(0.9, (2, 2))
        sim = EventSimulator((2, 2), cfg)
        ev = sim.simulate(np.stack([f0, f1]), np.array([0.0, 0.01]))
        assert len(ev) == 4 * 4  # capped per pixel

    def test_leak_fires_on_static_scene(self):
        cfg = SimulatorConfig(contrast_threshold=0.1, leak_rate_hz=5.0)
        frames = np.stack([gray(0.6, (4, 4))] * 11)
        ts = np.linspace(0.0, 2.0, 11)
        sim = EventSimulator((4, 4), cfg)
        ev = sim.simulate(frames, ts)
        assert (ev[:, 3] == 1).all()  # leak produces ON events
        per_px = len(ev) / 16
        assert per_px == pytest.approx(10, abs=1)  # ~ leak_rate * T


class TestStochastic:
    def test_determinism_and_seed_sensitivity(self):
        frames = moving_gradient(6, 10, 14)
        ts = np.arange(6) / 200.0
        cfg = SimulatorConfig(threshold_sigma=0.2, noise_rate_hz=40.0, seed=7)
        a = EventSimulator((10, 14), cfg).simulate(frames, ts)
        b = EventSimulator((10, 14), cfg).simulate(frames, ts)
        np.testing.assert_array_equal(a, b)
        c = EventSimulator((10, 14), SimulatorConfig(
            threshold_sigma=0.2, noise_rate_hz=40.0, seed=8)).simulate(frames, ts)
        assert a.shape != c.shape or not np.array_equal(a, c)

    def test_threshold_mismatch_varies_counts(self):
        # uniform 2-threshold ramp; with mismatch, per-pixel counts differ
        c = 0.1
        f0 = gray(0.3, (16, 16))
        f1 = gray(np.exp(np.log(0.3 + 1e-3) + 2.5 * c) - 1e-3, (16, 16))
        cfg = SimulatorConfig(contrast_threshold=c, threshold_sigma=0.25, seed=1)
        ev = EventSimulator((16, 16), cfg).simulate(
            np.stack([f0, f1]), np.array([0.0, 0.01]))
        counts = np.zeros((16, 16))
        np.add.at(counts, (ev[:, 1].astype(int), ev[:, 0].astype(int)), 1)
        assert counts.std() > 0.3  # mismatch spreads the counts
        assert abs(counts.mean() - 2.5) < 1.0

    def test_noise_rate_poisson(self):
        frames = np.stack([gray(0.5, (32, 32))] * 21)
        ts = np.linspace(0.0, 1.0, 21)
        cfg = SimulatorConfig(noise_rate_hz=10.0, seed=3)
        ev = EventSimulator((32, 32), cfg).simulate(frames, ts)
        expected = 10.0 * 1.0 * 32 * 32
        assert abs(len(ev) - expected) < 0.1 * expected
        frac_on = (ev[:, 3] > 0).mean()
        assert 0.45 < frac_on < 0.55
        assert (np.diff(ev[:, 2]) >= 0).all()  # globally sorted

    def test_hot_pixels_boosted(self):
        frames = np.stack([gray(0.5, (32, 32))] * 21)
        ts = np.linspace(0.0, 1.0, 21)
        cfg = SimulatorConfig(
            noise_rate_hz=4.0, hot_pixel_fraction=0.05, hot_pixel_gain=20.0, seed=4
        )
        sim = EventSimulator((32, 32), cfg)
        ev = sim.simulate(frames, ts)
        counts = np.zeros((32, 32))
        np.add.at(counts, (ev[:, 1].astype(int), ev[:, 0].astype(int)), 1)
        hot, cold = counts[sim.hot_pixels], counts[~sim.hot_pixels]
        assert hot.mean() > 5 * max(cold.mean(), 0.1)


class TestPathConsistency:
    def test_counts_equal_event_list(self):
        frames = moving_gradient(9, 12, 16, seed=2)
        ts = np.arange(9) / 150.0
        cfg = SimulatorConfig(threshold_sigma=0.1, noise_rate_hz=30.0, seed=5)
        ev = EventSimulator((12, 16), cfg).simulate(frames, ts)
        counts = EventSimulator((12, 16), cfg).simulate_counts(frames, ts)
        assert counts.shape == (8, 2, 12, 16)
        total = counts.sum(0)  # [2, H, W]
        hist = np.zeros((2, 12, 16))
        chan = (ev[:, 3] < 0).astype(int)
        np.add.at(hist, (chan, ev[:, 1].astype(int), ev[:, 0].astype(int)), 1)
        np.testing.assert_array_equal(total, hist)

    def test_counts_per_interval_no_noise(self):
        # clean monotonic ramp: per-interval counts match exactly
        c = 0.1
        levels = np.log(0.2) + 1.3 * c * np.arange(5)
        frames = np.stack([gray(np.exp(l), (6, 6)) for l in levels])
        ts = np.arange(5) / 100.0
        cfg = SimulatorConfig(contrast_threshold=c)
        ev = EventSimulator((6, 6), cfg).simulate(frames, ts)
        counts = EventSimulator((6, 6), cfg).simulate_counts(frames, ts)
        for i in range(4):
            sel = (ev[:, 2] >= ts[i]) & (ev[:, 2] < ts[i + 1] - 1e-12)
            assert counts[i, 0].sum() == sel.sum() or counts[i].sum() == (
                (ev[:, 2] >= ts[i]) & (ev[:, 2] <= ts[i + 1])).sum()


class TestMultiScale:
    def test_downscale_shapes(self):
        frames = moving_gradient(3, 32, 48)
        half = downscale_frames(frames, 2)
        assert half.shape == (3, 16, 24)
        same = downscale_frames(frames, 1)
        assert same.shape == frames.shape

    def test_multiscale_h5_and_txt(self, tmp_path):
        frames = (moving_gradient(7, 32, 48, seed=3) * 255).astype(np.uint8)
        ts = np.arange(7) / 120.0
        h5 = str(tmp_path / "seq.h5")
        txt = str(tmp_path / "txt")
        streams = simulate_multiscale(
            frames, ts, scales=(1, 2), prefixes=("ori", "down2"),
            config=SimulatorConfig(contrast_threshold=0.2, seed=9),
            out_h5=h5, txt_dir=txt, store_frames=True,
        )
        import h5py

        with h5py.File(h5, "r") as f:
            assert list(f.attrs["sensor_resolution"]) == [32, 48]
            for prefix in ("ori", "down2"):
                g = f[f"{prefix}_events"]
                assert g["ts"].dtype == np.float64
                t = g["ts"][:]
                assert (np.diff(t) >= 0).all()
                assert len(t) == len(streams[prefix])
            # frames + per-prefix first-event-at-or-after indices
            img = f["ori_images"]
            assert img.attrs["num_images"] == 7
            d = img["image000000003"]
            idx = d.attrs["ori_event_idx"]
            assert idx == np.searchsorted(f["ori_events/ts"][:], d.attrs["timestamp"])
        # denser streams at finer scales
        assert len(streams["ori"]) > len(streams["down2"])

        # txt dumps parse back bit-comparably via the synthesis reader
        from bmcnet_esr_tpu.data.synthesis import read_simulator_txt

        back = read_simulator_txt(str(tmp_path / "txt" / "ori.txt"))
        np.testing.assert_array_equal(back[:, 0], streams["ori"][:, 0])
        np.testing.assert_array_equal(back[:, 1], streams["ori"][:, 1])
        np.testing.assert_array_equal(back[:, 3], streams["ori"][:, 3])
        np.testing.assert_allclose(back[:, 2], streams["ori"][:, 2], atol=1e-8)

    def test_relabeled_prefixes_declare_the_ori_group_grid(self, tmp_path):
        """The documented CLI invocation relabels one octave down
        (--scales 2,4 --prefixes ori,down2): sensor_resolution must be the
        grid the `ori` PREFIX was simulated on (raw/2), not the raw video —
        the dataset layer derives every prefix's grid as sensor/downN."""
        import h5py

        frames = (moving_gradient(7, 32, 48, seed=3) * 255).astype(np.uint8)
        ts = np.arange(7) / 120.0
        h5 = str(tmp_path / "relab.h5")
        streams = simulate_multiscale(
            frames, ts, scales=(2, 4), prefixes=("ori", "down2"),
            config=SimulatorConfig(contrast_threshold=0.2, seed=9),
            out_h5=h5, store_frames=True,
        )
        with h5py.File(h5, "r") as f:
            assert list(f.attrs["sensor_resolution"]) == [16, 24]
            # events actually fit the declared grids
            assert f["ori_events/xs"][:].max() < 24
            assert f["ori_events/ys"][:].max() < 16
            assert f["down2_events/xs"][:].max() < 12
            # stored frames live on the declared ori grid
            assert f["ori_images/image000000000"].shape == (16, 24)
        assert len(streams["ori"]) > len(streams["down2"])

        # a scale/prefix combination the layout math cannot represent raises
        # instead of writing a silently-corrupt file
        with pytest.raises(ValueError, match="inconsistent"):
            simulate_multiscale(
                frames, ts, scales=(2, 3), prefixes=("ori", "down2"),
                config=SimulatorConfig(contrast_threshold=0.2, seed=9),
                out_h5=str(tmp_path / "bad.h5"),
            )

    def test_simulated_h5_feeds_the_dataset(self, tmp_path):
        from bmcnet_esr_tpu.data import DatasetConfig, EventH5Dataset
        from bmcnet_esr_tpu.data.h5dataset import SequenceConfig

        frames = (moving_gradient(40, 32, 48, seed=6) * 255).astype(np.uint8)
        ts = np.arange(40) / 240.0
        h5 = str(tmp_path / "train.h5")
        simulate_multiscale(
            frames, ts, scales=(1, 2), prefixes=("ori", "down2"),
            config=SimulatorConfig(contrast_threshold=0.1, noise_rate_hz=20.0, seed=11),
            out_h5=h5,
        )
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            need_gt_events=True,
            sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=1),
        )
        ds = EventH5Dataset(h5, cfg)
        assert len(ds) > 2
        item = ds.get_window(0, seed=0)
        assert item["inp_events"].shape[0] == 4
        assert item["gt_events"].shape[1] == 128 * 4  # scale^2 * window


class TestLearning:
    @pytest.mark.slow
    def test_training_learns_from_simulated_video(self, tmp_path):
        """The fully self-contained loop: video -> simulated events -> h5 ->
        BPTT training, no external tool or dataset anywhere.  Unlike the
        random-event fixtures, the GT here carries real cross-scale structure
        (the same scene simulated at two resolutions), so a falling loss
        means the model is actually learning the LR->HR mapping."""
        import jax
        import jax.numpy as jnp

        from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
        from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
        from bmcnet_esr_tpu.models import BMCNetPlain
        from bmcnet_esr_tpu.training.optim import adam_torch
        from bmcnet_esr_tpu.training.train_step import init_train_state, make_train_step

        frames = (moving_gradient(48, 32, 48, seed=12) * 255).astype(np.uint8)
        ts = np.arange(48) / 240.0
        h5 = str(tmp_path / "train.h5")
        simulate_multiscale(
            frames, ts, scales=(1, 2), prefixes=("ori", "down2"),
            config=SimulatorConfig(
                contrast_threshold=0.12, threshold_sigma=0.03,
                noise_rate_hz=10.0, seed=13,
            ),
            out_h5=h5,
        )
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=96, sliding_window=0,
            need_gt_events=True,
            sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
        )
        loader = SequenceLoader(
            [h5], cfg, batch_size=2, shuffle=True, drop_last=True,
            num_workers=1, seed=0,
        )
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        tx = adam_torch(1e-3)
        h, w = loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        state = init_train_state(params, tx)
        step = make_train_step(model, tx, loader.inp_resolution, loader.gt_resolution)

        losses = []
        for _ in range(4):
            for batch in loader:
                state, m = step(state, batch)
                losses.append(float(m["train_loss"]))
        assert np.isfinite(losses).all()
        first = np.mean(losses[:4])
        last = np.mean(losses[-4:])
        assert last < first * 0.8, (first, last)


class TestCLI:
    def test_cli_npy_to_h5(self, tmp_path):
        from bmcnet_esr_tpu.cli.simulate import main

        frames = (moving_gradient(5, 16, 16) * 255).astype(np.uint8)
        npy = str(tmp_path / "video.npy")
        np.save(npy, frames)
        out = str(tmp_path / "out.h5")
        main([
            "--frames", npy, "--fps", "100", "--scales", "1,2",
            "--out_h5", out, "--contrast", "0.15", "--noise_rate", "5",
        ])
        import h5py

        with h5py.File(out, "r") as f:
            assert f["ori_events/ts"].shape[0] > 0
            assert f["down2_events/ts"].shape[0] > 0
