"""Data layer tests: packager schema, windowing math, augmentation,
sequence clips, loader batching/sharding, device rasterization."""

import os

import h5py
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bmcnet_esr_tpu.data import (
    DatasetConfig,
    EventH5Dataset,
    EventSequenceDataset,
    SequenceLoader,
    resolve_scale_layout,
)
from bmcnet_esr_tpu.data.h5dataset import AugmentConfig, PauseConfig, SequenceConfig
from bmcnet_esr_tpu.data.packager import MultiScaleEventPackager, write_synthetic_fixture
from bmcnet_esr_tpu.ops.batch import batch_events_to_counts, sliding_pairs


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "seq0.h5")
    # down4 input (16x24) with x4 GT at ori (64x96)
    write_synthetic_fixture(
        path,
        sensor_resolution=(64, 96),
        prefixes=("ori", "down2", "down4"),
        events_per_scale={"ori": 60000, "down2": 16000, "down4": 4000},
        seed=3,
    )
    return path


def small_config(**kw):
    base = dict(
        scale=4,
        ori_scale="down4",
        window=256,
        sliding_window=128,
        need_gt_events=True,
        sequence=SequenceConfig(sequence_length=4, seqn=2, step_size=2),
    )
    base.update(kw)
    return DatasetConfig(**base)


class TestPackagerSchema:
    def test_reference_compatible_layout(self, fixture_h5):
        with h5py.File(fixture_h5, "r") as f:
            assert list(f.attrs["sensor_resolution"]) == [64, 96]
            for prefix in ("ori", "down2", "down4"):
                grp = f[f"{prefix}_events"]
                assert grp["xs"].dtype == np.int16
                assert grp["ys"].dtype == np.int16
                assert grp["ts"].dtype == np.float64
                assert grp["ps"].dtype == np.float64
            assert set(np.unique(f["down4_events/ps"][:])) <= {-1.0, 1.0}

    def test_append_resizes(self, tmp_path):
        p = str(tmp_path / "x.h5")
        with MultiScaleEventPackager(p) as pk:
            pk.set_sensor_resolution([8, 8])
            for _ in range(3):
                pk.append_events("ori", [1, 2], [3, 4], [0.1, 0.2], [1, -1])
        with h5py.File(p, "r") as f:
            assert f["ori_events/xs"].shape == (6,)


class TestScaleLayout:
    @pytest.mark.parametrize(
        "ori_scale,scale,gt_prefix,inp_res,gt_res",
        [
            ("down8", 4, "down2", (45, 80), (180, 320)),  # NFS train recipe
            ("down16", 4, "down4", (22, 40), (90, 160)),  # NFS infer recipe
            ("down4", 4, "ori", (90, 160), (360, 640)),
            ("down4", 2, "down2", (90, 160), (180, 320)),
            ("ori", 1, "ori", (360, 640), (360, 640)),
        ],
    )
    def test_nfs_resolutions(self, ori_scale, scale, gt_prefix, inp_res, gt_res):
        lay = resolve_scale_layout([360, 640], scale, ori_scale, need_gt_events=True)
        assert lay.gt_prefix == gt_prefix
        assert lay.inp_resolution == inp_res
        assert lay.gt_resolution == gt_res

    def test_no_gt_events_multiplies_resolution(self):
        lay = resolve_scale_layout([360, 640], 4, "down8", need_gt_events=False)
        assert lay.gt_prefix == "down8"
        assert lay.gt_resolution == (45 * 4, 80 * 4)

    def test_real_world_layout(self):
        lay = resolve_scale_layout([992, 1776], 4, "down8", False, real_world_test=True)
        assert lay.inp_prefix == "down8_real"
        assert lay.gt_resolution == (round(992 / 2), round(1776 / 2))

    def test_invalid_scale_raises(self):
        with pytest.raises(ValueError):
            resolve_scale_layout([64, 96], 8, "down4", need_gt_events=True)


class TestWindowing:
    def test_events_mode_indices(self, fixture_h5):
        ds = EventH5Dataset(fixture_h5, small_config())
        stride = 256 - 128
        assert len(ds) == ds.num_events // stride
        np.testing.assert_array_equal(ds.event_indices[:, 0], stride * np.arange(len(ds)))
        assert (ds.event_indices[:, 1] <= ds.num_events - 1).all()
        # all but the tail windows are full length
        assert (np.diff(ds.event_indices[:-2], axis=1) == 256).all()

    def test_gt_alignment_count_based(self, fixture_h5):
        ds = EventH5Dataset(fixture_h5, small_config())
        with h5py.File(fixture_h5, "r") as f:
            inp_ts = f["down4_events/ts"][:]
            gt_ts = f["ori_events/ts"][:]
        for i in [0, 1, len(ds) // 2]:
            i0, _ = ds.event_indices[i]
            g0, g1 = ds.gt_event_indices[i]
            if g1 < len(gt_ts) - 1:  # not end-clipped
                assert g1 - g0 == 16 * 256
                assert gt_ts[g0] >= inp_ts[i0]
                if g0 > 0:
                    assert gt_ts[g0 - 1] < inp_ts[i0]

    def test_item_shapes_and_padding(self, fixture_h5):
        cfg = small_config()
        ds = EventH5Dataset(fixture_h5, cfg)
        item = ds.get_window(0, seed=1)
        assert item["inp_events"].shape == (4, 256)
        assert item["gt_events"].shape == (4, 16 * 256)
        assert item["inp_len"] == 256
        # ts normalized to [0, 1]
        ts = item["inp_events"][2, : item["inp_len"]]
        assert ts[0] == 0.0 and 0.99 < ts[-1] <= 1.0
        # padding is all-zero (p=0 -> no rasterization contribution)
        assert (item["gt_events"][:, item["gt_len"] :] == 0).all()

    def test_pause_window_is_zero(self, fixture_h5):
        ds = EventH5Dataset(fixture_h5, small_config())
        item = ds.get_window(0, seed=1, pause=True)
        assert (item["inp_events"] == 0).all() and item["inp_len"] == 0

    def test_time_mode_windows(self, fixture_h5):
        cfg = small_config(mode="time", window=0.2, sliding_window=0.1)
        ds = EventH5Dataset(fixture_h5, cfg)
        with h5py.File(fixture_h5, "r") as f:
            ts = f["down4_events/ts"][:]
        i0, i1 = ds.event_indices[1]
        start = ds.t0 + 0.1
        assert ts[i0] >= start
        assert ts[i1 - 1] < start + 0.2 or i1 == ds.num_events - 1

    @pytest.mark.parametrize("mode,window,sliding", [
        ("events", 256, 128), ("time", 0.2, 0.1),
    ])
    def test_streamed_indexing_matches_full_load(self, fixture_h5, mode, window, sliding):
        """Window + GT-alignment indices must be byte-identical to the
        brute-force computation over fully-loaded timestamp arrays (the
        streamed path never caches ts whole — round-1 VERDICT #5)."""
        from bmcnet_esr_tpu.data.h5dataset import _TS_BLOCK, _stream_searchsorted

        cfg = small_config(mode=mode, window=window, sliding_window=sliding)
        ds = EventH5Dataset(fixture_h5, cfg)
        with h5py.File(fixture_h5, "r") as f:
            inp_ts = f["down4_events/ts"][:]
            gt_ts = f["ori_events/ts"][:]

        # brute-force replication of the indexing math on in-RAM arrays
        stride = window - sliding
        if mode == "events":
            idx0 = stride * np.arange(len(ds), dtype=np.int64)
            idx1 = np.minimum(idx0 + window, ds.num_events - 1)
        else:
            starts = ds.t0 + stride * np.arange(len(ds), dtype=np.float64)
            idx0 = np.searchsorted(inp_ts, starts, "left")
            idx1 = np.minimum(np.searchsorted(inp_ts, starts + window, "left"),
                              ds.num_events - 1)
        np.testing.assert_array_equal(ds.event_indices, np.stack([idx0, idx1], 1))

        gt_count = 16 * int(idx1[0] - idx0[0])
        g0 = np.searchsorted(gt_ts, inp_ts[idx0], "left")
        g1 = g0 + gt_count
        over = g1 > len(gt_ts) - 1
        g1 = np.where(over, len(gt_ts) - 1, g1)
        g0 = np.where(over, np.maximum(g1 - gt_count, 0), g0)
        np.testing.assert_array_equal(ds.gt_event_indices, np.stack([g0, g1], 1))

    def test_stream_searchsorted_block_boundaries(self, tmp_path):
        """Exact np.searchsorted semantics across block edges, incl. ties on
        the boundary and queries beyond the last element."""
        import bmcnet_esr_tpu.data.h5dataset as h5mod

        vals = np.sort(np.random.default_rng(0).integers(0, 50, 200)).astype(np.float64)
        path = str(tmp_path / "s.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("ts", data=vals)
        queries = np.unique(np.concatenate([vals[::7], [-1.0, 49.0, 50.0, 99.0]]))
        old = h5mod._TS_BLOCK
        try:
            h5mod._TS_BLOCK = 16  # force many blocks
            with h5py.File(path, "r") as f:
                got = h5mod._stream_searchsorted(f["ts"], queries, "left")
        finally:
            h5mod._TS_BLOCK = old
        np.testing.assert_array_equal(got, np.searchsorted(vals, queries, "left"))

    def test_no_full_ts_arrays_resident(self, fixture_h5):
        """The dataset object must not hold O(num_events) arrays."""
        ds = EventH5Dataset(fixture_h5, small_config())
        big = {
            k: v.size
            for k, v in ds.__dict__.items()
            if isinstance(v, np.ndarray) and v.size >= ds.num_events // 4
        }
        assert not big, big  # nothing may scale with the event count


class TestAugmentation:
    def test_seed_determinism_and_flip_semantics(self, fixture_h5):
        cfg = small_config(
            augment=AugmentConfig(True, ("Horizontal",), (1.0,)),
        )
        ds = EventH5Dataset(fixture_h5, cfg)
        a = ds.get_window(0, seed=5)
        b = ds.get_window(0, seed=5)
        np.testing.assert_array_equal(a["inp_events"], b["inp_events"])
        # prob=1.0 horizontal flip: x -> W-1-x on the valid region
        plain = EventH5Dataset(fixture_h5, small_config()).get_window(0, seed=5)
        w = ds.layout.inp_resolution[1]
        n = a["inp_len"]
        np.testing.assert_array_equal(
            a["inp_events"][0, :n], w - 1 - plain["inp_events"][0, :n]
        )

    def test_gt_flips_with_same_draw(self, fixture_h5):
        cfg = small_config(augment=AugmentConfig(True, ("Polarity",), (1.0,)))
        ds = EventH5Dataset(fixture_h5, cfg)
        plain = EventH5Dataset(fixture_h5, small_config())
        a, p = ds.get_window(0, seed=5), plain.get_window(0, seed=5)
        n = a["gt_len"]
        np.testing.assert_array_equal(a["gt_events"][3, :n], -p["gt_events"][3, :n])


class TestSequences:
    def test_clip_is_consecutive_windows(self, fixture_h5):
        sq = EventSequenceDataset(fixture_h5, small_config())
        clip = sq.get_clip(1, seed=0)
        assert len(clip) == 4
        ds = sq.dataset
        for k, item in enumerate(clip):
            i0, i1 = ds.event_indices[1 * 2 + k]
            assert item["inp_len"] == i1 - i0

    def test_pause_repeats_with_zero_input(self, fixture_h5):
        cfg = small_config(
            sequence=SequenceConfig(
                4, 2, 2, PauseConfig(True, proba_pause_when_running=1.0, proba_pause_when_paused=1.0)
            )
        )
        sq = EventSequenceDataset(fixture_h5, cfg)
        clip = sq.get_clip(0, seed=0)
        assert clip[0]["inp_len"] > 0
        for item in clip[1:]:
            assert item["inp_len"] == 0  # always paused after the first

    def test_short_file_clamps(self, fixture_h5):
        cfg = small_config(sequence=SequenceConfig(10**6, 2, None))
        sq = EventSequenceDataset(fixture_h5, cfg)
        assert len(sq) == 1 and sq.L == len(sq.dataset)


class TestTimeFrameModesEndToEnd:
    """The reference's `time`/`frame` data modes are dead code upstream
    (scalar-vs-list find_ts_index, SURVEY.md §8.2); here they are fixed —
    prove they work through loader -> jitted train step, not just windowing."""

    def _run_step(self, path, cfg):
        import jax
        import jax.numpy as jnp

        from bmcnet_esr_tpu.models import BMCNetPlain
        from bmcnet_esr_tpu.training.optim import adam_torch
        from bmcnet_esr_tpu.training.train_step import init_train_state, make_train_step

        ld = SequenceLoader([path], cfg, batch_size=2, drop_last=True, num_workers=1)
        batch = next(iter(ld))
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        h, w = ld.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        tx = adam_torch(1e-3)
        step = make_train_step(model, tx, ld.inp_resolution, ld.gt_resolution)
        _, m = step(init_train_state(params, tx), batch)
        return float(m["train_loss"])

    def test_time_mode_trains(self, fixture_h5):
        cfg = small_config(mode="time", window=0.08, sliding_window=0.04,
                           sequence=SequenceConfig(3, 2, 3))
        loss = self._run_step(fixture_h5, cfg)
        assert np.isfinite(loss) and loss > 0

    def test_frame_mode_trains(self, tmp_path):
        from bmcnet_esr_tpu.data.packager import MultiScaleEventPackager

        path = str(tmp_path / "frames.h5")
        rng = np.random.default_rng(0)
        with MultiScaleEventPackager(path) as pk:
            pk.set_sensor_resolution((32, 32))
            for prefix, n in (("ori", 40000), ("down2", 10000)):
                f = 1 if prefix == "ori" else 2
                ts = np.sort(rng.random(n))
                pk.append_events(prefix, rng.integers(0, 32 // f, n),
                                 rng.integers(0, 32 // f, n), ts,
                                 rng.integers(0, 2, n) * 2 - 1)
            for i in range(30):  # frame timestamps spanning the stream
                pk.append_image("ori", rng.integers(0, 255, (32, 32)), i / 29.0)
        cfg = small_config(mode="frame", scale=2, ori_scale="down2",
                           sequence=SequenceConfig(3, 2, 3))
        loss = self._run_step(path, cfg)
        assert np.isfinite(loss) and loss > 0


class TestHotFilter:
    def test_config_round_trip(self):
        cfg = DatasetConfig.from_dict(
            {"scale": 4, "hot_filter": {"enabled": True, "max_px": 7,
                                        "min_obvs": 2, "max_rate": 0.5}}
        )
        hf = cfg.hot_filter
        assert (hf.enabled, hf.max_px, hf.min_obvs, hf.max_rate) == (True, 7, 2, 0.5)
        # absent block -> reference defaults, disabled
        off = DatasetConfig.from_dict({"scale": 4})
        assert not off.hot_filter.enabled and off.hot_filter.max_px == 100

    def test_hot_pixel_events_suppressed(self, fixture_h5):
        """A pixel firing in EVERY window gets masked after min_obvs windows
        and its events zeroed out; quiet pixels are untouched."""
        from bmcnet_esr_tpu.data.h5dataset import HotFilterConfig

        cfg = small_config()
        # max_px must cover the whole sensor here: argsort ties among other
        # frequently-firing fixture pixels can push the injected pixel out of
        # a small top-k (the cap is reference semantics, not a bug)
        cfg.hot_filter = HotFilterConfig(enabled=True, max_px=400, min_obvs=3, max_rate=0.9)
        ds = EventH5Dataset(fixture_h5, cfg)
        h, w = ds.layout.inp_resolution
        hot_x, hot_y = 3, 5

        # inject a hot pixel into every read window
        orig_read = ds._read_events

        def read_with_hot(prefix, i0, i1):
            ev = orig_read(prefix, i0, i1)
            if prefix == ds.layout.inp_prefix:
                n = ev.shape[1] // 8
                ev[0, :n] = hot_x
                ev[1, :n] = hot_y
                ev[3, :n] = 1.0
            return ev

        ds._read_events = read_with_hot
        for i in range(3):  # warm-up below min_obvs: nothing masked yet
            item = ds.get_window(i, seed=0)
            inp = item["inp_events"]
            assert ((inp[0, :] == hot_x) & (inp[1, :] == hot_y) & (inp[3, :] != 0)).any()
        item = ds.get_window(3, seed=0)  # hot_idx=4 > min_obvs: masked now
        inp = item["inp_events"]
        at_hot = (inp[0, :] == hot_x) & (inp[1, :] == hot_y)
        assert at_hot.any() and (inp[3, at_hot] == 0).all()
        # quiet pixels keep their polarity
        assert (inp[3, ~at_hot] != 0).any()

    def test_disabled_filter_is_identity(self, fixture_h5):
        base = EventH5Dataset(fixture_h5, small_config()).get_window(0, seed=9)
        cfg = small_config()
        from bmcnet_esr_tpu.data.h5dataset import HotFilterConfig

        cfg.hot_filter = HotFilterConfig(enabled=False)
        off = EventH5Dataset(fixture_h5, cfg).get_window(0, seed=9)
        np.testing.assert_array_equal(base["inp_events"], off["inp_events"])


class TestLoader:
    def test_batch_shapes_and_order_determinism(self, fixture_h5):
        cfg = small_config()
        ld = SequenceLoader([fixture_h5], cfg, batch_size=2, shuffle=True, num_workers=3, seed=1)
        batches = list(ld)
        assert len(batches) == len(ld)
        b0 = batches[0]
        assert b0["inp_events"].shape == (2, 4, 4, 256)
        assert b0["gt_events"].shape == (2, 4, 4, 4096)
        assert b0["inp_len"].shape == (2, 4)
        ld2 = SequenceLoader([fixture_h5], cfg, batch_size=2, shuffle=True, num_workers=1, seed=1)
        batches2 = list(ld2)
        for a, b in zip(batches, batches2):
            np.testing.assert_array_equal(a["inp_events"], b["inp_events"])

    def test_sharding_partitions_index_space(self, fixture_h5):
        """Multi-host loader sharding (DistributedSampler semantics):
        equal per-shard lengths (wrap-around padding), union covers every
        clip, overlap bounded by the padding, deterministic across epochs."""
        cfg = small_config()
        full = SequenceLoader([fixture_h5], cfg, 1, shuffle=False, num_workers=1)
        n_full = len(full._index)

        for shard_count in (2, 3, 4):
            loaders = [
                SequenceLoader(
                    [fixture_h5], cfg, 1, shuffle=True, num_workers=1, seed=7,
                    shard_index=i, shard_count=shard_count,
                )
                for i in range(shard_count)
            ]
            shards = [ld._shard_indices(epoch=0) for ld in loaders]
            # every host yields the SAME number of batches (no collective
            # desync), padded up by < shard_count
            lengths = {len(s) for s in shards}
            assert len(lengths) == 1
            total = len(shards[0]) * shard_count
            assert n_full <= total < n_full + shard_count
            # union-coverage: every clip index appears on some host
            union = {tuple(ix) for s in shards for ix in s}
            assert union == {tuple(ix) for ix in full._index}
            # deterministic: same epoch -> same shard on every re-iteration
            assert shards[0] == loaders[0]._shard_indices(epoch=0)
            # different epoch reshuffles but keeps the invariants
            e1 = [ld._shard_indices(epoch=1) for ld in loaders]
            assert e1[0] != shards[0]
            assert {tuple(ix) for s in e1 for ix in s} == union

    def test_shard_batch_process_local_assembly(self, fixture_h5):
        """The multi-host batch path assembles the global array from
        process-local data; with one process it must equal the plain sharded
        device_put (same values, same sharding)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bmcnet_esr_tpu.parallel import make_mesh

        mesh = make_mesh(4)
        spec = NamedSharding(mesh, P("data"))
        arr = np.arange(4 * 3 * 2, dtype=np.float32).reshape(4, 3, 2)
        via_local = jax.make_array_from_process_local_data(spec, arr)
        via_put = jax.device_put(arr, spec)
        np.testing.assert_array_equal(np.asarray(via_local), np.asarray(via_put))
        assert via_local.sharding == via_put.sharding


class TestDeviceRasterization:
    def test_batch_counts_match_torch_oracle(self, fixture_h5):
        cfg = small_config()
        ld = SequenceLoader([fixture_h5], cfg, batch_size=2, shuffle=False, num_workers=1)
        batch = next(iter(ld))
        h, w = ld.inp_resolution
        counts = np.asarray(batch_events_to_counts(jnp.asarray(batch["inp_events"]), (h, w)))
        assert counts.shape == (2, 4, h, w, 2)
        # oracle on one window (reference index_put_ semantics with y flip)
        ev = batch["inp_events"][1, 2]
        n = batch["inp_len"][1, 2]
        img = torch.zeros(2, h, w)
        for x, y, t, p in ev[:, :n].T:
            img[0 if p > 0 else 1, h - 1 - int(y), int(x)] += 1
        np.testing.assert_array_equal(counts[1, 2].transpose(2, 0, 1), img.numpy())

    def test_sliding_pairs(self):
        frames = jnp.arange(2 * 5 * 3 * 3 * 1).reshape(2, 5, 3, 3, 1)
        pairs = sliding_pairs(frames, 2)
        assert pairs.shape == (2, 4, 2, 3, 3, 1)
        np.testing.assert_array_equal(np.asarray(pairs[:, 1, 0]), np.asarray(frames[:, 1]))
        np.testing.assert_array_equal(np.asarray(pairs[:, 1, 1]), np.asarray(frames[:, 2]))


def test_abandoned_iterator_releases_workers(fixture_h5):
    """Dropping a loader iterator mid-epoch must not leave producer threads
    blocked on full prefetch queues."""
    import gc
    import threading
    import time as _time

    cfg = small_config()
    ld = SequenceLoader([fixture_h5], cfg, batch_size=1, shuffle=False,
                        num_workers=2, prefetch=1)
    before = threading.active_count()
    it = iter(ld)
    next(it)
    it.close()  # generator close triggers the finally/stop path
    del it
    gc.collect()
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_noise_events_appended(fixture_h5):
    from bmcnet_esr_tpu.data.h5dataset import NoiseConfig

    cfg = small_config(noise=NoiseConfig(enabled=True, noise_level=0.25))
    ds = EventH5Dataset(fixture_h5, cfg)
    assert ds.noise_events == 64  # 25% of the 256-event window
    assert ds.padded_window == 256 + 64
    item = ds.get_window(0, seed=3)
    assert item["inp_len"] == 256 + 64
    noise = item["inp_events"][:, 256:320]
    h, w = ds.layout.inp_resolution
    assert (noise[0] < w).all() and (noise[1] < h).all()
    assert set(np.unique(noise[3])) <= {-1.0, 1.0}
    assert (noise[2] == 1.0).all()  # reference: noise t = 1 (h5dataset.py:630)
