"""Inference engine + visualization tests."""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data import DatasetConfig
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.inference import InferenceEngine, load_model_for_inference
from bmcnet_esr_tpu.models import BMCNetPlain
from bmcnet_esr_tpu.vis import render_event_count
from bmcnet_esr_tpu.vis.events import EventVisualizer


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("infer") / "f.h5")
    write_synthetic_fixture(
        path, (32, 32), ("ori", "down2"), {"ori": 40000, "down2": 10000}, seed=5
    )
    return path


def make_engine(chunk_size=8, visualize=False, **kw):
    model = BMCNetPlain(scale=2, n_c=8, n_b=2)
    h = w = 16
    dummy = jnp.zeros((1, 2, h, w, 2))
    variables = model.init(jax.random.key(1), dummy, *model.init_state(1, h, w))
    cfg = DatasetConfig(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        sequence=SequenceConfig(4, 2, 1),
    )
    return InferenceEngine(
        model, variables, cfg, chunk_size=chunk_size, visualize=visualize, **kw
    )


class TestEngine:
    @pytest.mark.slow
    def test_bf16_serving_mode_tracks_fp32(self, fixture_h5):
        """The --dtype bfloat16 serving path produces metrics within the
        documented drift bound of fp32 (docs/DESIGN.md §4)."""
        model = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16)
        h = w = 16
        dummy = jnp.zeros((1, 2, h, w, 2))
        variables = model.init(jax.random.key(1), dummy, *model.init_state(1, h, w))
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(4, 2, 1),
        )
        eng16 = InferenceEngine(model, variables, cfg, chunk_size=8, visualize=False)
        res16 = eng16.infer_file(fixture_h5, output_dir=None)
        res32 = make_engine().infer_file(fixture_h5, output_dir=None)
        assert np.isfinite(res16["esr_mse"])
        assert res16["esr_mse"] == pytest.approx(res32["esr_mse"], rel=5e-2)
        # bicubic baseline is computed from fp32 count images either way
        assert res16["bicubic_mse"] == pytest.approx(res32["bicubic_mse"], rel=1e-3)

    def test_int8_serving_mode_calibrates_and_tracks_fp32(self, fixture_h5):
        """--dtype int8: the engine calibrates static activation scales on
        the first chunk (variables gain a 'quant' collection) and the
        metrics stay within the serving drift bound of fp32."""
        model = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16, quant=True)
        h = w = 16
        dummy = jnp.zeros((1, 2, h, w, 2))
        variables = model.init(jax.random.key(1), dummy, *model.init_state(1, h, w))
        assert set(variables) == {"params"}  # init sows nothing
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(4, 2, 1),
        )
        engq = InferenceEngine(model, variables, cfg, chunk_size=8, visualize=False)
        resq = engq.infer_file(fixture_h5, output_dir=None)
        assert "quant" in engq.variables  # calibration happened exactly once
        scales = jax.tree.leaves(engq.variables["quant"])
        assert scales and all(np.asarray(s).min() > 0 for s in scales)
        res32 = make_engine().infer_file(fixture_h5, output_dir=None)
        assert np.isfinite(resq["esr_mse"])
        assert resq["esr_mse"] == pytest.approx(res32["esr_mse"], rel=5e-2)

    def test_metrics_finite_and_macs_populated(self, fixture_h5, tmp_path):
        eng = make_engine()
        res = eng.infer_file(fixture_h5, output_dir=None)
        for key in ("esr_mse", "bicubic_mse", "time", "params", "macs"):
            assert key in res and np.isfinite(res[key]), (key, res)
        assert res["macs"] > 0  # populated from XLA cost analysis
        assert res["params"] == pytest.approx(
            sum(int(np.prod(p.shape)) for p in jax.tree.leaves(eng.variables)) / 1e6
        )

    def test_chunking_invariant(self, fixture_h5):
        """The recurrent carry must thread identically across chunk sizes."""
        r_small = make_engine(chunk_size=3).infer_file(fixture_h5)
        r_large = make_engine(chunk_size=64).infer_file(fixture_h5)
        assert r_small["esr_mse"] == pytest.approx(r_large["esr_mse"], rel=1e-5)
        assert r_small["bicubic_mse"] == pytest.approx(r_large["bicubic_mse"], rel=1e-5)

    @pytest.mark.slow
    def test_h2d_overlap_bit_identical(self, fixture_h5):
        """The pipelined next-chunk upload (h2d_overlap, the default) must not
        change a single metric vs the serial placement path — the knob only
        moves the device_put enqueue relative to the running scan."""
        plain = make_engine(chunk_size=3, h2d_overlap=False).infer_file(fixture_h5)
        pipelined = make_engine(chunk_size=3, h2d_overlap=True).infer_file(fixture_h5)
        assert plain["esr_mse"] == pipelined["esr_mse"]
        assert plain["bicubic_mse"] == pipelined["bicubic_mse"]
        b_plain = make_engine(chunk_size=3, h2d_overlap=False).infer_file_batch(
            [fixture_h5, fixture_h5]
        )
        b_pipe = make_engine(chunk_size=3, h2d_overlap=True).infer_file_batch(
            [fixture_h5, fixture_h5]
        )
        for a, b in zip(b_plain, b_pipe):
            assert a["esr_mse"] == b["esr_mse"]
        # observability: overlaps the done() gate skipped are surfaced in
        # results (pipelined runs only — the knob off means nothing skipped)
        assert pipelined["h2d_overlap_skips"] >= 0
        assert "h2d_overlap_skips" not in plain
        for b in b_pipe:
            assert b["h2d_overlap_skips"] >= 0

    def test_datalist_outputs(self, fixture_h5, tmp_path):
        eng = make_engine(visualize=True)
        out = eng.infer_datalist([fixture_h5], str(tmp_path / "out"), "test-model")
        assert "esr_mse" in out["mean"]
        name = os.path.basename(fixture_h5)
        root = tmp_path / "out" / name
        with open(root / "inference.yml") as f:
            per_file = yaml.safe_load(f)
        assert "evaluation results" in per_file
        with open(tmp_path / "out" / "inference_all.yml") as f:
            agg = yaml.safe_load(f)
        assert "mean results for the whole data" in agg
        # 4 PNG streams present
        for stream in ("lr_event_img", "hr_esr_event_img", "hr_bicubic_event_img", "hr_gt_event_img"):
            files = os.listdir(root / "event_img" / stream)
            assert files and files[0].endswith(".png")

    def test_time_metric_excludes_compilation(self, fixture_h5):
        """The first chunk's per-window ms must not include jit compilation
        (round-1 VERDICT "what's weak" #1): a cold engine's ``time`` should be
        within noise of a warmed engine's, not ~1000x it."""
        eng = make_engine(chunk_size=3)
        cold = eng.infer_file(fixture_h5)  # AOT compile happens untimed
        warm = eng.infer_file(fixture_h5)  # same compiled executables
        assert cold["time"] < 5.0 * warm["time"], (cold["time"], warm["time"])
        # the compiled executable is cached per shape key (not the bare jit)
        assert any(k[0] == "aot" for k in eng._step_cache if isinstance(k, tuple))

    def test_load_model_from_npz_fixture(self):
        path = os.path.join(os.path.dirname(__file__), "goldens", "plain_nfs_x4_ckpt.npz")
        model, variables = load_model_for_inference(path, 4, variant="plain")
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
        assert n == 1_003_296


def reference_plot_event_cnt_oracle(event_cnt, color_scheme="blue_red"):
    """Literal (loop-free but branch-by-branch) transcription of the
    reference algorithm (matplotlib_plot_events.py:125-248) as a test
    oracle, producing RGB."""
    pos = event_cnt[:, :, 0].astype(np.float64).copy()
    neg = event_cnt[:, :, 1].astype(np.float64).copy()
    pos_max, pos_min = np.percentile(pos, 99), np.percentile(pos, 1)
    neg_max, neg_min = np.percentile(neg, 99), np.percentile(neg, 1)
    m = max(pos_max, neg_max)
    if pos_min != m:
        pos = (pos - pos_min) / (m - pos_min)
    if neg_min != m:
        neg = (neg - neg_min) / (m - neg_min)
    pos, neg = np.clip(pos, 0, 1), np.clip(neg, 0, 1)
    img = np.ones(pos.shape + (3,))
    mask_pos, mask_neg = pos > 0, neg > 0
    only_pos = mask_pos & ~mask_neg
    only_neg = mask_neg & ~mask_pos
    both_pos = mask_pos & mask_neg & (pos >= neg)
    both_neg = mask_pos & mask_neg & (pos < neg)
    # BGR assignments as in the reference blue_red branch
    for m_, v in ((only_pos, pos), (both_pos, pos)):
        img[:, :, 0][m_] = 1
        img[:, :, 1][m_] = 1 - v[m_]
        img[:, :, 2][m_] = 1 - v[m_]
    for m_, v in ((only_neg, neg), (both_neg, neg)):
        img[:, :, 2][m_] = 1
        img[:, :, 0][m_] = 1 - v[m_]
        img[:, :, 1][m_] = 1 - v[m_]
    img = (img * 255).astype(np.uint8)
    return img[:, :, ::-1]  # BGR -> RGB


class TestVis:
    def test_blue_red_matches_reference_oracle(self):
        rng = np.random.default_rng(0)
        cnt = rng.integers(0, 5, (24, 32, 2)).astype(np.float32)
        want = reference_plot_event_cnt_oracle(cnt)
        got = render_event_count(cnt, "blue_red")
        np.testing.assert_array_equal(got, want)

    def test_gray_scheme_range(self):
        cnt = np.zeros((8, 8, 2), np.float32)
        cnt[2, 2, 0] = 4  # positive spike -> bright
        cnt[5, 5, 1] = 4  # negative spike -> dark
        img = render_event_count(cnt, "gray")
        assert img[2, 2, 0] > 127 >= img[5, 5, 0]

    def test_save_writes_png(self, tmp_path):
        vis = EventVisualizer()
        cnt = np.random.default_rng(0).integers(0, 3, (16, 16, 2)).astype(np.float32)
        out = str(tmp_path / "x.png")
        vis.plot_event_cnt(cnt, is_save=True, path=out)
        assert os.path.exists(out)

    def test_ply_export(self, tmp_path):
        ev = np.array([[1, 2, 0.1, 1], [3, 4, 0.9, -1], [0, 0, 0.5, 0]], np.float32)
        path = str(tmp_path / "c.ply")
        EventVisualizer.export_ply(ev, path)
        lines = open(path).read().splitlines()
        assert lines[0] == "ply" and "element vertex 2" in "\n".join(lines[:5])


class TestExtraMetrics:
    def test_psnr_ssim_tracked(self, fixture_h5):
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        h = w = 16
        dummy = jnp.zeros((1, 2, h, w, 2))
        variables = model.init(jax.random.key(1), dummy, *model.init_state(1, h, w))
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(4, 2, 1),
        )
        eng = InferenceEngine(
            model, variables, cfg, chunk_size=8, visualize=False,
            extra_metrics=("psnr", "ssim"),
        )
        res = eng.infer_file(fixture_h5)
        assert np.isfinite(res["esr_psnr"])
        assert -1.0 <= res["esr_ssim"] <= 1.0


class TestBatchedStreams:
    @pytest.fixture(scope="class")
    def three_files(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("batch")
        paths = []
        for i, n in enumerate((40000, 28000, 16000)):  # different lengths
            p = str(d / f"f{i}.h5")
            write_synthetic_fixture(
                p, (32, 32), ("ori", "down2"), {"ori": n, "down2": n // 4}, seed=10 + i
            )
            paths.append(p)
        return paths

    def test_batch_equals_per_file(self, three_files):
        """Each stream of the batched rollout must reproduce its own solo
        rollout (incl. the masked tails of shorter files)."""
        eng = make_engine(chunk_size=8)
        solo = [eng.infer_file(p) for p in three_files]
        batched = eng.infer_file_batch(three_files)
        for s, b in zip(solo, batched):
            assert b["esr_mse"] == pytest.approx(s["esr_mse"], rel=1e-5)
            assert b["bicubic_mse"] == pytest.approx(s["bicubic_mse"], rel=1e-5)
            assert b["macs"] == pytest.approx(s["macs"], rel=1e-6)

    @pytest.mark.slow
    def test_int8_batch_equals_per_file(self, three_files):
        """int8 batched tracks solo tightly: activation scales are per-lane
        and re-derived per file/group from each stream's own first chunk, so
        the batched rollout quantizes stream i exactly as its solo run does.
        Per-lane PREDICTIONS are bit-exact (TestInt8LaneIndependence, bundle
        tests); the scalar MSE metric reduces over [B,...] vs [1,...] arrays
        whose fp32 summation order differs, hence ~1e-9 relative wobble —
        same reason the fp32 test above uses rel=1e-5."""
        def engine():
            model = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16, quant=True)
            h = w = 16
            dummy = jnp.zeros((1, 2, h, w, 2))
            variables = model.init(
                jax.random.key(2), dummy, *model.init_state(1, h, w)
            )
            cfg = DatasetConfig(
                scale=2, ori_scale="down2", window=128, sliding_window=64,
                sequence=SequenceConfig(4, 2, 1),
            )
            return InferenceEngine(model, variables, cfg, chunk_size=8, visualize=False)

        solo = [engine().infer_file(p) for p in three_files]
        batched = engine().infer_file_batch(three_files)
        for s, b in zip(solo, batched):
            assert b["esr_mse"] == pytest.approx(s["esr_mse"], rel=1e-7)
            assert b["bicubic_mse"] == pytest.approx(s["bicubic_mse"], rel=1e-6)

    def test_datalist_batched_mode(self, three_files, tmp_path):
        eng = make_engine(chunk_size=8)
        out = eng.infer_datalist(
            three_files, str(tmp_path / "out"), "m", batch_streams=8
        )
        ref = eng.infer_datalist(three_files, str(tmp_path / "ref"), "m")
        for k in ("esr_mse", "bicubic_mse"):
            assert out["mean"][k] == pytest.approx(ref["mean"][k], rel=1e-5)
        # per-file YAMLs written in batched mode too
        for p in three_files:
            assert os.path.exists(
                tmp_path / "out" / os.path.basename(p) / "inference.yml"
            )

    def test_resolution_mismatch_rejected(self, three_files, tmp_path):
        p_small = str(tmp_path / "small.h5")
        write_synthetic_fixture(
            p_small, (16, 16), ("ori", "down2"), {"ori": 8000, "down2": 2000}, seed=3
        )
        eng = make_engine()
        with pytest.raises(ValueError, match="equal resolutions"):
            eng.infer_file_batch([three_files[0], p_small])


def test_load_converted_flat_npz(tmp_path):
    """cli/convert --npz output loads back through load_model_for_inference."""
    from bmcnet_esr_tpu.cli.convert import main as convert_main

    out = str(tmp_path / "conv.npz")
    convert_main([
        "--pth", "/root/reference/pretrain/BMCNet_plain_nfs_x4.pth",
        "--variant", "plain", "--scale", "4", "--out", out, "--npz",
    ])
    model, variables = load_model_for_inference(out, 4, variant="plain")
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    assert n == 1_003_296


def test_convert_cli_export_round_trip(tmp_path):
    """cli/convert --from_ckpt writes a reference-layout .pth that equals the
    original released checkpoint bit-for-bit (import -> export identity)."""
    import torch

    from bmcnet_esr_tpu.cli.convert import main as convert_main

    npz = str(tmp_path / "conv.npz")
    convert_main([
        "--pth", "/root/reference/pretrain/BMCNet_plain_nfs_x4.pth",
        "--variant", "plain", "--scale", "4", "--out", npz, "--npz",
    ])
    pth = str(tmp_path / "exported.pth")
    convert_main([
        "--from_ckpt", npz, "--variant", "plain", "--scale", "4",
        "--n_b", "5", "--out", pth,
    ])
    orig = torch.load(
        "/root/reference/pretrain/BMCNet_plain_nfs_x4.pth",
        map_location="cpu", weights_only=True,
    )
    back = torch.load(pth, map_location="cpu", weights_only=True)
    assert sorted(back) == sorted(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k].numpy(), orig[k].numpy(), err_msg=k)


class TestStreaming:
    def test_streaming_matches_batch_engine(self, fixture_h5):
        """Online pushes must reproduce the batch engine's rollout exactly."""
        from bmcnet_esr_tpu.data import EventH5Dataset
        from bmcnet_esr_tpu.inference.streaming import StreamingSR

        eng = make_engine(chunk_size=64)
        batch_res = eng.infer_file(fixture_h5)

        ds = EventH5Dataset(fixture_h5, eng.config)
        stream = StreamingSR(
            eng.model, eng.variables, ds.layout.inp_resolution, window_size=128
        )
        mses = []
        gts = []
        for w in range(len(ds)):
            item = ds.get_window(w)
            pred = stream.push(item["inp_events"][:, : item["inp_len"]])
            if pred is not None:
                gt = np.asarray(
                    jnp.moveaxis(
                        __import__("bmcnet_esr_tpu.ops.batch", fromlist=["batch_events_to_counts"])
                        .batch_events_to_counts(jnp.asarray(item["gt_events"])[None],
                                                tuple(ds.layout.gt_resolution))[0],
                        -1, -1,
                    )
                )
                mses.append(float(np.mean((pred - gt) ** 2)))
        assert len(mses) == len(ds) - 1
        assert np.mean(mses) == pytest.approx(batch_res["esr_mse"], rel=1e-4)

    def test_reset_and_oversize_guard(self, fixture_h5):
        from bmcnet_esr_tpu.inference.streaming import StreamingSR

        eng = make_engine()
        stream = StreamingSR(eng.model, eng.variables, (16, 16), window_size=32)
        ev = np.zeros((4, 8), np.float32)
        assert stream.push(ev) is None
        assert stream.push(ev) is not None
        stream.reset()
        assert stream.push(ev) is None  # state cleared
        with pytest.raises(ValueError, match="exceeds window_size"):
            stream.push(np.zeros((4, 64), np.float32))


@pytest.mark.slow
def test_real_world_eventzoom_path(tmp_path):
    """EventZoom real-capture mode: down8_real input, no GT events
    (reference h5dataset.py:45-60 + infer --real_world_test)."""
    from bmcnet_esr_tpu.data.packager import write_synthetic_fixture

    path = str(tmp_path / "ez.h5")
    write_synthetic_fixture(
        path, (992, 1776), ("down8_real",), {"down8_real": 12000}, seed=6
    )
    model = BMCNetPlain(scale=4, n_c=8, n_b=2)
    h, w = 124, 222
    dummy = jnp.zeros((1, 2, h, w, 2))
    variables = model.init(jax.random.key(1), dummy, *model.init_state(1, h, w))
    cfg = DatasetConfig(
        scale=4, ori_scale="down8", window=256, sliding_window=128,
        need_gt_events=False, real_world_test=True,
        sequence=SequenceConfig(4, 2, 1),
    )
    eng = InferenceEngine(model, variables, cfg, chunk_size=8, visualize=False)
    res = eng.infer_file(path)
    assert np.isfinite(res["esr_mse"])  # vs zero GT (no GT exists for real data)

    # the hot_filter config block composes with the real-world path end to end
    from bmcnet_esr_tpu.data.h5dataset import HotFilterConfig

    cfg_hot = DatasetConfig(
        scale=4, ori_scale="down8", window=256, sliding_window=128,
        need_gt_events=False, real_world_test=True,
        hot_filter=HotFilterConfig(enabled=True, max_px=50, min_obvs=2, max_rate=0.95),
        sequence=SequenceConfig(4, 2, 1),
    )
    eng_hot = InferenceEngine(model, variables, cfg_hot, chunk_size=8, visualize=False)
    res_hot = eng_hot.infer_file(path)
    assert np.isfinite(res_hot["esr_mse"])


class TestR5EngineFixes:
    """Regressions for the round-5 engine/dataset review findings."""

    def test_extra_metric_order_does_not_swap_values(self, fixture_h5):
        """The scan body used to stack extras in fixed (psnr, ssim) order
        while the readout mapped columns to the USER'S tuple order —
        extra_metrics=("ssim", "psnr") silently swapped the two."""
        a = make_engine(extra_metrics=("psnr", "ssim")).infer_file(fixture_h5)
        b = make_engine(extra_metrics=("ssim", "psnr")).infer_file(fixture_h5)
        assert a["esr_psnr"] == pytest.approx(b["esr_psnr"], rel=1e-6)
        assert a["esr_ssim"] == pytest.approx(b["esr_ssim"], rel=1e-6)
        # the two metrics genuinely differ, so a swap cannot hide
        assert abs(a["esr_psnr"] - a["esr_ssim"]) > 1e-3
        with pytest.raises(ValueError, match="extra_metrics"):
            make_engine(extra_metrics=("psnr", "nope"))

    def test_batch_rejects_gt_resolution_mismatch(self, tmp_path):
        """Sensor heights 64 vs 66 at down8/x4 round to the SAME input
        resolution but different GT resolutions — rasterizing stream 2's
        GT at stream 1's shape would silently zero its boundary rows."""
        pa, pb = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
        write_synthetic_fixture(
            pa, (64, 64), ("down2", "down8"), {"down2": 8000, "down8": 2000},
            seed=1,
        )
        write_synthetic_fixture(
            pb, (66, 64), ("down2", "down8"), {"down2": 8000, "down8": 2000},
            seed=2,
        )
        model = BMCNetPlain(scale=4, n_c=8, n_b=2)
        dummy = jnp.zeros((1, 2, 8, 8, 2))
        variables = model.init(
            jax.random.key(0), dummy, *model.init_state(1, 8, 8)
        )
        cfg = DatasetConfig(
            scale=4, ori_scale="down8", window=128, sliding_window=64,
            sequence=SequenceConfig(4, 2, 1),
        )
        eng = InferenceEngine(model, variables, cfg, chunk_size=4,
                              visualize=False)
        with pytest.raises(ValueError, match="equal resolutions"):
            eng.infer_file_batch([pa, pb])

    def test_mesh_tail_group_runs_unsharded(self, fixture_h5, tmp_path):
        """A stream batch that does not divide the mesh (a datalist's last
        partial group) must run unsharded with identical results, not
        abort the run after most of the work completed."""
        from bmcnet_esr_tpu.parallel import make_mesh

        p2 = str(tmp_path / "second.h5")
        write_synthetic_fixture(
            p2, (32, 32), ("ori", "down2"), {"ori": 30000, "down2": 7500},
            seed=9,
        )
        solo = make_engine().infer_file_batch([fixture_h5, p2])
        meshed = make_engine(mesh=make_mesh(8)).infer_file_batch(
            [fixture_h5, p2]  # 2 streams, 8-device mesh: tail-group shape
        )
        for s, m in zip(solo, meshed):
            assert m["esr_mse"] == pytest.approx(s["esr_mse"], rel=1e-5)

    def test_inference_forces_augment_off(self):
        from bmcnet_esr_tpu.data.h5dataset import AugmentConfig

        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            augment=AugmentConfig(enabled=True),
            sequence=SequenceConfig(4, 2, 1),
        )
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        dummy = jnp.zeros((1, 2, 16, 16, 2))
        variables = model.init(
            jax.random.key(1), dummy, *model.init_state(1, 16, 16)
        )
        eng = InferenceEngine(model, variables, cfg, visualize=False)
        # stochastic per-window flips would desync stride-1 window pairs
        assert eng.config.augment.enabled is False

    def test_gt_available_flag(self, fixture_h5):
        res = make_engine().infer_file(fixture_h5)
        assert res["gt_available"] is True
