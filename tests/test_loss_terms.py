"""Extensible loss-term system: registry, dotted-path builders, aux
contract, event-consuming terms, and the BASELINE-config-#4 recipe
(recon + LPIPS perceptual) training end-to-end.

The reference ships flow/reconstruction/LPIPS losses but its trainer only
ever builds MSE (``train.py:647-649``); these tests pin that OUR trainer
reaches every family from the ``loss:`` config block or the
``extra_losses=`` constructor argument.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.losses.terms import LossContext
from bmcnet_esr_tpu.models import BMCNetPlain
from bmcnet_esr_tpu.training import Trainer
from bmcnet_esr_tpu.training.config import RunConfig
from bmcnet_esr_tpu.training.losses import adapt_term, build_extra_losses, needs_events
from bmcnet_esr_tpu.training.train_step import sequence_loss

CTX = LossContext(inp_resolution=(16, 16), gt_resolution=(32, 32), scale=2)


def tiny_model():
    return BMCNetPlain(scale=2, n_c=8, n_b=2)


@pytest.fixture(scope="module")
def loader(tmp_path_factory):
    d = tmp_path_factory.mktemp("lossterms")
    p = write_synthetic_fixture(
        str(d / "tr.h5"), (32, 32), ("ori", "down2"),
        {"ori": 30000, "down2": 7500}, seed=0,
    )
    cfg = DatasetConfig(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
    )
    return SequenceLoader(
        [p], cfg, batch_size=2, shuffle=False, drop_last=True, num_workers=1,
        seed=0, compact=False,
    )


@pytest.fixture(scope="module")
def model_and_batch(loader):
    model = tiny_model()
    h, w = loader.inp_resolution
    dummy = jnp.zeros((2, 2, h, w, 2))
    params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()
             if k in ("inp_events", "gt_events")}
    return model, params, batch, (h, w), loader.gt_resolution


class TestRegistry:
    def test_builtin_families_build(self):
        extra = build_extra_losses(
            {
                "l1": 0.1,
                "recon": {"weight": 0.5},
                "temporal_consistency": {"weight": 0.1},
                "total_variation": 0.01,
                "ssim": {"weight": 0.2},
            },
            CTX,
        )
        assert [e[0] for e in extra] == [
            "l1", "recon", "temporal_consistency", "total_variation", "ssim"
        ]
        assert not needs_events(extra)

    def test_flow_family_builds_and_flags_events(self):
        extra = build_extra_losses(
            {"event_warping": {"weight": 1.0}, "brightness_constancy": 1.0}, CTX
        )
        assert needs_events(extra)

    def test_unknown_term_raises(self):
        with pytest.raises(KeyError, match="unknown loss term"):
            build_extra_losses({"nope": 1.0}, CTX)

    def test_dotted_path_builder(self, tmp_path):
        mod_dir = tmp_path / "mods"
        mod_dir.mkdir()
        (mod_dir / "my_loss_pkg.py").write_text(
            "import jax.numpy as jnp\n"
            "def build(cfg, ctx):\n"
            "    scale = cfg.get('scale', 1.0)\n"
            "    def fn(pred, gt, aux):\n"
            "        assert ctx.scale == 2\n"
            "        return scale * jnp.mean(jnp.abs(pred - gt))\n"
            "    return fn\n"
        )
        sys.path.insert(0, str(mod_dir))
        try:
            extra = build_extra_losses(
                {"custom": {"fn": "my_loss_pkg:build", "weight": 2.0, "scale": 3.0}},
                CTX,
            )
        finally:
            sys.path.remove(str(mod_dir))
        name, weight, fn = extra[0]
        assert (name, weight) == ("custom", 2.0)
        v = float(fn(jnp.ones((1, 4, 4, 2)), jnp.zeros((1, 4, 4, 2)), {}))
        assert v == pytest.approx(3.0)

    def test_two_arg_terms_adapted(self):
        fn = adapt_term(lambda p, g: jnp.mean(p - g))
        assert float(fn(jnp.ones(3), jnp.zeros(3), {"step": 0})) == pytest.approx(1.0)


class TestAuxContract:
    def test_terms_see_aux_inside_rollout(self, model_and_batch):
        """aux carries pred/prev_pred/inp/step (losses/terms.py contract)."""
        model, params, batch, inp_res, gt_res = model_and_batch
        seen = {}

        def probe(cfg, ctx):
            def fn(pred, gt, aux):
                seen.update({k: v.shape if hasattr(v, "shape") else v
                             for k, v in aux.items()})
                return jnp.float32(0.0)
            return fn

        sequence_loss(
            model, params, batch, inp_res, gt_res,
            extra_losses=(("probe", 1.0, probe({}, CTX)),),
        )
        h, w = inp_res
        kh, kw = gt_res
        assert seen["pred"] == (2, kh, kw, 2)
        assert seen["prev_pred"] == (2, kh, kw, 2)
        assert seen["inp"] == (2, 2, h, w, 2)
        assert "events" not in seen  # no term asked for them

    def test_event_consuming_term_gets_raw_windows(self, model_and_batch):
        model, params, batch, inp_res, gt_res = model_and_batch

        shapes = {}

        def fn(pred, gt, aux):
            shapes["events"] = aux["events"].shape
            return jnp.mean(jnp.abs(aux["events"][:, 3]))  # polarity magnitude

        fn.needs_events = True
        total, _ = sequence_loss(
            model, params, batch, inp_res, gt_res,
            extra_losses=(("ev", 1.0, fn),),
        )
        assert np.isfinite(float(total))
        assert shapes["events"][:2] == (2, 4)  # [B, 4, N] per step

    def test_event_term_without_raw_batch_raises(self, model_and_batch):
        model, params, batch, inp_res, gt_res = model_and_batch
        compact = dict(batch)
        from bmcnet_esr_tpu.ops.batch import compact_events

        for prefix in ("inp", "gt"):
            xy, p = compact_events(np.asarray(compact.pop(f"{prefix}_events")))
            compact[f"{prefix}_xy"], compact[f"{prefix}_p"] = jnp.asarray(xy), jnp.asarray(p)

        def fn(pred, gt, aux):
            return jnp.float32(0.0)

        fn.needs_events = True
        with pytest.raises(ValueError, match="compact_transfer"):
            sequence_loss(
                model, params, compact, inp_res, gt_res,
                extra_losses=(("ev", 1.0, fn),),
            )

    def test_temporal_consistency_masks_step0(self):
        extra = build_extra_losses({"temporal_consistency": 1.0}, CTX)
        fn = extra[0][2]
        pred = jnp.ones((1, 8, 8, 2))
        prev = jnp.zeros((1, 8, 8, 2))
        aux0 = {"pred": pred, "prev_pred": prev, "step": jnp.int32(0)}
        aux1 = {"pred": pred, "prev_pred": prev, "step": jnp.int32(1)}
        assert float(fn(pred, pred, aux0)) == 0.0
        assert float(fn(pred, pred, aux1)) == pytest.approx(1.0)

    def test_lr_consistency_zero_when_densities_match(self):
        extra = build_extra_losses({"recon": 1.0}, CTX)
        fn = extra[0][2]
        # HR prediction whose 2x2 mean-pool equals the LR input exactly
        lr = jnp.asarray(np.random.default_rng(0).random((1, 4, 4, 2)), jnp.float32)
        hr = jnp.repeat(jnp.repeat(lr, 2, axis=1), 2, axis=2)
        aux = {"inp": jnp.stack([lr, lr], axis=1)}
        assert float(fn(hr, hr, aux)) == pytest.approx(0.0, abs=1e-7)
        aux_off = {"inp": jnp.stack([lr, lr + 0.5], axis=1)}
        assert float(fn(hr, hr, aux_off)) == pytest.approx(0.5, abs=1e-5)


class TestFlowFamilyTerms:
    """The reference's flow/recon losses as trainer terms, for models that
    predict flow (``flow_key``): wiring parity against the direct calls."""

    def _events(self, b=2, n=64, res=(16, 16), seed=0):
        rng = np.random.default_rng(seed)
        ev = np.zeros((b, 4, n), np.float32)
        ev[:, 0] = rng.integers(0, res[1], (b, n))
        ev[:, 1] = rng.integers(0, res[0], (b, n))
        ev[:, 2] = np.sort(rng.random((b, n)), -1)
        ev[:, 3] = rng.integers(0, 2, (b, n)) * 2 - 1
        return jnp.asarray(ev)

    def test_event_warping_matches_direct_call(self):
        from bmcnet_esr_tpu.losses.flow import event_warping_loss
        from bmcnet_esr_tpu.losses.terms import _iwe_event_list

        res = (16, 16)
        ctx = LossContext(res, (32, 32), 2)
        extra = build_extra_losses(
            {"event_warping": {"weight": 1.0, "flow_key": "flow",
                               "flow_regul_weight": 0.001}},
            ctx,
        )
        fn = extra[0][2]
        ev = self._events(res=res)
        flow = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 2, *res)).astype(np.float32) * 0.1
        )
        aux = {"flow": flow, "events": ev}
        got = float(fn(None, None, aux))
        event_list, pol_mask = _iwe_event_list(ev)
        want = float(
            event_warping_loss([flow], event_list, pol_mask, res, 0.001)
        ) / ev.shape[-1]
        assert got == pytest.approx(want, rel=1e-6)
        assert np.isfinite(got) and got > 0

    def test_brightness_constancy_runs(self):
        res = (16, 16)
        ctx = LossContext(res, (32, 32), 2)
        extra = build_extra_losses(
            {"brightness_constancy": {"flow_key": "flow", "img_key": "pred"}}, ctx
        )
        fn = extra[0][2]
        rng = np.random.default_rng(2)
        aux = {
            "flow": jnp.asarray(rng.standard_normal((2, 2, *res)).astype(np.float32) * 0.05),
            "pred": jnp.asarray(rng.random((2, *res, 2)).astype(np.float32)),
            "events": self._events(res=res, seed=3),
        }
        v = float(fn(None, None, aux))
        assert np.isfinite(v) and v >= 0

    def test_missing_flow_source_is_a_clear_error(self):
        extra = build_extra_losses({"event_warping": 1.0}, CTX)  # flow_key: pred
        fn = extra[0][2]
        with pytest.raises(ValueError, match="flow"):
            fn(None, None, {"events": self._events(), "pred": None})


class TestTrainerWiring:
    def _cfg(self, tmp_path, loss_block=None, iters=6):
        cfg = {
            "experiment": "lossterms",
            "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "trainer": {
                "output_path": str(tmp_path), "monitor": "off",
                "tensorboard": False, "data_parallel": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": iters, "save_period": 1000,
                    "train_log_step": 1, "valid_log_step": 1,
                    "valid_step": 1000, "lr_change_rate": 1000,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        if loss_block:
            cfg["loss"] = loss_block
        return cfg

    def test_recon_recipe_trains_and_decreases(self, loader, tmp_path):
        """BASELINE config #4's recon family end-to-end: loss decreases and
        the step compiles exactly once (stable jit signature)."""
        cfg = self._cfg(
            tmp_path,
            {"recon": {"weight": 0.5}, "temporal_consistency": {"weight": 0.1}},
            iters=8,
        )
        tr = Trainer(RunConfig(cfg, runid="rc"), train_loader=loader, seed=0)
        assert [n for n, _, _ in tr.extra_losses] == ["recon", "temporal_consistency"]
        losses = []
        orig = tr.train_step

        def rec(state, batch):
            state, m = orig(state, batch)
            losses.append(float(m["train_loss"]))
            return state, m

        tr.train_step = rec
        tr.train()
        assert all(np.isfinite(v) for v in losses)
        assert losses[-1] < losses[0]
        if hasattr(orig, "_cache_size"):
            assert orig._cache_size() == 1

    def test_extra_losses_kwarg(self, loader, tmp_path):
        """Programmatic terms attach via the constructor (the entry point
        VERDICT r2 found missing); two-arg fns are adapted."""
        calls = []

        def my_term(pred, gt):
            calls.append(1)
            return jnp.mean(jnp.abs(pred - gt))

        cfg = self._cfg(tmp_path, iters=2)
        tr = Trainer(
            RunConfig(cfg, runid="kw"), train_loader=loader, seed=0,
            extra_losses=(("mine", 0.25, my_term),),
        )
        assert tr.extra_losses[0][0] == "mine"
        result = tr.train()
        assert np.isfinite(result["train_loss"])
        assert calls  # traced at least once

    def test_event_term_with_compact_loader_raises(self, tmp_path, tmp_path_factory):
        d = tmp_path_factory.mktemp("compactguard")
        p = write_synthetic_fixture(
            str(d / "c.h5"), (32, 32), ("ori", "down2"),
            {"ori": 30000, "down2": 7500}, seed=1,
        )
        ds = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
        )
        compact_loader = SequenceLoader(
            [p], ds, batch_size=2, drop_last=True, num_workers=1, compact=True
        )
        cfg = self._cfg(tmp_path, {"event_warping": 1.0})
        with pytest.raises(ValueError, match="compact_transfer"):
            Trainer(RunConfig(cfg, runid="cg"), train_loader=compact_loader, seed=0)


class TestLpipsNpzBundle:
    """Torch-free LPIPS weights (VERDICT r2 weak #4): the converter writes
    one .npz; the training term and LPIPS itself load it without torch."""

    @pytest.fixture(scope="class")
    def bundle(self, tmp_path_factory):
        from tools.lpips_fixture_nets import make_alex_features
        from bmcnet_esr_tpu.losses.lpips import LPIPS

        d = tmp_path_factory.mktemp("lpipsnpz")
        torch.manual_seed(0)
        backbone = str(d / "alex_features.pth")
        torch.save(make_alex_features().state_dict(), backbone)
        lin = "/root/reference/loss/PerceptualSimilarity/models/weights/v0.1/alex.pth"
        out = str(d / "lpips_alex.npz")
        from bmcnet_esr_tpu.cli.convert import main as convert_main

        convert_main([
            "--lpips_backbone", backbone, "--lpips_lin", lin,
            "--net", "alex", "--out", out,
        ])
        sd = {k: v.numpy() for k, v in torch.load(
            backbone, map_location="cpu", weights_only=True).items()}
        return out, LPIPS.from_torch(sd, lin, "alex")

    def test_npz_round_trip_is_exact(self, bundle):
        from bmcnet_esr_tpu.losses.lpips import LPIPS

        path, lp_torch = bundle
        lp_npz = LPIPS.from_npz(path)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((1, 3, 64, 64)).astype(np.float32) * 2 - 1)
        y = jnp.asarray(rng.random((1, 3, 64, 64)).astype(np.float32) * 2 - 1)
        np.testing.assert_array_equal(
            np.asarray(lp_torch(x, y)), np.asarray(lp_npz(x, y))
        )

    def test_loss_term_builds_from_npz_without_torch_loading(self, bundle):
        path, lp_torch = bundle
        # hide torch to prove the npz path never imports it
        import builtins

        real_import = builtins.__import__

        def deny_torch(name, *a, **k):
            if name == "torch" or name.startswith("torch."):
                raise AssertionError("npz LPIPS path imported torch")
            return real_import(name, *a, **k)

        builtins.__import__ = deny_torch
        try:
            extra = build_extra_losses(
                {"lpips": {"weight": 0.5, "weights": path}}, CTX
            )
        finally:
            builtins.__import__ = real_import
        name, weight, fn = extra[0]
        assert (name, weight) == ("lpips", 0.5)
        rng = np.random.default_rng(1)
        pred = jnp.asarray(rng.random((1, 64, 64, 2)).astype(np.float32))
        gt = jnp.asarray(rng.random((1, 64, 64, 2)).astype(np.float32))
        assert float(fn(pred, gt, {})) > 0
        assert float(fn(pred, pred, {})) == pytest.approx(0.0, abs=1e-6)

    @pytest.mark.slow
    def test_recon_plus_lpips_recipe_e2e(self, bundle, tmp_path):
        """BASELINE config #4 (recon + LPIPS perceptual) as one jitted
        training step at LPIPS-viable shapes: finite, decreasing."""
        path, _ = bundle
        d = tmp_path / "data"
        d.mkdir()
        p = write_synthetic_fixture(
            str(d / "tr.h5"), (128, 128), ("ori", "down2"),
            {"ori": 60000, "down2": 15000}, seed=0,
        )
        ds = DatasetConfig(
            scale=2, ori_scale="down2", window=256, sliding_window=128,
            sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
        )
        loader = SequenceLoader(
            [p], ds, batch_size=1, drop_last=True, num_workers=1, seed=0
        )
        cfg = {
            "experiment": "percep",
            "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "loss": {
                "recon": {"weight": 0.5},
                "lpips": {"weight": 1.0, "weights": path},
            },
            "trainer": {
                "output_path": str(tmp_path), "monitor": "off",
                "tensorboard": False, "data_parallel": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": 4, "save_period": 1000,
                    "train_log_step": 1, "valid_log_step": 1,
                    "valid_step": 1000, "lr_change_rate": 1000,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        tr = Trainer(RunConfig(cfg, runid="pe"), train_loader=loader, seed=0)
        assert [n for n, _, _ in tr.extra_losses] == ["recon", "lpips"]
        losses = []
        orig = tr.train_step

        def rec(state, batch):
            state, m = orig(state, batch)
            losses.append(float(m["train_loss"]))
            return state, m

        tr.train_step = rec
        tr.train()
        assert all(np.isfinite(v) for v in losses)
        assert losses[-1] < losses[0]


class TestPaddedWindowTimestamps:
    """Zero-padded event windows: timestamp normalization must anchor on the
    last VALID event (aux['events_len']), or every REAL event in a padded
    window gets a corrupted normalized time (round-3 review finding)."""

    def _padded_events(self, b=2, n_valid=40, n=64, seed=3):
        rng = np.random.default_rng(seed)
        ev = np.zeros((b, 4, n), np.float32)
        ev[:, 0, :n_valid] = rng.integers(0, 16, (b, n_valid))
        ev[:, 1, :n_valid] = rng.integers(0, 16, (b, n_valid))
        # t0 > 0: exactly the case where the ts[-1]==0 pad poisons the
        # denominator (t_last - t0 + eps < 0)
        ev[:, 2, :n_valid] = np.sort(
            rng.uniform(5.0, 9.0, (b, n_valid)).astype(np.float32), axis=-1
        )
        ev[:, 3, :n_valid] = rng.choice([-1.0, 1.0], (b, n_valid))
        return jnp.asarray(ev), n_valid

    def test_n_valid_anchors_normalization(self):
        from bmcnet_esr_tpu.losses.terms import _iwe_event_list

        ev, n_valid = self._padded_events()
        lens = jnp.full((ev.shape[0],), n_valid, jnp.int32)
        fixed, _ = _iwe_event_list(ev, lens)
        ts_fixed = np.asarray(fixed[..., 0])[:, :n_valid]
        # real events normalized into [0, 1], last valid event at ~1
        assert ts_fixed.min() >= 0.0 and ts_fixed.max() <= 1.0 + 1e-5
        np.testing.assert_allclose(ts_fixed[:, -1], 1.0, atol=1e-3)
        # ...whereas without n_valid the pad poisons every real timestamp
        broken, _ = _iwe_event_list(ev)
        ts_broken = np.asarray(broken[..., 0])[:, 1:n_valid]
        assert (ts_broken <= 0.0).all()  # negative denominator

    def test_events_len_reaches_terms_through_sequence_loss(self, loader):
        model = tiny_model()
        h, w = loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
        assert "inp_len" in batch  # the loader ships valid counts

        seen = {}

        def fn(pred, gt, aux):
            seen["len_shape"] = aux["events_len"].shape
            return jnp.float32(0.0)

        fn.needs_events = True
        total, _ = sequence_loss(
            model, params, batch, (h, w), loader.gt_resolution,
            extra_losses=(("ev", 1.0, fn),),
        )
        assert np.isfinite(float(total))
        assert seen["len_shape"] == (2,)  # [B] per step


class TestLrConsistencyWindowIndex:
    def test_reads_gt_aligned_window_for_seqn3(self):
        """The GT aligns to pair index 1; lr_consistency must pool against
        THAT window, not the last one (identical for seqn==2, wrong for
        seqn>2 — round-3 review finding)."""
        from bmcnet_esr_tpu.losses.terms import lr_consistency

        fn = lr_consistency({"norm": "l1"}, CTX)
        rng = np.random.default_rng(5)
        b, h, w, c, scale = 2, 4, 4, 2, 2
        inp = jnp.asarray(rng.uniform(0, 4, (b, 3, h, w, c)).astype(np.float32))
        # prediction that pools exactly to window INDEX 1
        pred = jnp.repeat(jnp.repeat(inp[:, 1], scale, axis=1), scale, axis=2)
        aux = {"inp": inp}
        assert float(fn(pred, None, aux)) == pytest.approx(0.0, abs=1e-6)
        # and NOT to the last window
        pred_last = jnp.repeat(jnp.repeat(inp[:, -1], scale, axis=1), scale, axis=2)
        assert float(fn(pred_last, None, aux)) > 1e-3
