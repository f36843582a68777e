"""Training engine tests: optimizer parity vs torch, schedule floor,
BPTT train step learning, checkpoint round-trip, trainer loop smoke."""

import math
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.losses import mse_loss, psnr, ssim
from bmcnet_esr_tpu.models import BMCNetPlain
from bmcnet_esr_tpu.training import (
    Trainer,
    build_optimizer,
    exponential_decay_with_floor,
    make_eval_step,
    make_train_step,
)
from bmcnet_esr_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from bmcnet_esr_tpu.training.config import RunConfig, set_by_path
from bmcnet_esr_tpu.training.train_step import init_train_state, sequence_loss


class TestOptimParity:
    def test_adam_amsgrad_weight_decay_matches_torch(self):
        rng = np.random.default_rng(0)
        w0 = rng.standard_normal((5, 3)).astype(np.float32)
        tgt = rng.standard_normal((5, 3)).astype(np.float32)

        # torch oracle
        wt = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=1e-2, amsgrad=True)
        for _ in range(10):
            opt.zero_grad()
            ((wt - torch.tensor(tgt)) ** 2).mean().backward()
            opt.step()

        # ours
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-2, weight_decay=1e-2, amsgrad=True)
        params = jnp.asarray(w0)
        opt_state = tx.init(params)
        loss = lambda p: jnp.mean((p - jnp.asarray(tgt)) ** 2)
        for _ in range(10):
            g = jax.grad(loss)(params)
            upd, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, upd)

        np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(), atol=1e-6)

    def test_schedule_floor(self):
        sched = exponential_decay_with_floor(1e-4, gamma=0.95, step_every=4000, floor=1e-5)
        assert float(sched(0)) == pytest.approx(1e-4)
        assert float(sched(4000)) == pytest.approx(1e-4 * 0.95)
        # decays exactly once past the floor, then saturates (train.py:291-294)
        late = float(sched(10_000_000))
        assert late == pytest.approx(1e-4 * 0.95**45)
        assert late < 1e-5 <= late / 0.95

    def test_build_from_reference_yaml_blocks(self):
        tx, sched = build_optimizer(
            {"name": "Adam", "args": {"lr": 1e-4, "weight_decay": 1e-5, "amsgrad": True}},
            {"name": "ExponentialLR", "args": {"gamma": 0.95}},
            {"lr_change_rate": 4000},
        )
        assert float(sched(8000)) == pytest.approx(1e-4 * 0.95**2)

    def test_unknown_optimizer_raises(self):
        with pytest.raises(KeyError, match="registry"):
            build_optimizer({"name": "Eval"}, {}, {})


class TestLosses:
    def test_psnr_formula(self):
        a = jnp.zeros((4, 4))
        b = jnp.ones((4, 4)) * 0.1
        got = float(psnr(a, b, 1.0))
        assert got == pytest.approx(10 * math.log10(1.0 / 0.01), rel=1e-5)

    def test_ssim_identity_and_range(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((16, 16)), jnp.float32)
        assert float(ssim(x, x, 1.0)) == pytest.approx(1.0, abs=1e-5)
        y = jnp.asarray(rng.random((16, 16)), jnp.float32)
        v = float(ssim(x, y, 1.0))
        assert -1.0 <= v < 1.0


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    d = tmp_path_factory.mktemp("train")
    tr = write_synthetic_fixture(
        str(d / "tr.h5"), (32, 32), ("ori", "down2"),
        {"ori": 30000, "down2": 7500}, seed=0,
    )
    va = write_synthetic_fixture(
        str(d / "va.h5"), (32, 32), ("ori", "down2"),
        {"ori": 30000, "down2": 7500}, seed=1,
    )
    cfg = DatasetConfig(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
    )
    mk = lambda p, sh: SequenceLoader([p], cfg, batch_size=2, shuffle=sh, drop_last=True, num_workers=1, seed=0)
    return mk(tr, True), mk(va, False)


def tiny_model():
    return BMCNetPlain(scale=2, n_c=8, n_b=2)


class TestTrainStep:
    def test_loss_decreases(self, loaders):
        train_loader, _ = loaders
        model = tiny_model()
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        state = init_train_state(params, tx)
        step = make_train_step(model, tx, train_loader.inp_resolution, train_loader.gt_resolution)

        losses = []
        for epoch in range(6):
            for batch in train_loader:
                state, m = step(state, batch)
                losses.append(float(m["train_loss"]))
        assert losses[-1] < losses[0] * 0.9, losses[::7]
        assert int(state.step) == len(losses)

    def test_bf16_training_converges(self, loaders):
        """The bf16 deviation knob (model.args.dtype: bfloat16) must train:
        loss finite and decreasing (measured 6.5 it/s vs 3.8 fp32 on-chip)."""
        train_loader, _ = loaders
        model = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16)
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        state = init_train_state(params, tx)
        step = make_train_step(model, tx, train_loader.inp_resolution, train_loader.gt_resolution)
        losses = []
        for epoch in range(4):
            for batch in train_loader:
                state, m = step(state, batch)
                losses.append(float(m["train_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # params stay fp32 (master weights); only activations are bf16
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))

    def test_remat_matches_no_remat(self, loaders):
        train_loader, _ = loaders
        model = tiny_model()
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        batch = next(iter(train_loader))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        a, _ = sequence_loss(model, params, batch, (h, w), train_loader.gt_resolution, use_remat=True)
        b, _ = sequence_loss(model, params, batch, (h, w), train_loader.gt_resolution, use_remat=False)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_compact_transfer_matches_raw(self, loaders):
        """SequenceLoader(compact=True) ships int16 xy + int8 p (no ts); the
        train step must produce the IDENTICAL update (the count path never
        reads timestamps)."""
        train_loader, _ = loaders
        from bmcnet_esr_tpu.data import SequenceLoader as SL
        from bmcnet_esr_tpu.training.optim import adam_torch

        compact_loader = SL(
            train_loader.datasets and [ds.dataset.path for ds in train_loader.datasets],
            train_loader.config, batch_size=2, shuffle=True, drop_last=True,
            num_workers=1, seed=0, compact=True,
        )
        raw = next(iter(SL(
            [ds.dataset.path for ds in train_loader.datasets],
            train_loader.config, batch_size=2, shuffle=True, drop_last=True,
            num_workers=1, seed=0,
        )))
        comp = next(iter(compact_loader))
        assert comp["inp_xy"].dtype == np.int16 and comp["inp_p"].dtype == np.int8
        assert "inp_events" not in comp
        # ~69% fewer event bytes on the wire
        raw_bytes = raw["inp_events"].nbytes + raw["gt_events"].nbytes
        comp_bytes = sum(comp[k].nbytes for k in ("inp_xy", "inp_p", "gt_xy", "gt_p"))
        assert comp_bytes < 0.35 * raw_bytes

        model = tiny_model()
        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        step = make_train_step(
            model, tx, train_loader.inp_resolution, train_loader.gt_resolution,
            donate=False,
        )
        s_raw, m_raw = step(init_train_state(jax.tree.map(jnp.array, params), tx), raw)
        s_cmp, m_cmp = step(init_train_state(jax.tree.map(jnp.array, params), tx), comp)
        assert float(m_cmp["train_loss"]) == pytest.approx(float(m_raw["train_loss"]), rel=1e-6)
        for a, b in zip(jax.tree.leaves(s_raw.params), jax.tree.leaves(s_cmp.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grad_accum_matches_full_batch(self, loaders):
        """grad_accum=2 must produce the SAME update as the full batch (the
        loss is a batch mean, so averaged micro-grads are exact)."""
        train_loader, _ = loaders
        model = tiny_model()
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        batch = next(iter(train_loader))

        def run(accum):
            state = init_train_state(jax.tree.map(jnp.array, params), tx)
            step = make_train_step(
                model, tx, train_loader.inp_resolution, train_loader.gt_resolution,
                donate=False, grad_accum=accum,
            )
            return step(state, batch)

        s1, m1 = run(1)
        s2, m2 = run(2)
        assert float(m2["train_loss"]) == pytest.approx(float(m1["train_loss"]), rel=1e-6)
        assert float(m2["grad_norm"]) == pytest.approx(float(m1["grad_norm"]), rel=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        with pytest.raises(ValueError, match="divide"):
            run(3)  # batch of 2 can't split into 3

    def test_tied_weights_accumulate_grads(self, loaders):
        """The shared BIE block must receive gradients from every depth
        position (tying semantics, SURVEY.md §7 hard part #2)."""
        train_loader, _ = loaders
        h, w = train_loader.inp_resolution
        m1 = BMCNetPlain(scale=2, n_c=8, n_b=1)
        m5 = BMCNetPlain(scale=2, n_c=8, n_b=5)
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = m1.init(jax.random.key(0), dummy, *m1.init_state(2, h, w))
        batch = next(iter(train_loader))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        def loss_for(model):
            def f(p):
                return sequence_loss(model, p, batch, (h, w), train_loader.gt_resolution)[0]
            return f

        g1 = jax.grad(loss_for(m1))(params)
        g5 = jax.grad(loss_for(m5))(params)  # same param tree (shared block)
        n1 = float(optax.global_norm(g1["params"]["neuro"]["para_reschunk"]))
        n5 = float(optax.global_norm(g5["params"]["neuro"]["para_reschunk"]))
        assert n5 != pytest.approx(n1, rel=1e-3)  # depth reuse changes grads


class TestShapeStableEval:
    def test_eval_compiles_once_and_mask_excludes_padding(self, tmp_path):
        """A valid set that doesn't divide the batch size must not trigger a
        second compile (round-1 VERDICT #6): pad_last wrap-pads the final
        batch and the eval step excludes the padding by mask."""
        p = write_synthetic_fixture(
            str(tmp_path / "v.h5"), (32, 32), ("ori", "down2"),
            {"ori": 30000, "down2": 7500}, seed=3,
        )
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
        )
        ld = SequenceLoader([p], cfg, batch_size=2, pad_last=True, num_workers=1, seed=0)
        batches = list(ld)
        assert len(batches[-1]["clip_mask"]) == 2
        assert batches[-1]["clip_mask"].tolist() == [1.0, 0.0]  # 39 clips, batch 2
        assert all(b["inp_events"].shape[0] == 2 for b in batches)
        assert all("clip_mask" in b for b in batches)  # constant pytree struct

        model = tiny_model()
        h, w = ld.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        step = make_eval_step(model, ld.inp_resolution, ld.gt_resolution)
        results = [step(params, b) for b in batches]
        assert step._cache_size() == 1  # ONE compilation across the epoch

        # the padded clip must not contribute: recompute the last batch's
        # metric with the real clip alone (separate B=1 jit)
        last = batches[-1]
        solo = {k: v[:1] for k, v in last.items() if k != "clip_mask"}
        step1 = make_eval_step(model, ld.inp_resolution, ld.gt_resolution)
        ref = step1(params, solo)
        np.testing.assert_allclose(
            float(results[-1]["valid_mse_loss"]), float(ref["valid_mse_loss"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(results[-1]["valid_loss"]), float(ref["valid_loss"]), rtol=1e-6
        )
        assert float(results[-1]["valid_clips"]) == 1.0


class TestCheckpoint:
    def test_roundtrip_and_latest(self, loaders, tmp_path):
        train_loader, _ = loaders
        model = tiny_model()
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        state = init_train_state(params, tx)
        step = make_train_step(model, tx, train_loader.inp_resolution, train_loader.gt_resolution, donate=False)
        batch = next(iter(train_loader))
        state, _ = step(state, batch)

        save_checkpoint(str(tmp_path), state, iteration=7, meta={"experiment": "t"})
        save_checkpoint(str(tmp_path), state, iteration=9)
        assert latest_checkpoint(str(tmp_path)).endswith("iteration_9")

        restored, meta = restore_checkpoint(
            os.path.join(str(tmp_path), "iteration_7"), state
        )
        assert meta["iteration"] == 7 and meta["experiment"] == "t"
        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored state is usable
        state2, m = step(restored, batch)
        assert np.isfinite(float(m["train_loss"]))


class TestEMA:
    """trainer.ema: exponential moving average of params, maintained inside
    the jitted step and riding the checkpoint (production weight averaging —
    no reference counterpart; the reference checkpoints raw params only,
    train.py:534-563)."""

    def _build(self, loaders, decay):
        train_loader, _ = loaders
        model = tiny_model()
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        state = init_train_state(params, tx, ema=decay > 0)
        step = make_train_step(
            model, tx, train_loader.inp_resolution, train_loader.gt_resolution,
            donate=False, ema_decay=decay,
        )
        return train_loader, state, step

    def test_ema_tracks_the_param_trajectory_exactly(self, loaders):
        decay = 0.9
        train_loader, state, step = self._build(loaders, decay)
        manual = jax.tree.map(lambda p: np.asarray(p, np.float64), state.params)
        it = iter(train_loader)
        for _ in range(3):
            state, _ = step(state, next(it))
            manual = jax.tree.map(
                lambda e, p: e * decay + np.asarray(p, np.float64) * (1 - decay),
                manual, state.params,
            )
        for e, m in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(manual)):
            np.testing.assert_allclose(np.asarray(e), m, rtol=1e-5, atol=1e-7)
        # EMA lags the raw params (it is not a copy)
        deltas = [
            float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
            for e, p in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(state.params))
        ]
        assert max(deltas) > 0

    def test_ema_off_keeps_the_field_empty(self, loaders):
        train_loader, state, step = self._build(loaders, 0.0)
        state, _ = step(state, next(iter(train_loader)))
        assert state.ema_params is None

    def test_ema_rides_the_checkpoint_and_serves(self, loaders, tmp_path):
        """save -> restore preserves the EMA bit-exactly, and
        load_model_for_inference(use_ema=True) serves it."""
        train_loader, state, step = self._build(loaders, 0.99)
        for _ in range(2):
            state, _ = step(state, next(iter(train_loader)))
        save_checkpoint(str(tmp_path), state, iteration=2)
        path = os.path.join(str(tmp_path), "iteration_2")

        restored, _ = restore_checkpoint(path, state)
        for a, b in zip(jax.tree.leaves(restored.ema_params), jax.tree.leaves(state.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        from bmcnet_esr_tpu.inference.engine import load_model_for_inference

        _, vars_ema = load_model_for_inference(path, 2, n_c=8, n_b=2, variant="plain", use_ema=True)
        for a, b in zip(jax.tree.leaves(vars_ema), jax.tree.leaves(state.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        _, vars_raw = load_model_for_inference(path, 2, n_c=8, n_b=2, variant="plain")
        for a, b in zip(jax.tree.leaves(vars_raw), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_use_ema_refuses_param_only_checkpoints(self, loaders, tmp_path):
        from bmcnet_esr_tpu.inference.engine import load_model_for_inference

        # flat files never carry an EMA
        with pytest.raises(ValueError, match="params only"):
            load_model_for_inference("x.npz", 2, variant="plain", use_ema=True)
        # an orbax run trained WITHOUT trainer.ema has ema_params == None
        train_loader, state, step = self._build(loaders, 0.0)
        state, _ = step(state, next(iter(train_loader)))
        save_checkpoint(str(tmp_path), state, iteration=1)
        with pytest.raises(ValueError, match="no ema_params"):
            load_model_for_inference(
                os.path.join(str(tmp_path), "iteration_1"),
                2, n_c=8, n_b=2, variant="plain", use_ema=True,
            )

    def test_trainer_ema_knob_end_to_end(self, loaders, tmp_path):
        train_loader, valid_loader = loaders
        cfg = {
            "experiment": "ema",
            "model": {"name": "tiny", "args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "ema": 0.95,
                "iteration_based_train": {
                    "enabled": True, "iterations": 4, "save_period": 4,
                    "train_log_step": 10, "valid_log_step": 10, "valid_step": 10,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        run = RunConfig(cfg, runid="e0")
        tr = Trainer(run, train_loader=train_loader, valid_loader=valid_loader, seed=0)
        tr.train()
        assert tr.state.ema_params is not None
        latest = latest_checkpoint(run.save_dir)
        from bmcnet_esr_tpu.inference.engine import load_model_for_inference

        _, vars_ema = load_model_for_inference(latest, 2, n_c=8, n_b=2, variant="plain", use_ema=True)
        for a, b in zip(jax.tree.leaves(vars_ema), jax.tree.leaves(tr.state.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResumeExactness:
    def test_resume_continues_identically(self, loaders, tmp_path):
        """Checkpoint fidelity: restoring {params, opt_state, step} must let
        training continue EXACTLY as the uninterrupted run (same batches,
        same losses), not merely load weights."""
        train_loader, _ = loaders
        model = tiny_model()
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        step = make_train_step(model, tx, train_loader.inp_resolution,
                               train_loader.gt_resolution, donate=False)
        batches = [b for _, b in zip(range(8), iter(train_loader))]

        # uninterrupted: 8 steps
        state = init_train_state(jax.tree.map(jnp.array, params), tx)
        losses_full = []
        for b in batches:
            state, m = step(state, b)
            losses_full.append(float(m["train_loss"]))

        # interrupted: 4 steps, checkpoint, restore, 4 more
        state = init_train_state(jax.tree.map(jnp.array, params), tx)
        for b in batches[:4]:
            state, m = step(state, b)
        save_checkpoint(str(tmp_path), state, iteration=3)
        restored, meta = restore_checkpoint(os.path.join(str(tmp_path), "iteration_3"), state)
        losses_resumed = []
        for b in batches[4:]:
            restored, m = step(restored, b)
            losses_resumed.append(float(m["train_loss"]))

        np.testing.assert_allclose(losses_resumed, losses_full[4:], rtol=1e-7)

    def test_same_seed_runs_are_identical(self, tmp_path):
        """Full determinism: two Trainer runs with the same seed produce the
        same loss sequence (loader order, augmentation, init)."""
        p = write_synthetic_fixture(
            str(tmp_path / "det.h5"), (32, 32), ("ori", "down2"),
            {"ori": 30000, "down2": 7500}, seed=9,
        )
        from bmcnet_esr_tpu.data.h5dataset import AugmentConfig

        cfg_ds = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            augment=AugmentConfig(enabled=True),
            sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
        )

        def run():
            ld = SequenceLoader([p], cfg_ds, batch_size=2, shuffle=True,
                                drop_last=True, num_workers=2, seed=5, compact=True)
            cfg = {
                "experiment": "det",
                "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
                "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
                "trainer": {
                    "output_path": str(tmp_path), "monitor": "off",
                    "tensorboard": False,
                    "iteration_based_train": {
                        "enabled": True, "iterations": 5, "save_period": 100,
                        "train_log_step": 1, "valid_log_step": 1,
                        "valid_step": 100, "lr_change_rate": 4,
                    },
                },
                "train_dataloader": {"dataset": {"scale": 2}},
            }
            tr = Trainer(RunConfig(cfg, runid="d"), train_loader=ld, seed=7)
            losses = []
            orig = tr.train_step

            def rec(state, batch):
                state, m = orig(state, batch)
                losses.append(float(m["train_loss"]))
                return state, m

            tr.train_step = rec
            tr.train()
            return losses

        a, b = run(), run()
        assert a == b  # bit-identical loss sequences


class TestTrainerLoop:
    def test_end_to_end_smoke(self, loaders, tmp_path):
        train_loader, valid_loader = loaders
        cfg = {
            "experiment": "smoke",
            "model": {"name": "tiny", "args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 1e-5, "amsgrad": True}},
            "lr_scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.95}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "min valid_loss",
                "early_stop": 100,
                "tensorboard": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": 8, "save_period": 4,
                    "train_log_step": 2, "valid_log_step": 10, "valid_step": 4,
                    "lr_change_rate": 4,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        run = RunConfig(cfg, runid="t0")
        tr = Trainer(run, train_loader=train_loader, valid_loader=valid_loader, seed=0)
        result = tr.train()
        assert "train_loss" in result and np.isfinite(result["train_loss"])
        # periodic checkpoint written and resumable
        latest = latest_checkpoint(run.save_dir)
        assert latest is not None
        start = tr.resume(latest)
        assert start > 0

    def test_tensorboard_scalars_are_window_means(self, loaders, tmp_path):
        """Scalar points must be the mean over the log window, not the last
        iteration's sample (round-1 VERDICT "what's weak" #5)."""
        train_loader, _ = loaders
        cfg = {
            "experiment": "tbmean",
            "model": {"name": "tiny", "args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "lr_scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.95}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": 6, "save_period": 100,
                    "train_log_step": 3, "valid_log_step": 10, "valid_step": 100,
                    "lr_change_rate": 4,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        run = RunConfig(cfg, runid="tb0")
        tr = Trainer(run, train_loader=train_loader, seed=0)

        scalars = []
        tr.writer.add_scalar = lambda tag, value, step=None: scalars.append((tag, float(value)))
        per_iter = []
        orig_step = tr.train_step

        def recording_step(state, batch):
            state, m = orig_step(state, batch)
            per_iter.append(float(m["train_loss"]))
            return state, m

        tr.train_step = recording_step
        tr.train()

        logged = [v for t, v in scalars if t == "train_loss"]
        # log boundaries at iters 0 and 3: windows [0] and [1, 2, 3]
        assert logged[0] == pytest.approx(per_iter[0], rel=1e-6)
        assert logged[1] == pytest.approx(np.mean(per_iter[1:4]), rel=1e-6)
        assert logged[1] != pytest.approx(per_iter[3], rel=1e-6)  # not last-sample

    def test_remat_config_plumbs_through(self, loaders, tmp_path):
        train_loader, _ = loaders
        cfg = {
            "experiment": "remat",
            "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "trainer": {
                "output_path": str(tmp_path), "monitor": "off", "tensorboard": False,
                "remat": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": 1, "save_period": 10,
                    "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                    "lr_change_rate": 4,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        run = RunConfig(cfg, runid="r0")
        tr = Trainer(run, train_loader=train_loader, seed=0)
        assert tr.use_remat is False
        result = tr.train()
        assert np.isfinite(result["train_loss"])

    def test_set_by_path(self):
        d = {}
        set_by_path(d, "a;b;c", 5)
        assert d == {"a": {"b": {"c": 5}}}


class TestCompositeLoss:
    def test_extra_terms_add(self, loaders):
        from bmcnet_esr_tpu.training.losses import build_extra_losses
        from bmcnet_esr_tpu.training.train_step import sequence_loss

        train_loader, _ = loaders
        model = tiny_model()
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        batch = {k: jnp.asarray(v) for k, v in next(iter(train_loader)).items()}
        base, _ = sequence_loss(model, params, batch, (h, w), train_loader.gt_resolution)
        extra = build_extra_losses({"l1": 0.5, "charbonnier": 0.25})
        assert [e[0] for e in extra] == ["l1", "charbonnier"]
        tot, _ = sequence_loss(
            model, params, batch, (h, w), train_loader.gt_resolution, extra_losses=extra
        )
        assert float(tot) > float(base)

    def test_unknown_term_raises(self):
        from bmcnet_esr_tpu.training.losses import build_extra_losses

        with pytest.raises(KeyError, match="unknown loss term"):
            build_extra_losses({"nope": 1.0})


class TestQAT:
    """Quantization-aware training (model;args;quant: qat): fake-quantized
    3x3 convs on the exact int8 serving grid with straight-through
    gradients, so a fine-tuned checkpoint serves as int8 unchanged."""

    @pytest.mark.slow
    def test_qat_training_converges(self, loaders):
        train_loader, _ = loaders
        model = BMCNetPlain(scale=2, n_c=8, n_b=2, quant="qat")
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        # the train step donates its state buffers — snapshot before training
        params0 = jax.tree.map(np.asarray, params)
        state = init_train_state(params, tx)
        step = make_train_step(
            model, tx, train_loader.inp_resolution, train_loader.gt_resolution
        )
        losses = []
        for epoch in range(4):
            for batch in train_loader:
                state, m = step(state, batch)
                losses.append(float(m["train_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses[::5]
        # STE actually reaches the quantized convs: their kernels moved
        moved = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            params0, jax.tree.map(np.asarray, state.params),
        )
        assert max(jax.tree.leaves(moved)) > 0

    def test_qat_grads_nonzero_through_quantized_convs(self, loaders):
        """Plain round/clip would zero every gradient upstream of a
        quantized conv; the STE must keep them alive for EVERY param."""
        train_loader, _ = loaders
        model = BMCNetPlain(scale=2, n_c=8, n_b=2, quant="qat")
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        batch = next(iter(train_loader))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        def loss_fn(p):
            l, _ = sequence_loss(
                model, p, batch, (h, w), train_loader.gt_resolution, use_remat=False
            )
            return l

        grads = jax.grad(loss_fn)(params)
        norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(norms))
        assert all(n > 0 for n in norms), norms

    def test_qat_bf16_grads(self, loaders):
        """QAT at dtype=bfloat16 (the bench/TPU fine-tune configuration):
        regression for the conv-transpose dtype mismatch — with
        ``preferred_element_type=f32`` on the fake-quant conv, jax.grad
        convolved the f32 cotangent against the bf16 weight and lax.conv
        rejected the mix (only the grad path fails; forward is fine)."""
        train_loader, _ = loaders
        model = BMCNetPlain(scale=2, n_c=8, n_b=2, quant="qat", dtype=jnp.bfloat16)
        from bmcnet_esr_tpu.training.optim import adam_torch

        tx = adam_torch(1e-3)
        h, w = train_loader.inp_resolution
        dummy = jnp.zeros((2, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
        state = init_train_state(params, tx)
        step = make_train_step(
            model, tx, train_loader.inp_resolution, train_loader.gt_resolution
        )
        batch = next(iter(train_loader))
        state, m = step(state, batch)
        assert np.isfinite(float(m["train_loss"]))
        assert np.isfinite(float(m["grad_norm"])) and float(m["grad_norm"]) > 0

    def test_trainer_rejects_serving_only_quant_modes(self):
        from bmcnet_esr_tpu.training.trainer import build_model

        with pytest.raises(ValueError, match="serving-only"):
            build_model({"model": {"args": {"quant": "pconv"}}}, scale=2)
        m = build_model({"model": {"args": {"variant": "plain", "quant": "qat"}}}, scale=2)
        assert m.quant == "qat"


class TestRound5ReviewFixes:
    """Regressions for the round-5 trainer/pipeline review findings."""

    def _cfg(self, tmp_path, **trainer_over):
        trainer = {
            "output_path": str(tmp_path), "monitor": "min valid_loss",
            "early_stop": 100, "tensorboard": False,
            "iteration_based_train": {
                "enabled": True, "iterations": 8, "save_period": 50,
                "train_log_step": 2, "valid_log_step": 10, "valid_step": 50,
                "lr_change_rate": 4,
            },
        }
        trainer.update(trainer_over)
        return {
            "experiment": "r5fix",
            "model": {"name": "tiny", "args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "lr_scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.95}},
            "trainer": trainer,
            "train_dataloader": {"dataset": {"scale": 2}},
        }

    def test_event_term_trainer_ships_inp_len(self, loaders, tmp_path):
        """An attached needs_events term must receive aux['events_len']:
        _STEP_KEYS used to strip inp_len, so timestamp normalization
        anchored on the zero pad (the poisoning _iwe_event_list warns
        about)."""

        def fn(pred, gt, aux):
            return jnp.float32(0.0)

        fn.needs_events = True
        train_loader, _ = loaders
        tr = Trainer(
            RunConfig(self._cfg(tmp_path), runid="r5a"),
            train_loader=train_loader, seed=0,
            extra_losses=(("ev", 1.0, fn),),
        )
        assert "inp_len" in tr._step_keys
        batch = next(tr._device_prefetched(train_loader))
        assert "inp_len" in batch
        # and the dead pre-rendered GT frames are no longer shipped
        assert "gt_frame" not in batch

    def test_plain_trainer_keeps_lean_signature(self, loaders, tmp_path):
        train_loader, _ = loaders
        tr = Trainer(
            RunConfig(self._cfg(tmp_path), runid="r5b"),
            train_loader=train_loader, seed=0,
        )
        assert "inp_len" not in tr._step_keys
        assert "gt_frame" not in tr._step_keys

    def test_worker_failure_raises_not_truncates(self, loaders, monkeypatch):
        """A loader worker exception must surface to the consumer — the old
        path swallowed it as a completion sentinel and silently dropped
        that worker's share of the epoch."""
        train_loader, _ = loaders

        def boom(self, local, batch, rng):
            raise OSError("corrupt h5 chunk")

        monkeypatch.setattr(SequenceLoader, "_load_batch", boom)
        with pytest.raises(RuntimeError, match="loader worker failed"):
            for _ in train_loader:
                pass

    def test_len_is_arithmetic_and_matches_iteration(self, tmp_path):
        path = str(tmp_path / "len.h5")
        write_synthetic_fixture(
            path, (32, 32), ("ori", "down2"), {"ori": 30000, "down2": 7500},
            seed=2,
        )
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
        )
        for shard_count, drop_last in ((1, True), (1, False), (2, True), (2, False)):
            ld = SequenceLoader(
                [path], cfg, batch_size=2, shuffle=True, drop_last=drop_last,
                num_workers=1, seed=0, shard_index=0, shard_count=shard_count,
            )
            assert len(ld) == sum(1 for _ in ld), (shard_count, drop_last)

    def test_early_stop_checkpoint_label_matches_executed_steps(
        self, loaders, tmp_path
    ):
        """Early stop must checkpoint the iteration whose update the state
        already contains: resuming must continue at `steps executed`, not
        re-apply the last optimizer step."""
        train_loader, valid_loader = loaders
        cfg = self._cfg(
            tmp_path,
            **{"iteration_based_train": {
                "enabled": True, "iterations": 20, "save_period": 50,
                "train_log_step": 2, "valid_log_step": 10, "valid_step": 2,
                "lr_change_rate": 10,
            }},
        )
        tr = Trainer(
            RunConfig(cfg, runid="r5c"), train_loader=train_loader,
            valid_loader=valid_loader, seed=0,
        )
        steps = {"n": 0}
        orig = tr.train_step

        def counting(state, batch):
            steps["n"] += 1
            return orig(state, batch)

        tr.train_step = counting
        tr._eval_monitor = lambda log: (True, False)  # stop at first valid
        tr.train()
        latest = latest_checkpoint(tr.run.save_dir)
        assert latest is not None
        start = tr.resume(latest)
        assert start == steps["n"], (start, steps["n"])

    def test_data_parallel_false_disables_the_data_axis(self, loaders, tmp_path):
        """data_parallel: false + model_parallel: 2 must give a (1, 2)
        mesh — the device count must not silently re-enable the axis the
        user turned off."""
        train_loader, _ = loaders
        cfg = self._cfg(tmp_path)
        cfg["trainer"]["data_parallel"] = False
        cfg["trainer"]["model_parallel"] = 2
        tr = Trainer(
            RunConfig(cfg, runid="r5d"), train_loader=train_loader, seed=0
        )
        assert tr.mesh is not None
        assert tr.mesh.shape["data"] == 1
        assert tr.mesh.shape["model"] == 2
