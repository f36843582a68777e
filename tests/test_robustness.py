"""Production-robustness guarantees: non-finite-step skipping and
SIGTERM (preemption) checkpoint-and-exit.

Neither exists in the reference — a NaN batch poisons its parameters
silently and a preempted run loses up to ``save_period`` (5000) iterations
(``train.py:236-237,555-563``).  These are deliberate beyond-parity
hardening for unattended TPU-slice training.
"""

import os
import signal
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.models import BMCNetPlain
from bmcnet_esr_tpu.training import Trainer, make_train_step
from bmcnet_esr_tpu.training.checkpoint import latest_checkpoint
from bmcnet_esr_tpu.training.config import RunConfig
from bmcnet_esr_tpu.training.optim import adam_torch
from bmcnet_esr_tpu.training.train_step import init_train_state


@pytest.fixture(scope="module")
def loader(tmp_path_factory):
    d = tmp_path_factory.mktemp("robust")
    p = write_synthetic_fixture(
        str(d / "tr.h5"), (32, 32), ("ori", "down2"),
        {"ori": 30000, "down2": 7500}, seed=0,
    )
    cfg = DatasetConfig(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
    )
    return SequenceLoader(
        [p], cfg, batch_size=2, shuffle=True, drop_last=True, num_workers=1, seed=0
    )


def build_step(loader, skip_nonfinite):
    model = BMCNetPlain(scale=2, n_c=8, n_b=2)
    tx = adam_torch(1e-3)
    h, w = loader.inp_resolution
    dummy = jnp.zeros((2, 2, h, w, 2))
    params = model.init(jax.random.key(0), dummy, *model.init_state(2, h, w))
    state = init_train_state(params, tx)
    step = make_train_step(
        model, tx, loader.inp_resolution, loader.gt_resolution,
        donate=False, skip_nonfinite=skip_nonfinite,
    )
    return step, state


def poison(batch):
    """NaN the GT polarity channel -> NaN counts -> NaN loss and grads."""
    bad = {k: np.array(v) for k, v in batch.items()}
    key = "gt_events" if "gt_events" in bad else "gt_p"
    bad[key] = bad[key].astype(np.float32)
    bad[key][..., :] = np.nan
    return bad


class TestNonFiniteGuard:
    def test_skip_preserves_state_and_counts(self, loader):
        step, state = build_step(loader, skip_nonfinite=True)
        batch = next(iter(loader))

        # poisoned step: loss non-finite, params AND opt state untouched
        state2, m = step(state, poison(batch))
        assert int(m["train_skipped"]) == 1
        assert not np.isfinite(float(m["train_loss"]))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(state2.opt_state)):
            np.testing.assert_array_equal(a, b)

        # clean step afterwards still learns (guard is per-batch, not sticky)
        state3, m = step(state2, batch)
        assert int(m["train_skipped"]) == 0
        assert np.isfinite(float(m["train_loss"]))
        diffs = [
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(state3.params))
        ]
        assert max(diffs) > 0.0

    def test_guard_off_by_default_poisons(self, loader):
        """Parity default: without the guard a NaN batch corrupts params —
        documents exactly what skip_nonfinite protects against."""
        step, state = build_step(loader, skip_nonfinite=False)
        batch = next(iter(loader))
        state2, m = step(state, poison(batch))
        assert "train_skipped" not in m
        leaves = [np.asarray(x) for x in jax.tree.leaves(state2.params)]
        assert any(not np.isfinite(x).all() for x in leaves)


class TestSigtermCheckpoint:
    def test_sigterm_checkpoints_and_exits(self, loader, tmp_path):
        cfg = {
            "experiment": "preempt",
            "model": {"name": "tiny", "args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "lr_scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.95}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": 10_000_000,
                    "save_period": 10_000_000, "train_log_step": 5,
                    "valid_log_step": 10, "valid_step": 10_000_000,
                    "lr_change_rate": 10_000_000,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        run = RunConfig(cfg, runid="p0")
        tr = Trainer(run, train_loader=loader, seed=0)

        killer = threading.Timer(1.0, os.kill, (os.getpid(), signal.SIGTERM))
        killer.start()
        try:
            result = tr.train()  # must return instead of running 10M iters
        finally:
            killer.cancel()

        assert tr._preempted
        assert "train_loss" in result
        latest = latest_checkpoint(run.save_dir)
        assert latest is not None, "preemption must leave a resumable checkpoint"
        start = tr.resume(latest)
        assert start > 0

    def test_second_sigterm_escalates_to_immediate_exit(self, loader, tmp_path):
        """TERM = drain to a checkpoint; TERM TERM = exit now.  During a long
        first compile the drain flag is unreachable, so without escalation a
        `timeout`-style supervisor cannot stop a run that is still compiling."""
        cfg = {
            "experiment": "preempt2",
            "model": {"name": "tiny", "args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "lr_scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.95}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": 10, "save_period": 100,
                    "train_log_step": 5, "valid_log_step": 10, "valid_step": 100,
                    "lr_change_rate": 100,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        tr = Trainer(RunConfig(cfg, runid="p1"), train_loader=loader, seed=0)
        exits = []
        tr._exit_now = lambda: exits.append(True)  # stub the re-kill
        tr._preempted = False

        tr._on_sigterm(signal.SIGTERM, None)
        assert tr._preempted and not exits  # first TERM: defer to the loop

        tr._on_sigterm(signal.SIGTERM, None)
        assert exits == [True]  # second TERM: immediate exit path taken

    def test_handler_restored_after_train(self, loader, tmp_path):
        prev = signal.getsignal(signal.SIGTERM)
        cfg = {
            "experiment": "restore",
            "model": {"name": "tiny", "args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "lr_scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.95}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "iteration_based_train": {
                    "enabled": True, "iterations": 2, "save_period": 100,
                    "train_log_step": 1, "valid_log_step": 10, "valid_step": 100,
                    "lr_change_rate": 100,
                },
            },
            "train_dataloader": {"dataset": {"scale": 2}},
        }
        tr = Trainer(RunConfig(cfg, runid="r0"), train_loader=loader, seed=0)
        tr.train()
        assert signal.getsignal(signal.SIGTERM) is prev
