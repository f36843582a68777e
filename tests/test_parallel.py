"""SPMD data parallelism on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.models import BMCNet, BMCNetPlain
from bmcnet_esr_tpu.parallel import (
    channel_sharding,
    make_mesh,
    make_mesh_2d,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_tree,
    shard_batch,
    shard_tree_channels,
)
from bmcnet_esr_tpu.training.optim import adam_torch
from bmcnet_esr_tpu.training.train_step import (
    init_train_state,
    make_eval_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("par")
    p = write_synthetic_fixture(
        str(d / "p.h5"), (32, 32), ("ori", "down2"), {"ori": 60000, "down2": 15000}, seed=4
    )
    cfg = DatasetConfig(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        sequence=SequenceConfig(3, 2, 3),
    )
    loader = SequenceLoader([p], cfg, batch_size=8, shuffle=False, drop_last=True, num_workers=1)
    model = BMCNetPlain(scale=2, n_c=8, n_b=2)
    tx = adam_torch(1e-3, weight_decay=1e-5, amsgrad=True)
    h, w = loader.inp_resolution
    dummy = jnp.zeros((8, 2, h, w, 2))
    params = model.init(jax.random.key(0), dummy, *model.init_state(8, h, w))
    return loader, model, tx, params


class TestParallelStep:
    def test_matches_single_device(self, setup):
        """One SPMD iteration over 8 devices == the single-device iteration."""
        loader, model, tx, params = setup
        params = jax.tree.map(jnp.array, params)  # donation-safe copy
        batch = next(iter(loader))

        state1 = init_train_state(params, tx)
        step1 = make_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, donate=False
        )
        state1, m1 = step1(state1, batch)

        mesh = make_mesh(8)
        state8 = replicate_tree(init_train_state(params, tx), mesh)
        step8 = make_parallel_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, mesh
        )
        state8, m8 = step8(state8, shard_batch(batch, mesh))

        assert float(m8["train_loss"]) == pytest.approx(float(m1["train_loss"]), rel=1e-5)
        assert float(m8["grad_norm"]) == pytest.approx(float(m1["grad_norm"]), rel=1e-4)
        for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_skip_nonfinite_guard_on_mesh(self, setup):
        """guarded_apply under GSPMD: a NaN batch leaves the sharded state
        untouched and reports the skip; params stay replicated-consistent."""
        loader, model, tx, params = setup
        batch = next(iter(loader))
        bad = {k: np.array(v, dtype=np.float32) for k, v in batch.items()}
        bad["gt_events"][..., :] = np.nan

        mesh = make_mesh(8)
        state = replicate_tree(init_train_state(params, tx), mesh)
        step = make_parallel_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, mesh,
            skip_nonfinite=True,
        )
        before = [np.asarray(x) for x in jax.tree.leaves(state.params)]
        state, m = step(state, shard_batch(bad, mesh))
        assert int(m["train_skipped"]) == 1
        for a, b in zip(before, jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(a, np.asarray(b))
        # and a clean batch still updates
        state, m = step(state, shard_batch(batch, mesh))
        assert int(m["train_skipped"]) == 0
        diffs = [
            float(np.max(np.abs(a - np.asarray(b))))
            for a, b in zip(before, jax.tree.leaves(state.params))
        ]
        assert max(diffs) > 0.0

    def test_batch_actually_sharded(self, setup):
        loader, *_ = setup
        batch = next(iter(loader))
        mesh = make_mesh(8)
        sb = shard_batch(batch, mesh)
        shard_shapes = {s.data.shape for s in sb["inp_events"].addressable_shards}
        assert shard_shapes == {(1,) + batch["inp_events"].shape[1:]}

    def test_multi_step_training_progresses(self, setup):
        loader, model, tx, params = setup
        params = jax.tree.map(jnp.array, params)  # donation-safe copy
        mesh = make_mesh(8)
        state = replicate_tree(init_train_state(params, tx), mesh)
        step = make_parallel_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, mesh
        )
        losses = []
        for _ in range(3):
            for batch in loader:
                state, m = step(state, shard_batch(batch, mesh))
                losses.append(float(m["train_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_parallel_eval_matches_single_device(self, setup):
        """The sharded eval step (incl. the clip_mask path) must equal the
        single-device masked eval bit-for-tolerance."""
        loader, model, tx, params = setup
        batch = next(iter(loader))
        batch = dict(batch)
        batch["clip_mask"] = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)

        step1 = make_eval_step(model, loader.inp_resolution, loader.gt_resolution)
        m1 = step1(params, batch)

        mesh = make_mesh(8)
        step8 = make_parallel_eval_step(
            model, loader.inp_resolution, loader.gt_resolution, mesh
        )
        m8 = step8(replicate_tree(params, mesh), shard_batch(batch, mesh))
        assert float(m8["valid_loss"]) == pytest.approx(float(m1["valid_loss"]), rel=1e-5)
        assert float(m8["valid_mse_loss"]) == pytest.approx(
            float(m1["valid_mse_loss"]), rel=1e-5
        )
        assert float(m8["valid_clips"]) == 5.0

    def test_sharded_batched_inference_matches_single_device(self, setup, tmp_path_factory):
        """infer_file_batch over a mesh (streams sharded on 'data') must
        equal the unsharded batched rollout — SPMD serving."""
        from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
        from bmcnet_esr_tpu.inference import InferenceEngine
        from bmcnet_esr_tpu.data.h5dataset import SequenceConfig

        d = tmp_path_factory.mktemp("sharded_infer")
        paths = []
        for i in range(8):
            p = str(d / f"f{i}.h5")
            write_synthetic_fixture(
                p, (32, 32), ("ori", "down2"),
                {"ori": 12000 + 2000 * i, "down2": 3000 + 500 * i}, seed=20 + i,
            )
            paths.append(p)

        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        dummy = jnp.zeros((1, 2, 16, 16, 2))
        variables = model.init(jax.random.key(1), dummy, *model.init_state(1, 16, 16))
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(4, 2, 1),
        )
        plain = InferenceEngine(model, variables, cfg, chunk_size=8, visualize=False)
        sharded = InferenceEngine(
            model, variables, cfg, chunk_size=8, visualize=False, mesh=make_mesh(8)
        )
        want = plain.infer_file_batch(paths)
        got = sharded.infer_file_batch(paths)
        for w, g in zip(want, got):
            assert g["esr_mse"] == pytest.approx(w["esr_mse"], rel=1e-5)
            assert g["bicubic_mse"] == pytest.approx(w["bicubic_mse"], rel=1e-5)

        # a batch that does not divide the mesh (a datalist's last partial
        # group) runs UNSHARDED with identical results instead of aborting
        # the run (round-5 fix; the warning-only fallback is also pinned by
        # test_inference.py::TestR5EngineFixes)
        tail = sharded.infer_file_batch(paths[:3])  # 3 streams on an 8-mesh
        for w, g in zip(want[:3], tail):
            assert g["esr_mse"] == pytest.approx(w["esr_mse"], rel=1e-5)

    @pytest.mark.slow
    def test_sharded_int8_serving_calibrates_and_tracks_fp32(
        self, setup, tmp_path_factory
    ):
        """Mesh-sharded batched serving composed with the int8 mode: the
        engine calibrates on sharded first-chunk inputs and metrics stay
        within the serving drift bound of the unsharded fp32 rollout."""
        from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
        from bmcnet_esr_tpu.inference import InferenceEngine
        from bmcnet_esr_tpu.data.h5dataset import SequenceConfig

        d = tmp_path_factory.mktemp("sharded_int8")
        paths = []
        for i in range(8):
            p = str(d / f"f{i}.h5")
            write_synthetic_fixture(
                p, (32, 32), ("ori", "down2"),
                {"ori": 12000 + 2000 * i, "down2": 3000 + 500 * i}, seed=40 + i,
            )
            paths.append(p)

        dummy = jnp.zeros((1, 2, 16, 16, 2))
        cfg = DatasetConfig(
            scale=2, ori_scale="down2", window=128, sliding_window=64,
            sequence=SequenceConfig(4, 2, 1),
        )
        m32 = BMCNetPlain(scale=2, n_c=8, n_b=2)
        v32 = m32.init(jax.random.key(1), dummy, *m32.init_state(1, 16, 16))
        want = InferenceEngine(
            m32, v32, cfg, chunk_size=8, visualize=False
        ).infer_file_batch(paths)

        mq = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16, quant=True)
        vq = mq.init(jax.random.key(1), dummy, *mq.init_state(1, 16, 16))
        engq = InferenceEngine(
            mq, vq, cfg, chunk_size=8, visualize=False, mesh=make_mesh(8)
        )
        got = engq.infer_file_batch(paths)
        assert "quant" in engq.variables
        for w, g in zip(want, got):
            assert g["esr_mse"] == pytest.approx(w["esr_mse"], rel=5e-2)

    def test_trainer_uses_mesh_when_available(self, setup, tmp_path):
        from bmcnet_esr_tpu.training.config import RunConfig
        from bmcnet_esr_tpu.training.trainer import Trainer

        loader, *_ = setup
        cfg = {
            "experiment": "dp",
            "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "data_parallel": True,
                "iteration_based_train": {
                    "enabled": True, "iterations": 2, "save_period": 10,
                    "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                    "lr_change_rate": 4,
                },
            },
            "train_dataloader": {"batch_size": 8, "dataset": {"scale": 2}},
        }
        run = RunConfig(cfg, runid="dp0")
        tr = Trainer(run, train_loader=loader, valid_loader=None, seed=0)
        assert tr.mesh is not None and tr.mesh.shape["data"] == 8
        result = tr.train()
        assert np.isfinite(result["train_loss"])


def test_trainer_model_parallel_config(setup, tmp_path):
    """`trainer.model_parallel: N` builds the 2-D (data, model) mesh with
    channel-sharded params and trains to a finite loss."""
    from bmcnet_esr_tpu.training.config import RunConfig
    from bmcnet_esr_tpu.training.trainer import Trainer

    loader, *_ = setup
    cfg = {
        "experiment": "tp",
        "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        "trainer": {
            "output_path": str(tmp_path),
            "monitor": "off",
            "tensorboard": False,
            "data_parallel": True,
            "model_parallel": 4,
            "iteration_based_train": {
                "enabled": True, "iterations": 2, "save_period": 10,
                "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                "lr_change_rate": 4,
            },
        },
        "train_dataloader": {"batch_size": 8, "dataset": {"scale": 2}},
    }
    run = RunConfig(cfg, runid="tp0")
    tr = Trainer(run, train_loader=loader, valid_loader=None, seed=0)
    assert tr.mesh is not None and dict(tr.mesh.shape) == {"data": 2, "model": 4}
    # conv kernels actually live split across 'model'
    kernels = [
        leaf for leaf in jax.tree.leaves(tr.state.params)
        if getattr(leaf, "ndim", 0) == 4 and leaf.shape[-1] == 8
    ]
    assert kernels and {s.data.shape[-1] for s in kernels[0].addressable_shards} == {2}
    result = tr.train()
    assert np.isfinite(result["train_loss"])


def test_trainer_dcn_slices_never_silently_degrades(setup, tmp_path):
    """A multi-slice recipe that can't form its mesh must raise, not fall
    through to single-device training (operator believes DCN is active)."""
    from bmcnet_esr_tpu.training.config import RunConfig
    from bmcnet_esr_tpu.training.trainer import Trainer

    loader, *_ = setup

    def cfg(**trainer_overrides):
        base = {
            "experiment": "dcn_guard",
            "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "dcn_slices": 2,
                "iteration_based_train": {
                    "enabled": True, "iterations": 1, "save_period": 10,
                    "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                    "lr_change_rate": 4,
                },
                **trainer_overrides,
            },
            "train_dataloader": {"batch_size": 8, "dataset": {"scale": 2}},
        }
        return RunConfig(base, runid="dcn_guard0")

    # data_parallel explicitly off: the hierarchical mesh can't shard a batch
    with pytest.raises(ValueError, match="requires data parallelism"):
        Trainer(cfg(data_parallel=False), train_loader=loader,
                valid_loader=None, seed=0)

    # batch indivisible by any >1 device count: the data axis would shrink
    # to 1; with dcn_slices set this must raise instead of warning
    odd_loader, *_ = setup
    odd_loader = _ReBatch(odd_loader, 1)
    with pytest.raises(ValueError, match="dcn_slices"):
        Trainer(cfg(), train_loader=odd_loader, valid_loader=None, seed=0)


class _ReBatch:
    """Wrap a loader overriding batch_size (mesh-formation tests only)."""

    def __init__(self, inner, batch_size):
        self._inner = inner
        self.batch_size = batch_size

    def __getattr__(self, name):
        return getattr(self._inner, name)


@pytest.mark.slow
def test_trainer_model_parallel_resume(setup, tmp_path):
    """Orbax resume under the dp x tp mesh: restored (host) state re-places
    onto the channel shardings at the next step and training continues."""
    from bmcnet_esr_tpu.training.checkpoint import latest_checkpoint
    from bmcnet_esr_tpu.training.config import RunConfig
    from bmcnet_esr_tpu.training.trainer import Trainer

    loader, *_ = setup

    def make_run(runid, iterations):
        return RunConfig({
            "experiment": "tpres",
            "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
            "trainer": {
                "output_path": str(tmp_path),
                "monitor": "off",
                "tensorboard": False,
                "model_parallel": 4,
                "iteration_based_train": {
                    "enabled": True, "iterations": iterations, "save_period": 2,
                    "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                    "lr_change_rate": 4,
                },
            },
            "train_dataloader": {"batch_size": 8, "dataset": {"scale": 2}},
        }, runid=runid)

    tr = Trainer(make_run("a", 2), train_loader=loader, valid_loader=None, seed=0)
    tr.train()
    ckpt = latest_checkpoint(tr.run.save_dir)
    assert ckpt is not None

    tr2 = Trainer(make_run("b", 4), train_loader=loader, valid_loader=None, seed=0)
    start = tr2.resume(ckpt)
    assert start == 2
    result = tr2.train(start_iteration=start)
    assert np.isfinite(result["train_loss"])
    # after the resumed step the state lives channel-sharded again
    kernels = [
        leaf for leaf in jax.tree.leaves(tr2.state.params)
        if getattr(leaf, "ndim", 0) == 4 and leaf.shape[-1] == 8
    ]
    assert kernels and {s.data.shape[-1] for s in kernels[0].addressable_shards} == {2}


def test_trainer_model_parallel_rejects_bad_degree(setup, tmp_path):
    from bmcnet_esr_tpu.training.config import RunConfig
    from bmcnet_esr_tpu.training.trainer import Trainer

    loader, *_ = setup
    cfg = {
        "experiment": "tp",
        "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        "trainer": {
            "output_path": str(tmp_path),
            "monitor": "off",
            "tensorboard": False,
            "model_parallel": 3,
            "iteration_based_train": {
                "enabled": True, "iterations": 1, "save_period": 10,
                "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                "lr_change_rate": 4,
            },
        },
        "train_dataloader": {"batch_size": 8, "dataset": {"scale": 2}},
    }
    run = RunConfig(cfg, runid="tp1")
    with pytest.raises(ValueError, match="model_parallel"):
        Trainer(run, train_loader=loader, valid_loader=None, seed=0)


class TestTensorParallel:
    """dp x tp over a 2-D (data, model) mesh: conv channels split across
    'model', GSPMD inserts the collectives; the math must equal the
    single-device program."""

    def test_tp_train_step_matches_single_device(self, setup):
        loader, model, tx, params = setup
        params = jax.tree.map(jnp.array, params)
        batch = next(iter(loader))

        state1 = init_train_state(params, tx)
        step1 = make_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, donate=False
        )
        state1, m1 = step1(state1, batch)

        mesh = make_mesh_2d(2, 4)
        assert dict(mesh.shape) == {"data": 2, "model": 4}
        state = init_train_state(params, tx)
        state_sh = channel_sharding(state, mesh)
        state_tp = jax.device_put(state, state_sh)
        step_tp = make_parallel_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, mesh,
            state_shardings=state_sh,
        )
        state_tp, mtp = step_tp(state_tp, shard_batch(batch, mesh))

        assert float(mtp["train_loss"]) == pytest.approx(float(m1["train_loss"]), rel=1e-5)
        assert float(mtp["grad_norm"]) == pytest.approx(float(m1["grad_norm"]), rel=1e-4)
        for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state_tp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_params_actually_channel_sharded(self, setup):
        *_, params = setup
        mesh = make_mesh_2d(2, 4)
        placed = shard_tree_channels(params, mesh)
        # an n_c-channel conv kernel (HWIO, O = 8) splits into O/4 shards
        leaves = [
            leaf for leaf in jax.tree.leaves(placed)
            if getattr(leaf, "ndim", 0) == 4 and leaf.shape[-1] == 8
        ]
        assert leaves, "no conv kernels found"
        shard_last = {s.data.shape[-1] for s in leaves[0].addressable_shards}
        assert shard_last == {2}  # 8 channels / model=4
        # odd-sized leaves (e.g. 2-channel output head) stay replicated
        odd = [
            leaf for leaf in jax.tree.leaves(placed)
            if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[-1] == 2
        ]
        if odd:
            assert {s.data.shape for s in odd[0].addressable_shards} == {odd[0].shape}

    def test_tp_eval_matches_single_device(self, setup):
        loader, model, tx, params = setup
        batch = next(iter(loader))
        m1 = make_eval_step(model, loader.inp_resolution, loader.gt_resolution)(
            params, batch
        )
        mesh = make_mesh_2d(2, 4)
        params_sh = channel_sharding(params, mesh)
        step_tp = make_parallel_eval_step(
            model, loader.inp_resolution, loader.gt_resolution, mesh,
            params_shardings=params_sh,
        )
        mtp = step_tp(jax.device_put(params, params_sh), shard_batch(batch, mesh))
        assert float(mtp["valid_loss"]) == pytest.approx(float(m1["valid_loss"]), rel=1e-5)


class TestMultiSlice:
    """Hierarchical (dcn_data, data) mesh: multi-slice data parallelism.

    CPU mesh can't measure DCN-vs-ICI latency, but it proves the hierarchical
    program compiles, shards the batch over BOTH axes, and computes the exact
    same update as single-device."""

    def test_multislice_step_matches_single_device(self, setup):
        from bmcnet_esr_tpu.parallel import make_mesh_multislice

        loader, model, tx, params = setup
        params = jax.tree.map(jnp.array, params)
        batch = next(iter(loader))

        state1 = init_train_state(params, tx)
        step1 = make_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, donate=False
        )
        state1, m1 = step1(state1, batch)

        mesh = make_mesh_multislice(2, 4)
        assert dict(mesh.shape) == {"dcn_data": 2, "data": 4}
        state = replicate_tree(init_train_state(params, tx), mesh)
        step = make_parallel_train_step(
            model, tx, loader.inp_resolution, loader.gt_resolution, mesh
        )
        sharded = shard_batch(batch, mesh)
        # batch dim sharded over the (dcn_data, data) hierarchy: every one of
        # the 8 devices holds exactly one of the 8 clips
        shards = sharded["inp_events"].addressable_shards
        assert len(shards) == 8 and {s.data.shape[0] for s in shards} == {1}

        state, m = step(state, sharded)
        assert float(m["train_loss"]) == pytest.approx(float(m1["train_loss"]), rel=1e-5)
        for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_dcn_slices_config(setup, tmp_path):
    """`trainer.dcn_slices: N` builds the hierarchical mesh from config and
    trains to a finite loss."""
    from bmcnet_esr_tpu.training.config import RunConfig
    from bmcnet_esr_tpu.training.trainer import Trainer

    loader, *_ = setup
    cfg = {
        "experiment": "slices",
        "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        "trainer": {
            "output_path": str(tmp_path),
            "monitor": "off",
            "tensorboard": False,
            "data_parallel": True,
            "dcn_slices": 2,
            "iteration_based_train": {
                "enabled": True, "iterations": 2, "save_period": 10,
                "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                "lr_change_rate": 4,
            },
        },
        "train_dataloader": {"batch_size": 8, "dataset": {"scale": 2}},
    }
    run = RunConfig(cfg, runid="sl0")
    tr = Trainer(run, train_loader=loader, valid_loader=None, seed=0)
    assert tr.mesh is not None and dict(tr.mesh.shape) == {"dcn_data": 2, "data": 4}
    result = tr.train()
    assert np.isfinite(result["train_loss"])


def test_trainer_dcn_slices_rejects_model_parallel(setup, tmp_path):
    from bmcnet_esr_tpu.training.config import RunConfig
    from bmcnet_esr_tpu.training.trainer import Trainer

    loader, *_ = setup
    cfg = {
        "experiment": "bad",
        "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        "trainer": {
            "output_path": str(tmp_path), "monitor": "off", "tensorboard": False,
            "dcn_slices": 2, "model_parallel": 2,
            "iteration_based_train": {
                "enabled": True, "iterations": 1, "save_period": 10,
                "train_log_step": 1, "valid_log_step": 1, "valid_step": 10,
                "lr_change_rate": 4,
            },
        },
        "train_dataloader": {"batch_size": 8, "dataset": {"scale": 2}},
    }
    with pytest.raises(ValueError, match="cannot combine"):
        Trainer(RunConfig(cfg, runid="b0"), train_loader=loader, seed=0)


class TestSpatialServing:
    """Spatial partitioning: ONE stream's activations H-sharded over the
    mesh (parallel.spatial_sharding + StreamingSR(mesh=)) must reproduce the
    single-device rollout — GSPMD's halo exchanges (3x3 convs) and psums
    (the BIE attention's hw contraction) are layout, not semantics."""

    def _windows(self, count, h, w, n=96, seed=0):
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(count):
            ev = np.zeros((4, n), np.float32)
            ev[0] = rng.integers(0, w, n)
            ev[1] = rng.integers(0, h, n)
            ev[2] = np.sort(rng.random(n))
            ev[3] = rng.integers(0, 2, n) * 2 - 1
            out.append(ev)
        return out

    @pytest.mark.parametrize("variant", ["plain", "full"])
    def test_spatial_stream_matches_solo(self, variant):
        from bmcnet_esr_tpu.inference.streaming import StreamingSR

        h, w, window = 16, 16, 96
        if variant == "plain":
            model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        else:
            model = BMCNet(scale=2, n_c=8, n_b=2)
        dummy = jnp.zeros((1, 2, h, w, 2))
        variables = model.init(
            jax.random.key(5), dummy, *model.init_state(1, h, w)
        )
        mesh = make_mesh(8)
        solo = StreamingSR(model, variables, (h, w), window_size=window)
        spat = StreamingSR(model, variables, (h, w), window_size=window, mesh=mesh)
        for i, ev in enumerate(self._windows(4, h, w, seed=7)):
            want = solo.push(ev)
            got = spat.push(ev)
            assert (want is None) == (got is None)
            if want is not None:
                np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"window {i}")

    def test_spatial_activations_actually_sharded(self):
        """The jitted step's HR output is row-sharded across all 8 devices —
        spatial mode really distributes the work, it doesn't just replicate."""
        from bmcnet_esr_tpu.inference.streaming import StreamingSR

        h, w, window = 16, 16, 96
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        dummy = jnp.zeros((1, 2, h, w, 2))
        variables = model.init(jax.random.key(5), dummy, *model.init_state(1, h, w))
        mesh = make_mesh(8)
        spat = StreamingSR(model, variables, (h, w), window_size=window, mesh=mesh)
        wins = self._windows(2, h, w, seed=9)
        spat.push(wins[0])
        spat.push(wins[1])
        pred_sh = spat._prev_frame.sharding  # row-sharded frame
        assert len(pred_sh.device_set) == 8
        assert not pred_sh.is_fully_replicated
        for st in spat._carry:
            assert len(st.sharding.device_set) == 8
            assert not st.sharding.is_fully_replicated

    def test_spatial_height_must_divide(self):
        from bmcnet_esr_tpu.inference.streaming import StreamingSR

        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        h, w = 12, 16  # 12 % 8 != 0
        dummy = jnp.zeros((1, 2, h, w, 2))
        variables = model.init(jax.random.key(1), dummy, *model.init_state(1, h, w))
        with pytest.raises(ValueError, match="must divide"):
            StreamingSR(model, variables, (h, w), window_size=64, mesh=make_mesh(8))
