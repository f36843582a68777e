"""True multi-PROCESS data parallelism (VERDICT r2 missing #3).

The 8-device virtual mesh in the rest of the suite is single-process; these
tests spawn 2 real OS processes with ``jax.distributed.initialize`` (local
gRPC coordinator, one CPU device each) and assert the distributed run —
strided wrap-padded loader shards, ``jax.make_array_from_process_local_data``
batch assembly, cross-process GSPMD gradient reduction — produces the same
losses and parameters as a single-process 2-device run fed the identical
global batches.  Counterpart being replaced: DistributedSampler + NCCL
rendezvous (``/root/reference/train.py:62-83``, ``h5dataloader.py:49-59``).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.models import BMCNetPlain

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")

LOCAL_BATCH = 2
STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    """Clean CPU env (conftest.clean_cpu_env: no axon plugin — it would
    hang plugin init when the tunnel is down, CLAUDE.md), exactly one CPU
    device per process."""
    from conftest import clean_cpu_env

    env = clean_cpu_env(_REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return env


def _dataset_cfg() -> DatasetConfig:
    return DatasetConfig(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
    )


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    d = tmp_path_factory.mktemp("multihost")
    return write_synthetic_fixture(
        str(d / "mh.h5"), (32, 32), ("ori", "down2"),
        {"ori": 60000, "down2": 15000}, seed=0,
    )


def _run_distributed(fixture_h5, tmp_path) -> list:
    port = _free_port()
    env = _worker_env()
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"worker{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, _WORKER, f"localhost:{port}", str(pid), "2",
                    fixture_h5, str(LOCAL_BATCH), str(STEPS), out,
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    results = []
    for p, out in zip(procs, outs):
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr.decode()[-3000:]}"
        with open(out) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
class TestMultiProcessDataParallel:
    def test_matches_single_process_two_device_run(self, fixture_h5, tmp_path):
        results = _run_distributed(fixture_h5, tmp_path)

        # both processes observed the identical replicated trajectory
        assert results[0]["losses"] == results[1]["losses"]
        assert results[0]["param_digest"] == results[1]["param_digest"]

        # single-process 2-device reference fed the SAME global batches:
        # global batch = concat(shard0 local, shard1 local) in process order
        # (exactly how make_array_from_process_local_data lays rows out)
        from bmcnet_esr_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            replicate_tree,
            shard_batch,
        )
        from bmcnet_esr_tpu.training.optim import adam_torch
        from bmcnet_esr_tpu.training.train_step import init_train_state

        cfg = _dataset_cfg()
        shards = [
            SequenceLoader(
                [fixture_h5], cfg, batch_size=LOCAL_BATCH, shuffle=False,
                drop_last=True, num_workers=1, seed=0, compact=True,
                shard_index=i, shard_count=2,
            )
            for i in range(2)
        ]
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        h, w = shards[0].inp_resolution
        dummy = jnp.zeros((1, 2, h, w, 2))
        params = model.init(jax.random.key(0), dummy, *model.init_state(1, h, w))
        tx = adam_torch(1e-3)
        state = init_train_state(params, tx)
        mesh = make_mesh(2)
        state = replicate_tree(state, mesh)
        step = make_parallel_train_step(
            model, tx, shards[0].inp_resolution, shards[0].gt_resolution, mesh,
            use_remat=False,
        )
        keys = ("inp_xy", "inp_p", "gt_xy", "gt_p")
        its = [iter(ld) for ld in shards]
        ref_losses = []
        for _ in range(STEPS):
            locals_ = [next(it) for it in its]
            glob = {
                k: np.concatenate([np.asarray(lb[k]) for lb in locals_])
                for k in keys
            }
            state, m = step(state, shard_batch(glob, mesh))
            ref_losses.append(float(m["train_loss"]))

        np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=1e-5)
        ref_digest = float(
            sum(
                np.abs(np.asarray(leaf)).sum()
                for leaf in jax.tree.leaves(state.params)
            )
        )
        np.testing.assert_allclose(results[0]["param_digest"], ref_digest, rtol=1e-5)

    def test_full_trainer_runs_two_process(self, fixture_h5, tmp_path):
        """The whole Trainer under a real 2-process cluster: per-process
        loader sharding via build_loader, the multi-host mesh branch,
        sharded validation, and the host-0-only checkpoint write."""
        datalist = tmp_path / "list.txt"
        datalist.write_text(fixture_h5 + "\n")
        worker = os.path.join(_REPO, "tests", "multihost_trainer_worker.py")
        port = _free_port()
        env = _worker_env()
        procs, outs = [], []
        for pid in range(2):
            out = str(tmp_path / f"tw{pid}.json")
            outs.append(out)
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable, worker, f"localhost:{port}", str(pid),
                        "2", str(datalist), str(tmp_path / "runs"), out,
                    ],
                    env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                )
            )
        results = []
        for p, out in zip(procs, outs):
            try:
                stdout, stderr = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, f"trainer worker failed:\n{stderr.decode()[-3000:]}"
            with open(out) as f:
                results.append(json.load(f))

        # identical replicated trajectory observed on both hosts
        assert results[0]["losses"] == results[1]["losses"]
        assert len(results[0]["losses"]) == 4
        assert all(np.isfinite(v) for v in results[0]["losses"])
        assert results[0]["param_digest"] == results[1]["param_digest"]
        assert results[0]["valid_loss"] == results[1]["valid_loss"]
        assert np.isfinite(results[0]["valid_loss"])
        # the collective save landed in the shared run dir, visible to both
        assert results[0]["checkpoints"] == ["iteration_3"]
        assert results[1]["checkpoints"] == ["iteration_3"]
        # ...and the collective restore resumed both hosts past it
        assert results[0]["resume_start"] == results[1]["resume_start"] == 4

    def test_wrap_padded_shards_cover_the_dataset(self, fixture_h5):
        """DistributedSampler semantics across shards: equal shard lengths
        (wrap padding) and full coverage of the clip index space."""
        cfg = _dataset_cfg()
        shards = [
            SequenceLoader(
                [fixture_h5], cfg, batch_size=1, shuffle=False, drop_last=False,
                num_workers=1, seed=0, shard_index=i, shard_count=2,
            )
            for i in range(2)
        ]
        idx = [ld._shard_indices(epoch=0) for ld in shards]
        # equal lengths: every host yields the same number of batches and
        # never desyncs on collectives
        assert len(idx[0]) == len(idx[1])
        n_clips = len(shards[0]._index)
        union = set(idx[0]) | set(idx[1])
        assert union == set(shards[0]._index)
        total = len(idx[0]) + len(idx[1])
        assert total == -(-n_clips // 2) * 2  # wrap-padded to a multiple
