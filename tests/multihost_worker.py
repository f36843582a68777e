"""One process of the 2-process data-parallel integration test.

Launched by ``tests/test_multihost.py`` with a clean environment (no axon
plugin, one CPU device per process).  Exercises the TRUE multi-host code
path — ``jax.distributed.initialize``, wrap-padded strided loader shards,
``jax.make_array_from_process_local_data`` assembly in ``shard_batch``,
replicated state, GSPMD gradient reduction across PROCESS boundaries — the
SPMD replacement for the reference's DistributedSampler + NCCL rendezvous
(``train.py:62-83``, ``h5dataloader.py:49-59``).

Usage: python multihost_worker.py <coordinator> <pid> <nprocs> <fixture.h5>
       <local_batch> <steps> <out.json>
"""

import json
import os
import sys


def main() -> None:
    coord, pid, nprocs, fixture, local_batch, steps, out_path = sys.argv[1:8]
    pid, nprocs, local_batch, steps = int(pid), int(nprocs), int(local_batch), int(steps)

    import jax

    jax.config.update("jax_platform_name", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs, jax.devices()
    assert jax.local_device_count() == 1

    import jax.numpy as jnp
    import numpy as np

    from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
    from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
    from bmcnet_esr_tpu.models import BMCNetPlain
    from bmcnet_esr_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        replicate_tree,
        shard_batch,
    )
    from bmcnet_esr_tpu.training.optim import adam_torch
    from bmcnet_esr_tpu.training.train_step import init_train_state

    cfg = DatasetConfig(
        scale=2, ori_scale="down2", window=128, sliding_window=64,
        sequence=SequenceConfig(sequence_length=3, seqn=2, step_size=3),
    )
    # each process loads ITS strided shard of the clip index space
    loader = SequenceLoader(
        [fixture], cfg, batch_size=local_batch, shuffle=False, drop_last=True,
        num_workers=1, seed=0, compact=True,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
    )

    model = BMCNetPlain(scale=2, n_c=8, n_b=2)
    h, w = loader.inp_resolution
    dummy = jnp.zeros((1, 2, h, w, 2))
    params = model.init(jax.random.key(0), dummy, *model.init_state(1, h, w))
    tx = adam_torch(1e-3)
    state = init_train_state(params, tx)

    mesh = make_mesh(jax.device_count())
    state = replicate_tree(state, mesh)
    step = make_parallel_train_step(
        model, tx, loader.inp_resolution, loader.gt_resolution, mesh,
        use_remat=False,
    )

    keys = ("inp_xy", "inp_p", "gt_xy", "gt_p")
    losses = []
    it = iter(loader)
    for _ in range(steps):
        local = next(it)
        batch = shard_batch({k: local[k] for k in keys}, mesh)
        # the global batch must really be local_batch x nprocs
        assert batch["inp_xy"].shape[0] == local_batch * nprocs
        state, metrics = step(state, batch)
        losses.append(float(np.asarray(metrics["train_loss"].addressable_data(0))))

    digest = float(
        sum(
            np.abs(np.asarray(leaf.addressable_data(0))).sum()
            for leaf in jax.tree.leaves(state.params)
        )
    )
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "losses": losses, "param_digest": digest}, f)

    # Results are on disk — exit WITHOUT running the atexit
    # jax.distributed shutdown barrier.  On a loaded host one process can
    # reach teardown seconds after its peer; the coordination service then
    # times out the barrier and ABORTS the laggard (absl FATAL in
    # client.h) even though the run succeeded — an rc!=0 teardown race the
    # parent cannot distinguish from a real failure.  Skipping the barrier
    # in BOTH workers is symmetric: nobody waits, nobody aborts; the
    # parent asserts correctness from the JSON outputs alone.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
