"""One process of ``__graft_entry__.dryrun_multichip``'s multi-process segment.

The in-process dryrun segments validate GSPMD sharding across one process's
devices; this worker is the piece that makes the driver artifact witness
TRUE multi-process SPMD — ``jax.distributed.initialize`` rendezvous,
``shard_batch``'s ``make_array_from_process_local_data`` assembly from
per-process shards, and the gradient psum crossing process boundaries (the
replacement for the reference's NCCL rendezvous, ``train.py:62-83``).

Every process generates the SAME deterministic global batch (seed 0) and
feeds only its slice; the mean training loss is batch-order invariant, so
``procs=2`` must reproduce the ``procs=1`` loss bit-for-bit up to reduction
order.  Launched by ``dryrun_multichip`` with a clean CPU env, one device
per process.

Usage: python tools/dryrun_multihost_worker.py <coordinator> <pid> <nprocs> <out.json>
"""

import json
import os
import sys


def main() -> None:
    coord, pid, nprocs, out_path = sys.argv[1:5]
    pid, nprocs = int(pid), int(nprocs)

    import jax

    jax.config.update("jax_platform_name", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs and jax.local_device_count() == 1

    import numpy as np
    import jax.numpy as jnp

    from bmcnet_esr_tpu.models import BMCNet
    from bmcnet_esr_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        replicate_tree,
        shard_batch,
    )
    from bmcnet_esr_tpu.training.optim import adam_torch
    from bmcnet_esr_tpu.training.train_step import init_train_state

    scale, h, w, l, n = 4, 8, 8, 3, 64
    b_global = 2
    local = b_global // nprocs
    rng = np.random.default_rng(0)

    def windows(count, hh, ww, nn):
        ev = np.zeros((count, l, 4, nn), np.float32)
        ev[:, :, 0] = rng.integers(0, ww, (count, l, nn))
        ev[:, :, 1] = rng.integers(0, hh, (count, l, nn))
        ev[:, :, 2] = np.sort(rng.random((count, l, nn)), -1)
        ev[:, :, 3] = rng.integers(0, 2, (count, l, nn)) * 2 - 1
        return ev

    full = {
        "inp_events": windows(b_global, h, w, n),
        "gt_events": windows(b_global, scale * h, scale * w, n * scale**2),
    }
    sl = slice(pid * local, (pid + 1) * local)
    local_batch = {k: v[sl] for k, v in full.items()}

    model = BMCNet(scale=scale, n_c=8, n_b=2)
    dummy = jnp.zeros((b_global, 2, h, w, 2))
    params = model.init(jax.random.key(0), dummy, *model.init_state(b_global, h, w))
    tx = adam_torch(1e-4, weight_decay=1e-5, amsgrad=True)
    mesh = make_mesh(jax.device_count())
    state = replicate_tree(init_train_state(params, tx), mesh)
    step = make_parallel_train_step(model, tx, (h, w), (scale * h, scale * w), mesh)
    batch = shard_batch(local_batch, mesh)
    assert batch["inp_events"].shape[0] == b_global  # really assembled globally
    state, metrics = step(state, batch)
    loss = float(np.asarray(metrics["train_loss"].addressable_data(0)))
    digest = float(
        sum(
            np.abs(np.asarray(leaf.addressable_data(0))).sum()
            for leaf in jax.tree.leaves(state.params)
        )
    )
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "loss": loss, "param_digest": digest}, f)

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
