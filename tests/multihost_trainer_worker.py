"""One process of the 2-process FULL-Trainer integration test.

Unlike ``multihost_worker.py`` (which drives the parallel step units), this
runs the whole ``Trainer`` — its own ``build_loader`` per-process sharding,
the multi-host mesh branch, the local-batch divisibility guard, validation
over the sharded eval step, and the host-0-only checkpoint write — under a
real 2-process ``jax.distributed`` cluster.

Usage: python multihost_trainer_worker.py <coordinator> <pid> <nprocs>
       <datalist.txt> <workdir> <out.json>
"""

import json
import os
import sys


def main() -> None:
    coord, pid, nprocs, datalist, workdir, out_path = sys.argv[1:7]
    pid, nprocs = int(pid), int(nprocs)

    import jax

    jax.config.update("jax_platform_name", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )

    import numpy as np

    from bmcnet_esr_tpu.training import Trainer
    from bmcnet_esr_tpu.training.config import RunConfig

    dataset = {
        "scale": 2,
        "ori_scale": "down2",
        "window": 128,
        "sliding_window": 64,
        "sequence": {"sequence_length": 3, "seqn": 2, "step_size": 3},
    }
    cfg = {
        "experiment": "mh_trainer",
        "model": {"args": {"n_c": 8, "n_b": 2, "variant": "plain"}},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        "trainer": {
            "output_path": workdir,
            "monitor": "min valid_loss",
            "early_stop": 100,
            "tensorboard": False,
            "iteration_based_train": {
                "enabled": True, "iterations": 4, "save_period": 1000,
                "train_log_step": 1, "valid_log_step": 1, "valid_step": 2,
                "lr_change_rate": 1000,
            },
        },
        "train_dataloader": {
            "path_to_datalist_txt": datalist,
            "batch_size": 2,  # LOCAL batch per host
            "shuffle": True,
            "drop_last": True,
            "num_workers": 1,
            "dataset": dataset,
        },
        "valid_dataloader": {
            "path_to_datalist_txt": datalist,
            "batch_size": 2,
            "shuffle": False,
            "drop_last": False,
            "num_workers": 1,
            "dataset": dataset,
        },
    }
    # one SHARED run directory: checkpoint saves are collective (orbax
    # under jax.distributed), so every host must address the same path
    tr = Trainer(RunConfig(cfg, runid="shared"), seed=0)
    assert tr.mesh is not None and tr.mesh.size == nprocs, tr.mesh

    losses = []
    orig = tr.train_step

    def rec(state, batch):
        state, m = orig(state, batch)
        losses.append(float(np.asarray(m["train_loss"].addressable_data(0))))
        return state, m

    tr.train_step = rec
    tr.train()

    digest = float(
        sum(
            np.abs(np.asarray(leaf.addressable_data(0))).sum()
            for leaf in jax.tree.leaves(tr.state.params)
        )
    )
    ckpt_dir = tr.run.save_dir
    import os

    ckpts = sorted(
        n for n in os.listdir(ckpt_dir) if n.startswith("iteration_")
    ) if os.path.isdir(ckpt_dir) else []

    # restore is collective too: every process resumes the shared checkpoint
    from bmcnet_esr_tpu.training.checkpoint import latest_checkpoint

    resume_start = tr.resume(latest_checkpoint(ckpt_dir))
    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "losses": losses,
                "param_digest": digest,
                "valid_loss": tr.valid_metrics.result().get("valid_loss"),
                "checkpoints": ckpts,
                "resume_start": resume_start,
            },
            f,
        )

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
