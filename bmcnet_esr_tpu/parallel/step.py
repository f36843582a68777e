"""Sharded train step: data-parallel SPMD over the mesh.

Parallelism census of the reference (SURVEY.md §2.2): data parallel is the
one real axis (partially-wired DDP, effectively single-GPU); TP/PP/EP are
absent and architecturally unwarranted for a 2.7M-param recurrent CNN whose
activations (not weights) dominate memory.  Accordingly the sharded step
shards the **batch** dimension of every input along ``data``, replicates
parameters and optimizer state, and relies on GSPMD to turn the in-graph
loss/grad means into ICI ``psum``s — no hand-written collectives.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from bmcnet_esr_tpu.parallel.mesh import data_sharding, replicated
from bmcnet_esr_tpu.training.train_step import (
    TrainState,
    ema_update,
    guarded_apply,
    make_eval_step,
    sequence_loss,
)

import optax


def make_parallel_train_step(
    model,
    tx,
    inp_resolution: Tuple[int, int],
    gt_resolution: Tuple[int, int],
    mesh: Mesh,
    seqn: int = 2,
    use_remat: bool = True,
    extra_losses=(),
    state_shardings=None,
    skip_nonfinite: bool = False,
    ema_decay: float = 0.0,
):
    """Jitted SPMD iteration: batch sharded on ``data``; state replicated by
    default, or laid out per ``state_shardings`` (a pytree of
    ``NamedSharding`` matching the ``TrainState`` — e.g.
    ``channel_sharding(state, mesh)`` for tensor parallelism over a 2-D
    ``(data, model)`` mesh, where conv channels live split across ``model``
    and GSPMD inserts the ICI collectives)."""
    repl = replicated(mesh)
    data = data_sharding(mesh)
    state_sh = repl if state_shardings is None else state_shardings

    def step(state: TrainState, batch: Dict):
        def loss_fn(params):
            return sequence_loss(
                model, params, batch, inp_resolution, gt_resolution, seqn, use_remat,
                extra_losses,
            )

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics = {"train_loss": total, "train_mse_loss": aux["mse_loss"]}
        if skip_nonfinite:
            params, opt_state, gnorm, ok = guarded_apply(state, total, grads, tx)
            metrics["train_skipped"] = (~ok).astype(jnp.int32)
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        ema = ema_update(state, params, ema_decay) if ema_decay else state.ema_params
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    return jax.jit(
        step,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(
    model,
    inp_resolution: Tuple[int, int],
    gt_resolution: Tuple[int, int],
    mesh: Mesh,
    seqn: int = 2,
    extra_losses=(),
    params_shardings=None,
):
    """Sharded validation rollout: batch (incl. the optional ``clip_mask``)
    sharded on ``data``; params replicated by default or laid out per
    ``params_shardings`` (tensor-parallel channel split); the masked
    weighted means become ICI ``psum``s under GSPMD."""
    inner = make_eval_step(model, inp_resolution, gt_resolution, seqn, extra_losses)
    params_sh = replicated(mesh) if params_shardings is None else params_shardings
    return jax.jit(
        inner.__wrapped__,
        in_shardings=(params_sh, data_sharding(mesh)),
        out_shardings=replicated(mesh),
    )
