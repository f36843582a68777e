"""Checkpoint save/restore via Orbax (reference: ``torch.save(state_dict)``
at ``train.py:534-563`` + ``Resumer`` at ``myutils/utils.py:140-177``).

Layout: ``<ckpt_dir>/iteration_<N>/`` Orbax pytrees holding
``{params, opt_state, step}`` plus a ``meta`` dict (training mode, monitor
best, config name).  ``best`` is a separate directory updated whenever the
monitored metric improves — mirroring the reference's
``model_best_until_iteration*.pth`` naming by recording the iteration in
meta rather than the dirname.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from bmcnet_esr_tpu.training.train_step import TrainState


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    *,
    iteration: int,
    best: bool = False,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    name = "best" if best else f"iteration_{iteration}"
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    multiprocess = jax.process_count() > 1
    if (not multiprocess or jax.process_index() == 0) and os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    if multiprocess:
        # orbax saves are COLLECTIVE under jax.distributed: every process
        # must call save on the SAME path or the coordination-service
        # barrier inside deadlocks the cluster (measured: a host-0-only
        # save hangs).  The barrier here keeps host 0's rmtree of a
        # pre-existing dir ordered before anyone starts writing.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_pre_save")
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    payload = dict(meta or {})
    payload["iteration"] = iteration
    if not multiprocess or jax.process_index() == 0:
        with open(os.path.join(path, "trainer_meta.json"), "w") as f:
            json.dump(payload, f)
    return path


def restore_checkpoint(
    path: str, abstract_state: TrainState
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of ``abstract_state`` (shape/dtype check).

    Like the reference ``Resumer``, callers should verify the config/
    experiment name recorded in meta before resuming (``utils.py:150-160``).
    """
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(abstract_state))
    state = ckptr.restore(path, target)
    meta_path = os.path.join(path, "trainer_meta.json")
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    iters = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("iteration_"):
            try:
                iters.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not iters:
        return None
    return os.path.join(ckpt_dir, max(iters)[1])
