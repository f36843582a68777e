"""Optimizer / LR-schedule registry (optax).

The reference instantiates optimizers by ``eval()`` on config strings
(``train.py:653-656``) — replaced here by an explicit registry.  The default
recipe (``config/train_nfs.yml:28-40``) is Adam(lr 1e-4, weight_decay 1e-5,
amsgrad) with ExponentialLR(gamma 0.95) stepped every ``lr_change_rate``
iterations while lr >= 1e-5 (``train.py:291-294``).

Torch-Adam parity notes:
* torch ``weight_decay`` is L2-into-gradient *before* the moment updates, not
  decoupled AdamW -> ``optax.add_decayed_weights`` placed before
  ``scale_by_amsgrad``.
* the lr floor means the decay exponent saturates at the last step where the
  pre-step lr was still >= the floor.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import optax


def exponential_decay_with_floor(
    base_lr: float,
    gamma: float = 0.95,
    step_every: int = 4000,
    floor: float = 1e-5,
) -> Callable:
    """lr(i) = base * gamma**min(i // step_every, k_max).

    ``k_max`` is the largest k reachable under the reference's guard
    "step only while current lr >= floor": one extra decay fires from the
    last lr >= floor (``train.py:291-294``).
    """
    if base_lr < floor:
        k_max = 0
    else:
        # largest k with base*gamma**k >= floor, then one more step fires
        k_max = int(math.floor(math.log(floor / base_lr) / math.log(gamma))) + 1
        while base_lr * gamma ** (k_max - 1) < floor:  # guard fp edge cases
            k_max -= 1

    def schedule(count):
        import jax.numpy as jnp

        k = jnp.minimum(count // step_every, k_max)
        return base_lr * gamma**k

    return schedule


def scale_by_torch_adam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """Bit-faithful torch.optim.Adam moment scaling.

    Differs from ``optax.scale_by_adam``/``scale_by_amsgrad`` in the exact
    torch ordering: amsgrad maxes the *raw* second moment, then the
    denominator is ``sqrt(v_max) / sqrt(1 - b2**t) + eps`` (eps added after
    bias correction, outside the sqrt).
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        # distinct buffer trees: sharing one tree across slots breaks buffer
        # donation (same buffer donated twice)
        state = {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree.map(jnp.zeros_like, params),
            "nu": jax.tree.map(jnp.zeros_like, params),
        }
        if amsgrad:
            state["nu_max"] = jax.tree.map(jnp.zeros_like, params)
        return state

    def update(grads, state, params=None):
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_state = {"count": count, "mu": mu, "nu": nu}
        if amsgrad:
            nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
            new_state["nu_max"] = nu_max
            denom_src = nu_max
        else:
            denom_src = nu
        updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps),
            mu,
            denom_src,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def adam_torch(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.Adam-equivalent chain (L2 weight decay, optional amsgrad)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(scale_by_torch_adam(b1=b1, b2=b2, eps=eps, amsgrad=amsgrad))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def sgd_torch(learning_rate, momentum: float = 0.0, weight_decay: float = 0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


OPTIMIZER_REGISTRY: Dict[str, Callable] = {
    "Adam": adam_torch,
    "AdamW": lambda lr, **kw: optax.adamw(lr, **kw),
    "SGD": sgd_torch,
}

SCHEDULE_REGISTRY: Dict[str, Callable] = {
    "ExponentialLR": exponential_decay_with_floor,
    "Constant": lambda base_lr, **_: (lambda count: base_lr),
}


def build_optimizer(optimizer_cfg: Dict, scheduler_cfg: Dict, trainer_cfg: Dict):
    """Build (tx, schedule) from reference-style YAML blocks.

    ``optimizer: {name, args: {lr, weight_decay, amsgrad}}`` +
    ``lr_scheduler: {name, args: {gamma}}`` + the trainer's
    ``lr_change_rate`` (``config/train_nfs.yml:28-40,58``).
    """
    oname = optimizer_cfg.get("name", "Adam")
    oargs = dict(optimizer_cfg.get("args", {}))
    lr = float(oargs.pop("lr", 1e-4))

    sname = scheduler_cfg.get("name", "ExponentialLR") if scheduler_cfg else "Constant"
    sargs = dict(scheduler_cfg.get("args", {})) if scheduler_cfg else {}
    step_every = int(trainer_cfg.get("lr_change_rate", 4000))
    if sname == "ExponentialLR":
        schedule = exponential_decay_with_floor(
            lr, gamma=float(sargs.get("gamma", 0.95)), step_every=step_every
        )
    elif sname in SCHEDULE_REGISTRY:
        schedule = SCHEDULE_REGISTRY[sname](lr, **sargs)
    else:
        raise KeyError(f"unknown lr scheduler {sname!r} (registry: {list(SCHEDULE_REGISTRY)})")

    if oname not in OPTIMIZER_REGISTRY:
        raise KeyError(f"unknown optimizer {oname!r} (registry: {list(OPTIMIZER_REGISTRY)})")
    tx = OPTIMIZER_REGISTRY[oname](schedule, **oargs)
    return tx, schedule
