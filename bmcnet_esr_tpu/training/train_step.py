"""Jitted BPTT train/eval steps: rasterize -> scan -> grad -> update.

The reference's training inner loop (``train.py:202-237``) runs a Python BPTT
loop over 8 sliding windows with per-window ``.to(device)`` transfers and CPU
pre-rasterized count images.  Here the whole iteration is ONE XLA program:

  raw padded event windows [B, L, 4, N]  --(vmapped scatter)-->
  count frames [B, L, H, W, 2]           --(sliding pairs + lax.scan)-->
  recurrent forward/loss over S = L - seqn + 1 steps --(autodiff)-->
  gradients -> optax update

``jax.checkpoint`` on the scan body bounds BPTT memory (SURVEY.md §7 hard
part #3).  Loss parity: per-step MSE against the *second* window's GT counts
(``gt_cnt[:, 1]``, ``train.py:213``), summed over the unroll
(``train.py:227-234``); the bicubic shape-fixup (``train.py:228``) applies
when ``scale * inp_res != gt_res``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from bmcnet_esr_tpu.ops.batch import counts_from_batch, sliding_pairs
from bmcnet_esr_tpu.ops.resize import resize_bicubic

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array
    # exponential moving average of params (production weight averaging;
    # None when disabled — an empty pytree subtree, so jit/donate/checkpoint
    # all treat the no-EMA state exactly as before the field existed)
    ema_params: Any = None


def init_train_state(params, tx, ema: bool = False) -> TrainState:
    """``ema=True`` seeds the EMA at the initial params (own buffers — the
    train step donates the state, so the EMA must not alias ``params``)."""
    ema_params = jax.tree.map(jnp.copy, params) if ema else None
    return TrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), ema_params=ema_params,
    )


def ema_update(state: TrainState, params, decay: float):
    """In-graph EMA step: ``ema <- ema * decay + params * (1 - decay)``."""
    if state.ema_params is None:
        raise ValueError(
            "ema_decay is set but the state has no ema_params — build it "
            "with init_train_state(params, tx, ema=True)"
        )
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        state.ema_params, params,
    )


def _rollout_losses(
    model,
    params,
    inp_frames: Array,  # [B, L, H, W, 2]
    gt_frames: Array,  # [B, L, kH, kW, 2]
    seqn: int,
    gt_resolution: Tuple[int, int],
    use_remat: bool,
    extra_losses: Tuple = (),
    inp_events: Array | None = None,  # [B, L, 4, N] raw (for event-consuming terms)
    inp_lens: Array | None = None,  # [B, L] valid counts of the padded windows
) -> Tuple[Array, Array]:
    """Per-step PER-CLIP (MSE, total) over the recurrent unroll -> two
    ``[S, B]`` arrays (clip-resolved so a masked eval can exclude padding).

    ``extra_losses``: tuples ``(name, weight, fn)`` with
    ``fn(pred_fit, gt, aux)`` on NHWC images -> scalar; the per-step total
    is ``mse + sum(w * fn(...))`` (the reference trains MSE-only,
    ``train.py:647-649``; composition covers recipes like RGB recon + LPIPS,
    BASELINE config #4).  ``aux`` carries the raw prediction, the previous
    step's output, the input windows, the scan index, and (when
    ``inp_events`` is given) the step's raw event window — the contract
    ``bmcnet_esr_tpu.losses.terms`` documents.
    """
    b, l, h, w, _ = inp_frames.shape
    pairs = sliding_pairs(inp_frames, seqn)  # [B, S, seqn, H, W, 2]
    xs_seq = jnp.moveaxis(pairs, 1, 0)  # [S, B, seqn, H, W, 2]
    s = xs_seq.shape[0]
    # GT of the second window in each seqn-window (reference gt_cnt[:, 1])
    gts_seq = jnp.moveaxis(gt_frames[:, 1 : 1 + s], 1, 0)  # [S, B, kH, kW, 2]
    xs = {"x": xs_seq, "gt": gts_seq, "step": jnp.arange(s)}
    if inp_events is not None:
        # the step's "current" window = the pair's second window (index 1,
        # the one the GT aligns to — mirrors gts_seq above)
        xs["events"] = jnp.moveaxis(inp_events[:, 1 : 1 + s], 1, 0)
        if inp_lens is not None:
            # valid counts of the zero-padded windows: terms that normalize
            # timestamps must anchor on the last VALID event, not the pad
            # (ops/encodings.normalize_event_times docstring)
            xs["events_len"] = jnp.moveaxis(inp_lens[:, 1 : 1 + s], 1, 0)

    carry0 = tuple(model.init_state(b, h, w))

    def body(carry, inputs):
        x, gt = inputs["x"], inputs["gt"]
        prev_pred = carry[-1]  # the recurrent output slot (both variants)
        outs = model.apply(params, x, *carry)
        pred = outs[-1]
        if pred.shape[1:3] != gt.shape[1:3]:
            pred_fit = resize_bicubic(pred, gt_resolution)
        else:
            pred_fit = pred
        mse = jnp.mean(jnp.square(pred_fit - gt), axis=(1, 2, 3))  # [B]
        total = mse
        if extra_losses:
            aux = {
                "pred": pred,
                "prev_pred": prev_pred,
                "inp": x,
                "step": inputs["step"],
            }
            if "events" in inputs:
                aux["events"] = inputs["events"]
                if "events_len" in inputs:
                    aux["events_len"] = inputs["events_len"]
            for _, weight, fn in extra_losses:
                total = total + weight * fn(pred_fit, gt, aux)  # scalar, broadcast
        return tuple(outs), (mse, total)

    if use_remat:
        body = jax.checkpoint(body)

    _, (mses, totals) = jax.lax.scan(body, carry0, xs)
    return mses, totals


def _normalized(extra_losses: Tuple) -> Tuple:
    """Adapt legacy two-argument terms to the ``fn(pred, gt, aux)`` contract
    (trace-time only; see ``training.losses.adapt_term``)."""
    if not extra_losses:
        return ()
    from bmcnet_esr_tpu.training.losses import adapt_term

    return tuple((n, w, adapt_term(fn)) for n, w, fn in extra_losses)


def _events_for_terms(batch: Dict[str, Array], extra_losses: Tuple):
    """Raw per-clip event windows when any term consumes ``aux['events']``.

    The compact int16/int8 transfer drops timestamps, so event-consuming
    terms (flow / brightness-constancy families) need the raw format —
    ``compact_transfer: False`` in the dataloader block.
    """
    from bmcnet_esr_tpu.training.losses import needs_events  # THE predicate

    if not needs_events(extra_losses):
        return None, None
    if "inp_events" not in batch:
        raise ValueError(
            "an attached loss term consumes raw event windows (needs_events) "
            "but the batch has no 'inp_events' — the compact transfer format "
            "drops timestamps; set compact_transfer: False in the dataloader "
            "config"
        )
    # inp_len rides along so terms can anchor timestamp normalization on the
    # last VALID event of each zero-padded window
    return batch["inp_events"], batch.get("inp_len")


def sequence_loss(
    model,
    params,
    batch: Dict[str, Array],
    inp_resolution: Tuple[int, int],
    gt_resolution: Tuple[int, int],
    seqn: int = 2,
    use_remat: bool = True,
    extra_losses: Tuple = (),
) -> Tuple[Array, Dict[str, Array]]:
    """Total BPTT loss for one batch of clips; aux = reference log metrics.
    ``batch`` carries either raw ``{inp,gt}_events`` or the compact
    ``{inp,gt}_{xy,p}`` transfer format (``SequenceLoader(compact=True)``)."""
    extra_losses = _normalized(extra_losses)
    inp_frames = counts_from_batch(batch, "inp", tuple(inp_resolution))
    gt_frames = counts_from_batch(batch, "gt", tuple(gt_resolution))
    inp_events, inp_lens = _events_for_terms(batch, extra_losses)
    mses, totals = _rollout_losses(
        model, params, inp_frames, gt_frames, seqn, tuple(gt_resolution), use_remat,
        extra_losses, inp_events=inp_events, inp_lens=inp_lens,
    )  # [S, B] each
    total = jnp.sum(jnp.mean(totals, axis=1))
    return total, {"mse_loss": jnp.mean(mses[-1]), "loss": total}


def guarded_apply(state: TrainState, total: Array, grads, tx):
    """Optimizer update that SKIPS non-finite steps in-graph.

    A NaN/inf loss or gradient (event burst overflowing bf16, a corrupt
    window) would otherwise poison the parameters irreversibly mid-run.  The
    guard selects old-vs-new per leaf on ``isfinite(loss) & isfinite(|g|)`` —
    the optimizer state (incl. Adam moments and count) also stays untouched
    on a skipped step, so a skip is exactly "this batch never happened".
    Costs one select per parameter leaf (~1 µs at model scale; no host sync).

    Returns ``(params, opt_state, grad_norm, ok)``.
    """
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
    params = jax.tree.map(lambda n, o: jnp.where(ok, n, o), params, state.params)
    opt_state = jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), opt_state, state.opt_state
    )
    return params, opt_state, gnorm, ok


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    inp_resolution: Tuple[int, int],
    gt_resolution: Tuple[int, int],
    seqn: int = 2,
    use_remat: bool = True,
    donate: bool = True,
    extra_losses: Tuple = (),
    grad_accum: int = 1,
    skip_nonfinite: bool = False,
    ema_decay: float = 0.0,
) -> Callable[[TrainState, Dict[str, Array]], Tuple[TrainState, Dict[str, Array]]]:
    """One fully-jitted optimizer iteration.

    ``ema_decay > 0`` maintains an exponential moving average of the params
    inside the same XLA program (no extra dispatch); the state must come
    from ``init_train_state(..., ema=True)``.  The EMA rides the checkpoint
    (it is a ``TrainState`` field) and serves/exports via
    ``load_model_for_inference(..., use_ema=True)``.

    Under a device mesh, shard ``batch`` along the data axis and replicate
    ``state``; the in-graph means/sums become XLA collectives automatically
    (see ``bmcnet_esr_tpu.parallel``).

    ``grad_accum > 1`` splits the batch into that many micro-batches scanned
    sequentially, averaging their gradients before ONE optimizer update —
    bit-for-tolerance the full-batch gradient (the loss is a batch mean)
    with a micro-batch's activation memory.  This is how the RGB recipe's
    batch 2 runs fp32 on a single 16 G chip (DESIGN.md §6).
    """

    def batch_loss(params, batch):
        return sequence_loss(
            model, params, batch, inp_resolution, gt_resolution, seqn, use_remat,
            extra_losses,
        )

    def grads_of(params, batch):
        if grad_accum == 1:
            return jax.value_and_grad(batch_loss, has_aux=True)(params, batch)

        def split(v):  # [B, ...] -> [A, B//A, ...]
            b = v.shape[0]
            if b % grad_accum != 0:
                raise ValueError(
                    f"batch {b} must divide grad_accum {grad_accum}"
                )
            return v.reshape((grad_accum, b // grad_accum) + v.shape[1:])

        micro_batches = {k: split(v) for k, v in batch.items()}
        zeros = jax.tree.map(jnp.zeros_like, params)

        def micro(acc, mb):
            (total, aux), grads = jax.value_and_grad(batch_loss, has_aux=True)(params, mb)
            acc = jax.tree.map(jnp.add, acc, grads)
            return acc, (total, aux["mse_loss"])

        acc, (totals, mses) = jax.lax.scan(micro, zeros, micro_batches)
        grads = jax.tree.map(lambda g: g / grad_accum, acc)
        # full-batch loss = mean over micro-batch losses (batch-mean loss)
        return (jnp.mean(totals), {"mse_loss": jnp.mean(mses)}), grads

    def step(state: TrainState, batch: Dict[str, Array]):
        (total, aux), grads = grads_of(state.params, batch)
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
        new_state = TrainState(params, opt_state, state.step + 1, ema)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    inp_resolution: Tuple[int, int],
    gt_resolution: Tuple[int, int],
    seqn: int = 2,
    extra_losses: Tuple = (),
) -> Callable[[Any, Dict[str, Array]], Dict[str, Array]]:
    """Validation rollout (no grad): reference ``_valid`` metrics
    (``train.py:466-532``).

    Shape-stable with ragged valid sets: when the batch carries a
    ``clip_mask`` (from ``SequenceLoader(pad_last=True)``, which wrap-pads the
    final short batch to full size), padded clips are excluded from the
    metrics by a weighted mean — one compilation for the whole valid loop
    instead of a second multi-minute compile for the odd final batch.

    Known limitation (documented, not silent): EXTRA loss terms return
    batch-mean scalars by contract (``fn(pred, gt, aux) -> scalar``), so on
    the final wrap-padded batch their component of ``valid_loss`` includes
    the duplicated clips at full weight — a slight over-weighting of real
    (wrapped) clips, bounded by ``(B - n_valid)/B`` of the extra term's
    magnitude on one batch.  The MSE component is exactly mask-weighted.
    Excluding padding from the extras would need a per-clip term contract.
    """

    def step(params, batch: Dict[str, Array]):
        terms = _normalized(extra_losses)
        inp_frames = counts_from_batch(batch, "inp", tuple(inp_resolution))
        gt_frames = counts_from_batch(batch, "gt", tuple(gt_resolution))
        inp_events, inp_lens = _events_for_terms(batch, terms)
        mses, totals = _rollout_losses(
            model, params, inp_frames, gt_frames, seqn, tuple(gt_resolution),
            use_remat=False, extra_losses=terms,
            inp_events=inp_events, inp_lens=inp_lens,
        )  # [S, B]
        w = batch.get("clip_mask", jnp.ones(inp_frames.shape[0]))
        wsum = jnp.maximum(jnp.sum(w), 1.0)

        def wmean(x):  # weighted mean over the clip axis
            return jnp.sum(x * w, axis=-1) / wsum

        return {
            "valid_loss": jnp.sum(wmean(totals)),
            "valid_mse_loss": wmean(mses[-1]),
            "valid_clips": jnp.sum(w),
        }

    return jax.jit(step)
