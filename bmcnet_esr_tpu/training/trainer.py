"""Iteration-based trainer: the engine behind ``cli/train.py``.

Re-design of the reference ``Trainer`` (``train.py:86-617``), iteration mode
only — the epoch path is dead code upstream (SURVEY.md §8.1).  Structure:

* the whole optimizer iteration (rasterize + BPTT scan + grad + update) is
  one jitted step (``training/train_step.py``); the Python loop just feeds
  numpy batches and pulls metrics at logging boundaries (device scalars stay
  futures in between — no per-iteration sync, unlike the reference's
  ``.item()`` every step, ``train.py:247-248``);
* validation every ``valid_step`` iters over the valid loader
  (``train.py:264-284``); early stopping on the monitored metric
  (``min valid_loss`` default) with patience ``early_stop``
  (``train.py:343-382``);
* checkpoints every ``save_period`` and on best (``train.py:287-288``),
  via Orbax with resume support (``--resume/--reset``);
* scalars to tensorboard incl. learning rate + steps/sec.
"""

from __future__ import annotations

import logging
import math
import os
import signal
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader, load_datalist
from bmcnet_esr_tpu.models import BMCNet, BMCNetPlain
from bmcnet_esr_tpu.training import checkpoint as ckpt_lib
from bmcnet_esr_tpu.training.config import RunConfig
from bmcnet_esr_tpu.training.optim import build_optimizer
from bmcnet_esr_tpu.training.train_step import (
    init_train_state,
    make_eval_step,
    make_train_step,
)
from bmcnet_esr_tpu.utils import MetricTracker, TensorboardWriter, get_logger


def build_model(config: Dict[str, Any], scale: int):
    """Model factory.  The reference hard-codes ``n_c=128, n_b=5`` and
    ignores the YAML model block (``train.py:638-639``, SURVEY.md §8.8); here
    the block is honored with those defaults."""
    mcfg = config.get("model", {}) or {}
    args = mcfg.get("args", {}) or {}
    n_c = int(args.get("n_c", 128))
    n_b = int(args.get("n_b", 5))
    variant = args.get("variant", "full")
    dtype = jnp.bfloat16 if args.get("dtype") == "bfloat16" else jnp.float32
    # `model;args;quant: qat` fine-tunes ON the int8 serving grid
    # (fake-quantized 3x3 convs with straight-through gradients,
    # models/layers.py QUANT_MODES); the serving-only int8 modes make no
    # sense in a trainer and are rejected up front rather than producing
    # zero gradients through round/clip.
    quant = args.get("quant", False)
    if quant and quant != "qat":
        raise ValueError(
            f"model;args;quant: {quant!r} is a serving-only mode; the one "
            "trainable quant mode is 'qat' (docs/DESIGN.md §6)"
        )
    cls = BMCNetPlain if variant == "plain" else BMCNet
    return cls(scale=scale, n_c=n_c, n_b=n_b, dtype=dtype, quant=quant)


def build_loader(
    dl_cfg: Dict[str, Any], *, shard_index=None, shard_count=None, seed=0,
    pad_last: bool = False,
) -> SequenceLoader:
    """Multi-host: each process loads its slice of the clip index space
    (the SPMD replacement for DistributedSampler, h5dataloader.py:191-201)."""
    if shard_index is None:
        shard_index = jax.process_index()
    if shard_count is None:
        shard_count = jax.process_count()
    paths = load_datalist(dl_cfg["path_to_datalist_txt"])
    return SequenceLoader(
        paths,
        DatasetConfig.from_dict(dl_cfg["dataset"]),
        batch_size=dl_cfg.get("batch_size", 2),
        shuffle=dl_cfg.get("shuffle", False),
        drop_last=dl_cfg.get("drop_last", False),
        pad_last=dl_cfg.get("pad_last", pad_last),
        # int16/int8 event transfer (no ts): -69% host->device bytes on the
        # count-image train path; disable via compact_transfer: False
        compact=dl_cfg.get("compact_transfer", True),
        num_workers=dl_cfg.get("num_workers", 2),
        seed=seed,
        shard_index=shard_index,
        shard_count=shard_count,
    )


class Trainer:
    def __init__(
        self,
        run: RunConfig,
        *,
        train_loader: Optional[SequenceLoader] = None,
        valid_loader: Optional[SequenceLoader] = None,
        seed: int = 3407,
        logger: Optional[logging.Logger] = None,
        extra_losses: tuple = (),
    ):
        self.run = run
        cfg = run.config
        self.logger = logger or get_logger("train")
        self.seed = seed

        tcfg = cfg["trainer"]["iteration_based_train"]
        if not tcfg.get("enabled", True):
            raise ValueError("only iteration-based training is supported (the "
                             "reference's epoch path is dead code, SURVEY.md §8.1)")
        self.iterations = int(tcfg["iterations"])
        self.save_period = int(tcfg.get("save_period", 5000))
        self.train_log_step = int(tcfg.get("train_log_step", 50))
        self.valid_log_step = int(tcfg.get("valid_log_step", 50))
        self.valid_step = int(tcfg.get("valid_step", 1000))

        # BPTT remat: True (default) recomputes scan-body activations in the
        # backward pass — needed for big-window recipes (RGB) whose stored
        # activations would not fit HBM; False stores them, measured +6.5%
        # iters/sec at NFS shapes (282 -> 265 ms) with identical numerics
        # (tests/test_training.py::test_remat_matches_no_remat)
        self.use_remat = bool(cfg["trainer"].get("remat", True))
        # sequential micro-batches per optimizer update (exact full-batch
        # gradient with 1/N activation memory; fp32 RGB-recipe batch 2 on a
        # single chip uses grad_accum: 2)
        self.grad_accum = int(cfg["trainer"].get("grad_accum", 1))
        # production guard: skip (not crash on / not absorb) optimizer steps
        # whose loss or grad norm is non-finite — the step's select keeps
        # params AND optimizer moments untouched, and the trainer reports a
        # count.  Off by default for exact reference-trajectory parity.
        self.skip_nonfinite = bool(cfg["trainer"].get("skip_nonfinite", False))
        self.skipped_steps = 0
        # `trainer.ema: 0.999` maintains an exponential moving average of the
        # params inside the jitted step (zero extra dispatches); the EMA
        # rides checkpoints and loads for serving with
        # load_model_for_inference(..., use_ema=True) / `--ema` on the CLIs
        self.ema_decay = float(cfg["trainer"].get("ema", 0.0))
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError(f"trainer.ema must be in [0, 1), got {self.ema_decay}")

        monitor = cfg["trainer"].get("monitor", "off")
        if monitor == "off":
            self.mnt_mode, self.mnt_metric = "off", None
            self.mnt_best = 0.0
        else:
            self.mnt_mode, self.mnt_metric = monitor.split()
            assert self.mnt_mode in ("min", "max")
            self.mnt_best = math.inf if self.mnt_mode == "min" else -math.inf
        self.early_stop = cfg["trainer"].get("early_stop", math.inf)
        self.not_improved_count = 0

        self.train_loader = train_loader or build_loader(cfg["train_dataloader"], seed=seed)
        self.valid_loader = valid_loader
        if valid_loader is None and "valid_dataloader" in cfg:
            # pad_last keeps the eval step's shapes constant: the ragged
            # final valid batch would otherwise trigger a second full compile
            # (50-400 s on the tunneled TPU) every run
            self.valid_loader = build_loader(
                cfg["valid_dataloader"], seed=seed, pad_last=True
            )

        scale = cfg["train_dataloader"]["dataset"]["scale"]
        self.scale = scale
        self.model = build_model(cfg, scale)
        self.inp_resolution = self.train_loader.inp_resolution
        self.gt_resolution = self.train_loader.gt_resolution
        self.seqn = self.train_loader.seqn

        self.tx, self.schedule = build_optimizer(
            cfg.get("optimizer", {}), cfg.get("lr_scheduler", {}), tcfg
        )

        from bmcnet_esr_tpu.losses.terms import LossContext
        from bmcnet_esr_tpu.training.losses import (
            adapt_term,
            build_extra_losses,
            needs_events,
        )

        # config `loss:` block terms + programmatic terms via the
        # extra_losses= constructor argument: (name, weight, fn) tuples with
        # fn(pred, gt, aux) (two-arg fns adapted) — the open extension point
        # for losses no YAML spec covers
        ctx = LossContext(
            inp_resolution=tuple(self.inp_resolution),
            gt_resolution=tuple(self.gt_resolution),
            scale=scale,
            seqn=self.seqn,
        )
        self.extra_losses = build_extra_losses(cfg.get("loss"), ctx) + tuple(
            (n, float(w), adapt_term(fn)) for n, w, fn in extra_losses
        )
        if needs_events(self.extra_losses):
            for label, loader in (
                ("train_dataloader", self.train_loader),
                ("valid_dataloader", self.valid_loader),
            ):
                if loader is not None and loader.compact:
                    raise ValueError(
                        "an attached loss term consumes raw event windows "
                        f"(needs_events) but the {label} uses the compact "
                        "transfer format, which drops timestamps — set "
                        f"compact_transfer: False in the {label} block"
                    )
        # ship the valid-event counts only when a term needs them (see the
        # _STEP_KEYS comment): event-consuming terms anchor timestamp
        # normalization on the last VALID event of each padded window
        self._step_keys = self._STEP_KEYS + (
            ("inp_len",) if needs_events(self.extra_losses) else ()
        )
        if self.train_loader is not None and getattr(
            self.train_loader, "pad_last", False
        ):
            # the TRAIN loss has no clip_mask weighting (matching the
            # reference's unweighted mean): wrap-padded duplicate clips in
            # the final short batch would train at full gradient weight
            self.logger.warning(
                "train_dataloader pad_last=True: the final short batch's "
                "wrap-padded duplicate clips contribute full-weight "
                "gradients (clip_mask weighting applies to EVAL only); "
                "prefer drop_last for training"
            )
        if self.extra_losses:
            self.logger.info(
                "extra loss terms: "
                + ", ".join(f"{n} (w={w})" for n, w, _ in self.extra_losses)
            )

        # init params on a batch-shaped dummy
        h, w = self.inp_resolution
        dummy = jnp.zeros((1, self.seqn, h, w, 2), jnp.float32)
        state0 = tuple(self.model.init_state(1, h, w))
        params = self.model.init(jax.random.key(seed), dummy, *state0)
        self.state = init_train_state(params, self.tx, ema=self.ema_decay > 0)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.logger.info(f"model params: {n_params}")

        # SPMD data parallelism over all local devices (the TPU-native
        # replacement for the reference's vestigial DDP, SURVEY.md §2.2):
        # batch sharded along 'data', state replicated, gradient psum by GSPMD.
        # `trainer.model_parallel: N` adds the optional tensor-parallel axis:
        # a 2-D (data, model) mesh with conv channels split across 'model'
        # (channel_sharding) — same step, different layout, GSPMD collectives.
        # `trainer.dcn_slices: N` declares a multi-slice deployment: the mesh
        # becomes hierarchical (dcn_data, data) so the gradient reduction
        # rides ICI within each slice and crosses DCN only once per step.
        self.mesh = None
        n_slices = int(cfg["trainer"].get("dcn_slices", 1))
        n_model = int(cfg["trainer"].get("model_parallel", 1))
        if n_slices > 1 and n_model > 1:
            raise ValueError("dcn_slices and model_parallel cannot combine yet")
        if n_slices > 1 and jax.device_count() % n_slices != 0:
            raise ValueError(
                f"dcn_slices={n_slices} does not divide the "
                f"{jax.device_count()} available devices"
            )
        if n_model > 1 and jax.process_count() > 1:
            self.logger.warning(
                "model_parallel is a single-host layout knob; ignoring it "
                "under multi-host (shard the data axis across hosts instead)"
            )
            n_model = 1
        if n_model > 1 and jax.device_count() % n_model != 0:
            raise ValueError(
                f"model_parallel={n_model} does not divide the "
                f"{jax.device_count()} available devices"
            )
        use_dp = cfg["trainer"].get("data_parallel", True) and jax.device_count() > 1
        if n_slices > 1 and not use_dp:
            # never silently train single-device under a multi-slice recipe
            raise ValueError(
                "dcn_slices > 1 requires data parallelism (data_parallel: "
                "true and more than one device): the hierarchical "
                "(dcn_data, data) mesh shards the batch over both axes"
            )
        use_mesh = use_dp or n_model > 1
        if use_mesh:
            batch_size = self.train_loader.batch_size  # LOCAL batch per host
            if jax.process_count() > 1:
                # multi-host: every process must join the global mesh; the
                # local batch shards over this host's devices and
                # shard_batch assembles the global array
                # (jax.make_array_from_process_local_data)
                if batch_size % jax.local_device_count() != 0:
                    raise ValueError(
                        f"local batch {batch_size} must be divisible by the "
                        f"{jax.local_device_count()} local devices for "
                        "multi-host data parallelism"
                    )
                n_dev = jax.device_count()
            else:
                # data_parallel: false with model_parallel > 1 means a
                # (1, model) mesh — the user disabled the data axis, so it
                # must not be silently re-enabled from the device count
                n_dev = jax.device_count() // n_model if use_dp else 1
                if batch_size % n_dev != 0:
                    # shrink the data axis to the largest divisor of the batch
                    n_dev = max(d for d in range(1, n_dev + 1) if batch_size % d == 0)
                if n_dev == 1 and n_model == 1 and n_slices == 1:
                    # (with dcn_slices > 1 this falls through to the mesh
                    # build, which raises on the 1-device data axis — a
                    # multi-slice recipe must never silently degrade)
                    self.logger.warning(
                        "batch size does not shard across the available devices; "
                        "running single-device"
                    )
                    use_mesh = False
        if use_mesh:
            from bmcnet_esr_tpu.parallel import (
                channel_sharding,
                make_mesh,
                make_mesh_2d,
                make_parallel_train_step,
                replicate_tree,
                shard_batch,
            )

            state_sh = None
            if n_model > 1:
                self.mesh = make_mesh_2d(n_dev, n_model)
                state_sh = channel_sharding(self.state, self.mesh)
                self.state = jax.device_put(self.state, state_sh)
            elif n_slices > 1:
                from bmcnet_esr_tpu.parallel import make_mesh_multislice

                if n_dev % n_slices != 0:
                    raise ValueError(
                        f"dcn_slices={n_slices} does not divide the data-axis "
                        f"device count {n_dev} (batch-size constrained)"
                    )
                self.mesh = make_mesh_multislice(n_slices, n_dev // n_slices)
                self.state = replicate_tree(self.state, self.mesh)
            else:
                self.mesh = make_mesh(n_dev)
                self.state = replicate_tree(self.state, self.mesh)
            if self.grad_accum > 1:
                self.logger.warning(
                    "grad_accum > 1 is a single-chip memory lever; the mesh "
                    "already splits the batch across devices — ignoring it"
                )
                self.grad_accum = 1
            self._shard_batch = lambda b: shard_batch(b, self.mesh)
            self.train_step = make_parallel_train_step(
                self.model, self.tx, self.inp_resolution, self.gt_resolution,
                self.mesh, self.seqn, use_remat=self.use_remat,
                extra_losses=self.extra_losses, state_shardings=state_sh,
                skip_nonfinite=self.skip_nonfinite, ema_decay=self.ema_decay,
            )
            self.logger.info(f"mesh over {self.mesh.size} devices: {dict(self.mesh.shape)}")
        else:
            # still device_put on single device: feeding the jit numpy forces
            # a synchronous upload inside every dispatch; an explicit put one
            # batch ahead overlaps the transfer with the running step
            self._shard_batch = jax.device_put  # pytree-aware
            self.train_step = make_train_step(
                self.model, self.tx, self.inp_resolution, self.gt_resolution,
                self.seqn, use_remat=self.use_remat,
                extra_losses=self.extra_losses, grad_accum=self.grad_accum,
                skip_nonfinite=self.skip_nonfinite, ema_decay=self.ema_decay,
            )
        # same one-ahead device placement for validation (numpy-fed eval
        # dispatches would pay the synchronous upload the train path avoids)
        self._shard_eval_batch = jax.device_put
        eval_shard_ok = False
        if self.mesh is not None and self.valid_loader is not None:
            # data-axis degree: 'data' x the outer 'dcn_data' on a
            # multi-slice mesh (batch shards over the hierarchy jointly).
            # Under multi-host the LOCAL valid batch shards over THIS
            # process's share of that degree (shard_batch assembles the
            # global array) — dividing the local batch by the GLOBAL
            # degree would wrongly reject every multi-host config and
            # fall back to a device_put path that cannot feed mesh-placed
            # params.
            data_degree = self.mesh.shape["data"] * self.mesh.shape.get(
                "dcn_data", 1
            )
            if jax.process_count() > 1:
                data_degree = max(data_degree // jax.process_count(), 1)
            eval_shard_ok = (
                self.valid_loader.batch_size % data_degree == 0
            )
            if not eval_shard_ok and jax.process_count() > 1:
                # the single-host fallback below places host-local arrays,
                # which is incompatible with globally-replicated params —
                # fail loudly with guidance instead of hanging at _valid
                raise ValueError(
                    f"local valid batch {self.valid_loader.batch_size} must "
                    f"be divisible by this host's {data_degree}-way share "
                    "of the mesh data axis for multi-host validation"
                )
        if eval_shard_ok:
            from bmcnet_esr_tpu.parallel import channel_sharding, make_parallel_eval_step

            params_sh = (
                channel_sharding(self.state.params, self.mesh)
                if "model" in self.mesh.shape and self.mesh.shape["model"] > 1
                else None
            )
            self.eval_step = make_parallel_eval_step(
                self.model, self.inp_resolution, self.gt_resolution, self.mesh,
                self.seqn, extra_losses=self.extra_losses, params_shardings=params_sh,
            )
            self._shard_eval_batch = self._shard_batch
        else:
            self.eval_step = make_eval_step(
                self.model, self.inp_resolution, self.gt_resolution, self.seqn,
                extra_losses=self.extra_losses,
            )

        self.writer = TensorboardWriter(
            run.log_dir, cfg["trainer"].get("tensorboard", True), self.logger
        )
        self.train_metrics = MetricTracker(["train_mse_loss", "train_loss"])
        self.valid_metrics = MetricTracker(["valid_mse_loss", "valid_loss"])

    # -- checkpointing -----------------------------------------------------

    def save(self, iteration: int, best: bool = False) -> str:
        meta = {
            "training_mode": "iteration_based_train",
            "monitor_best": float(self.mnt_best) if self.mnt_best not in (math.inf, -math.inf) else None,
            "experiment": self.run.experiment,
        }
        path = ckpt_lib.save_checkpoint(
            self.run.save_dir, self.state, iteration=iteration, best=best, meta=meta
        )
        self.logger.info(f"saved checkpoint: {path}")
        return path

    def resume(self, path: str, reset: bool = False) -> int:
        state, meta = ckpt_lib.restore_checkpoint(path, self.state)
        # reference Resumer guards on the config/experiment name
        # (myutils/utils.py:150-160); warn rather than refuse so fine-tuning
        # across experiments stays possible
        ckpt_exp = meta.get("experiment")
        if ckpt_exp and ckpt_exp != self.run.experiment:
            self.logger.warning(
                f"checkpoint experiment {ckpt_exp!r} != current "
                f"{self.run.experiment!r} — resuming anyway"
            )
        self.state = state
        start = 0
        if not reset:
            start = int(meta.get("iteration", 0)) + 1
            if meta.get("monitor_best") is not None:
                self.mnt_best = meta["monitor_best"]
            self.logger.info(f"resumed from {path} at iteration {start}")
        else:
            self.logger.info(f"loaded weights from {path}; trainer state reset")
        return start

    # -- evaluation --------------------------------------------------------

    def _valid(self, stamp: int) -> Dict[str, float]:
        self.valid_metrics.reset()
        for batch_idx, batch in enumerate(
            self._device_prefetched(self.valid_loader, self._shard_eval_batch)
        ):
            m = self.eval_step(self.state.params, batch)
            self.valid_metrics.update("valid_mse_loss", float(m["valid_mse_loss"]))
            self.valid_metrics.update("valid_loss", float(m["valid_loss"]))
            if batch_idx % self.valid_log_step == 0:
                self.logger.debug(
                    f"valid stamp {stamp} [{batch_idx}/{len(self.valid_loader)}] "
                    f"valid_loss: {float(m['valid_loss']):.4e}"
                )
        return self.valid_metrics.result()

    def _eval_monitor(self, log: Dict[str, float]):
        """(stop_training, best) from monitored metric (``train.py:343-382``)."""
        if self.mnt_mode == "off":
            return False, False
        if self.mnt_metric not in log:
            self.logger.warning(f"metric {self.mnt_metric!r} missing from valid log")
            return False, False
        value = log[self.mnt_metric]
        improved = value <= self.mnt_best if self.mnt_mode == "min" else value >= self.mnt_best
        if improved:
            self.mnt_best = value
            self.not_improved_count = 0
            return False, True
        self.not_improved_count += 1
        if self.not_improved_count > self.early_stop:
            self.logger.info(
                f"no improvement for {self.early_stop} stamps; early stopping"
            )
            return True, False
        return False, False

    # -- main loop ---------------------------------------------------------

    # the jitted steps consume only these keys; shipping anything else (the
    # *_len bookkeeping) changes the jit SIGNATURE — a second multi-minute
    # compile of an identical program — and wastes transfer.  gt_frame is
    # deliberately absent: the steps rasterize GT from events
    # (counts_from_batch) and nothing reads the pre-rendered frames, so
    # shipping them would be pure dead transfer.  ``self._step_keys``
    # (set in __init__) extends this with ``inp_len`` when an attached
    # loss term consumes raw event windows — _events_for_terms anchors
    # timestamp normalization on the last VALID event of each zero-padded
    # window, and without the counts the pad's ts==0 poisons the
    # normalization denominator (losses/terms.py:_iwe_event_list).
    _STEP_KEYS = (
        "inp_events", "gt_events", "inp_xy", "inp_p", "gt_xy", "gt_p",
        "clip_mask",
    )

    def _device_prefetched(self, loader, shard_fn=None):
        """Yield batches already placed on device, one transfer ahead.

        ``device_put`` is asynchronous, so initiating batch k+1's host->device
        transfer right after batch k is handed to the (async) train step
        overlaps the ~10 MB upload with the running computation — worth ~7%
        of the step time on the tunneled chip (measured 307 -> 287 ms)."""
        shard_fn = shard_fn or self._shard_batch
        staged = None
        for batch in loader:
            batch = {k: v for k, v in batch.items() if k in self._step_keys}
            nxt = shard_fn(batch)
            if staged is not None:
                yield staged
            staged = nxt
        if staged is not None:
            yield staged

    def train(self, start_iteration: int = 0) -> Dict[str, float]:
        iter_idx = start_iteration
        valid_stamp = 1
        pending: list = []  # (iter, device-metrics) resolved at log boundaries
        stop = False
        t_start = time.time()

        # Preemption-safe shutdown: TPU slices are routinely preempted with a
        # SIGTERM grace window; checkpoint-and-exit turns that into a clean
        # resume point instead of losing up to save_period iterations.  The
        # handler only sets a flag — the loop finishes the in-flight step and
        # saves from a consistent state.  (Reference has no counterpart; its
        # worst case re-runs up to 5000 iterations.)
        #
        # A SECOND SIGTERM exits immediately (default disposition): during a
        # long first compile (minutes on the remote-compile tunnel) the loop's
        # flag check is unreachable, so a lone deferred TERM would leave the
        # process lingering until SIGKILL; the conventional escalation —
        # TERM = drain, TERM TERM = now — keeps supervisors and `timeout`
        # able to stop a run that is still compiling.
        self._preempted = False
        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, self._on_sigterm)
        except ValueError:
            pass  # not the main thread (e.g. a test harness): flag still works

        try:
            return self._train_loop(start_iteration, iter_idx, valid_stamp, pending, stop, t_start)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _on_sigterm(self, signum, frame):
        if self._preempted:  # second SIGTERM: stop being graceful
            self._exit_now()
        self._preempted = True

    def _exit_now(self):  # separated so tests can stub the re-kill
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        os.kill(os.getpid(), signal.SIGTERM)

    def _train_loop(self, start_iteration, iter_idx, valid_stamp, pending, stop, t_start):
        while not stop:
            for batch in self._device_prefetched(self.train_loader):
                self.state, metrics = self.train_step(self.state, batch)
                pending.append((iter_idx, metrics))
                # bound the async dispatch queue: an unthrottled pipeline
                # degrades ~19x on the tunneled chip (measured 6.2 s/iter at
                # 25 outstanding steps vs 0.32 bounded); waiting on the
                # metrics a few steps back keeps the pipeline overlapped
                # while capping outstanding work
                if len(pending) >= 5:
                    jax.device_get(pending[-5][1]["train_loss"])

                if iter_idx % self.train_log_step == 0:
                    window_mse, window_tot, window_skip = [], [], 0
                    for it, m in pending:
                        mse = float(m["train_mse_loss"])
                        tot = float(m["train_loss"])
                        window_mse.append(mse)
                        window_tot.append(tot)
                        window_skip += int(m.get("train_skipped", 0))
                        self.train_metrics.update("train_mse_loss", mse)
                        self.train_metrics.update("train_loss", tot)
                    if window_skip:
                        self.skipped_steps += window_skip
                        self.logger.warning(
                            f"skipped {window_skip} non-finite step(s) in this "
                            f"window ({self.skipped_steps} total) — params and "
                            f"optimizer state untouched for those batches"
                        )
                        self.writer.set_step(iter_idx)
                        self.writer.add_scalar("skipped_steps", self.skipped_steps)
                    # scalar points are the WINDOW MEAN, not the last sample —
                    # the faithful signal when logging every train_log_step
                    mse = float(np.mean(window_mse))
                    tot = float(np.mean(window_tot))
                    lr = float(self.schedule(iter_idx))
                    self.writer.set_step(iter_idx)
                    self.writer.add_scalar("train_mse_loss", mse)
                    self.writer.add_scalar("train_loss", tot)
                    self.writer.add_scalar("learning_rate", lr)
                    ips = (iter_idx - start_iteration + 1) / max(time.time() - t_start, 1e-9)
                    self.logger.info(
                        f"iter {iter_idx}/{self.iterations} "
                        f"train_mse_loss: {mse:.4e} train_loss: {tot:.4e} "
                        f"lr: {lr:.4e} iters/sec: {ips:.2f}"
                    )
                    pending.clear()

                best = False
                if (
                    self.valid_loader is not None
                    and iter_idx % self.valid_step == 0
                    and iter_idx != 0
                ):
                    val_log = self._valid(valid_stamp)
                    self.writer.set_step(valid_stamp, "valid")
                    for k, v in val_log.items():
                        self.writer.add_scalar(f"stamp_{k}", v)
                        self.logger.info(f"    {k:25s}: {v:.4e}")
                    stop, best = self._eval_monitor(val_log)
                    valid_stamp += 1
                    if stop:
                        # count the just-finished iteration BEFORE leaving:
                        # the post-loop save labels `iter_idx - 1`, and the
                        # state already contains this iteration's update —
                        # breaking pre-increment would label the checkpoint
                        # one behind its contents and make a resume re-apply
                        # an optimizer step (the completion/SIGTERM breaks
                        # below happen after the increment)
                        iter_idx += 1
                        break

                if (iter_idx % self.save_period == 0 and iter_idx != 0) or best:
                    self.save(iter_idx, best=best)

                iter_idx += 1
                if iter_idx >= self.iterations:
                    self.logger.info("training completes!")
                    stop = True
                    break
                if self._preempted:
                    # the post-loop final save below checkpoints iter_idx - 1
                    self.logger.warning(
                        f"SIGTERM received — checkpointing at iteration "
                        f"{iter_idx - 1} and exiting for clean resume"
                    )
                    stop = True
                    break

        # final state checkpoint (the reference can end a run with only a
        # 'best' checkpoint on disk; always leaving iteration_N makes resume
        # and deployment deterministic)
        self.save(iter_idx - 1 if iter_idx else 0, best=False)
        self.writer.flush()
        return self.train_metrics.result()
