"""Headline benchmark: voxel-frames/sec/chip, full BMCNet x4, NFS shapes.

Measures the inference hot path on the attached TPU chip: stride-1 stateful
rollout (two consecutive 45x80 LR count windows in -> 180x320 HR count image
out) including on-device event rasterization, scanned in chunks exactly as
``bmcnet_esr_tpu.inference.engine`` runs it.  One window processed == one
voxel frame.

Baseline for ``vs_baseline``: the same architecture/rollout in PyTorch
(reference implementation semantics) on this host's CPU — the only
torch baseline measurable in this environment (no CUDA here).  The metric
string carries that caveat.  ``aux`` adds the other axes:

* ``b1_ms_per_window`` — the reference's own eval metric (ms per forward at
  batch 1, stateful stride-1 rollout; ``infer_BMCNet.py:54-68``), measured
  as a chunked scan so the ~33 ms per-dispatch tunnel overhead amortizes
  (the honest serving number on this attachment).
* ``train_iters_per_sec`` — full NFS training recipe shapes (full BMCNet x4,
  batch 2, 9-window clips, 2048-event windows, BPTT + Adam(amsgrad), one
  XLA program per iteration).
* ``fps_int8_p1x1`` / ``fps_int8_pconv`` / ``fps_int8_pall`` — the Pallas
  fused-quant routes, captured so the int8 routing decision record
  (docs/DESIGN.md §6) rests on driver-captured numbers.

FAILURE MODES ARE BOUNDED (round-2/3 lesson: a down or flapping tunnel
must never turn the round's perf budget into rc=124 with no artifact):

* A GLOBAL wall-clock deadline (``BENCH_TOTAL_BUDGET_S``, default 1380 s)
  bounds everything; probe/child/fallback budgets are sized WITHIN it and
  the emission path always runs before it expires.  1380 s is sized to
  FINISH (rc=0) inside the driver's empirically ~1800 s kill window —
  rounds 2-4 all died rc=124 because a full run outlived it (round-4
  ok-run: 2282 s).  The phases are ordered headline-first and every
  decision-record re-probe (daemon wire/chunk matrix, int8 route modes)
  is budget-gated with a citation to its committed docs/bench_runs/
  artifact when skipped; a manual BENCH_TOTAL_BUDGET_S=3600 run still
  captures everything.
* The parent installs SIGTERM/SIGINT handlers that kill any live child and
  print the JSON line with the partials gathered so far — the driver's
  timeout delivers SIGTERM before SIGKILL, so even an external kill
  produces an artifact.
* The parent process NEVER imports jax.  Chip probing, TPU measurement,
  and the CPU fallback all run in killable child processes.
* The TPU child checkpoints each metric to a state file the moment it is
  measured, plus a ``_phase`` marker — a child that never gets past axon
  plugin init (the observed round-3 wedge) is killed after
  ``BENCH_DEVICE_INIT_S`` (~4 min) instead of burning a 25-minute stall
  budget; a child that reached the device but lands no metric (cold
  compile is ~400 s) gets ``BENCH_FIRST_METRIC_S``.
* Every successful run appends its emitted line to ``BENCH_HISTORY.jsonl``
  (committed).  When live capture fails, the newest history entry is
  embedded in aux as ``last_good`` with its timestamp, so the artifact
  still carries the most recent machine-verified numbers.
* If the chip never answers the probe, the same rollout is measured with
  JAX on host CPU (a real execution of this framework's hot path) so the
  emitted line still carries a live machine-verified number, flagged
  ``status: "chip_unavailable"``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "aux"} —
always, on every path.  ``aux`` carries the numeric north-star fields:
``vs_torch_cpu`` (measured) and ``vs_gpu_est_low``/``vs_gpu_est_high``
(vs docs/DESIGN.md §8's estimated 120-250 fps PyTorch-GPU band).

Budgets (override via env):
  BENCH_TOTAL_BUDGET_S    global wall-clock deadline            (default 1380)
  BENCH_PROBE_BUDGET_S    chip-probe window                     (default 900)
  BENCH_DEVICE_INIT_S     kill child stuck at plugin init       (default 240)
  BENCH_FIRST_METRIC_S    kill child with device but no metric  (default 600)
  BENCH_STALL_S           kill child if no new metric lands     (default 600)
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# persistent compilation cache: the axon remote-compile of the bf16 rollout
# takes ~400s cold, ~50s cached
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np

TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 1380))
PROBE_BUDGET_S = float(os.environ.get("BENCH_PROBE_BUDGET_S", 900))
DEVICE_INIT_S = float(os.environ.get("BENCH_DEVICE_INIT_S", 240))
FIRST_METRIC_S = float(os.environ.get("BENCH_FIRST_METRIC_S", 600))
STALL_S = float(os.environ.get("BENCH_STALL_S", 600))
HISTORY_PATH = os.path.join(_REPO, "BENCH_HISTORY.jsonl")
# docs/DESIGN.md §8: estimated PyTorch-GPU band for the reference at these
# shapes (10-20% sustained utilization of an A100-class part, launch-bound
# one-window dispatch) — the north-star denominator, clearly an estimate
GPU_EST_BAND_FPS = (120.0, 250.0)

B = 8          # batched independent streams per chip
H, W = 45, 80  # NFS down8 input resolution
SCALE = 4


def _torch_cpu_best_from_history(path: str, fallback: float = 0.9) -> float:
    """Fastest torch-CPU baseline ever recorded in the committed history
    (``torch_cpu_fps_live`` / ``torch_cpu_fps`` aux fields) — floors the
    ``vs_baseline`` denominator so box contention during the bench can
    never inflate the published speedup (see ``bench_torch_cpu``).  Read
    from BENCH_HISTORY.jsonl instead of hand-pinning a constant that
    silently duplicates it (VERDICT r4 weak-5); ``fallback`` covers a
    missing/empty history (0.9 = the 2026-08-20 measured best)."""
    best = fallback
    try:
        with open(path) as f:
            for ln in f:
                if not ln.strip():
                    continue
                try:
                    aux = json.loads(ln).get("aux", {})
                except json.JSONDecodeError:
                    continue
                for k in ("torch_cpu_fps_live", "torch_cpu_fps"):
                    v = aux.get(k)
                    if isinstance(v, (int, float)):
                        best = max(best, float(v))
    except OSError:
        pass
    return best


TORCH_CPU_BEST_FPS = _torch_cpu_best_from_history(HISTORY_PATH)
N_EVENTS = 2048
CHUNK = 512    # windows per scan chunk (amortizes ~33 ms per-dispatch overhead;
               # measured on v5e: 64 -> 895 fps, 128 -> 914, 256 -> 926, 512 -> 932)
CHUNK_B1 = 256 # batch-1 latency chunk (64 -> 1.96 ms/window, 256 -> 1.62)
N_CHUNKS_TIMED = 3


# --------------------------------------------------------------------------
# measurement bodies (run inside child processes; see __main__ dispatch)
# --------------------------------------------------------------------------

def random_windows(count, batch, h, w, n, rng):
    ev = np.zeros((count, batch, 4, n), np.float32)
    ev[..., 0, :] = rng.integers(0, w, (count, batch, n))
    ev[..., 1, :] = rng.integers(0, h, (count, batch, n))
    ev[..., 2, :] = np.sort(rng.random((count, batch, n)), -1)
    ev[..., 3, :] = rng.integers(0, 2, (count, batch, n)) * 2 - 1
    return ev


def _rollout_fps(batch: int, dtype_name: str = "bfloat16", chunk: int = CHUNK) -> float:
    """Voxel-frames/sec of the chunked stateful rollout at a given batch."""
    import jax
    import jax.numpy as jnp

    from bmcnet_esr_tpu.models import BMCNet
    from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

    if dtype_name.startswith("int8"):
        # W8A8 dynamic quantization: bf16 non-conv ops, int8 MXU convs.
        # "int8_p1x1" additionally routes the 1x1 convs through the fused
        # Pallas quantize->int8 dot->rescale kernel (ops/pallas/qmm.py);
        # "int8_pconv" routes the 3x3 convs through the fused Pallas
        # quantize+conv kernel (ops/pallas/qconv.py); "int8_pall" does both.
        # The route is the model's `quant` MODE (layers.QUANT_MODES) — NOT a
        # global flag: flax setup re-runs per apply, so a global flipped
        # after construction would silently fall back to the plain path
        # (which is exactly the bug the earlier flag-based probe had).
        quant_mode = {
            "int8": True, "int8_p1x1": "p1x1",
            "int8_pconv": "pconv", "int8_pall": "pall",
            "int8_pquant": "pquant", "int8_chain": "chain",
            "int8_chainq": "chainq",
        }[dtype_name]
        model = BMCNet(
            scale=SCALE, n_c=128, n_b=5, dtype=jnp.bfloat16, quant=quant_mode
        )
    else:
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        model = BMCNet(scale=SCALE, n_c=128, n_b=5, dtype=dtype)
    x0 = jnp.zeros((batch, 2, H, W, 2))
    carry0 = tuple(model.init_state(batch, H, W))
    variables = model.init(jax.random.key(0), x0, *carry0)

    @jax.jit
    def chunk_rollout(variables, carry, events):  # events [chunk+1, B, 4, N]
        frames = batch_events_to_counts(events, (H, W))  # [C+1, B, H, W, 2]
        pairs = jnp.stack([frames[:-1], frames[1:]], axis=1)  # [C, 2, B, ...]

        def body(c, pair):
            x = jnp.moveaxis(pair, 0, 1)  # [B, 2, H, W, 2]
            outs = model.apply(variables, x, *c)
            return tuple(outs), outs[-1]

        carry, preds = jax.lax.scan(body, carry, pairs)
        return carry, preds

    rng = np.random.default_rng(0)
    events = jnp.asarray(random_windows(chunk + 1, batch, H, W, N_EVENTS, rng))

    if dtype_name.startswith("int8"):
        # static activation scales (engine does the same on its first chunk):
        # removes the per-call max pass from the scan body — v5e measured
        # 932 bf16 -> 990 dynamic int8 -> 1051 static int8 fps
        from bmcnet_esr_tpu.models import calibrate_act_scales

        @jax.jit
        def _pairs(ev):
            fr = batch_events_to_counts(ev, (H, W))
            return jnp.stack([fr[:-1], fr[1:]], axis=2)  # [S, B, 2, H, W, 2]

        variables = calibrate_act_scales(
            model, variables, _pairs(events[:17]), carry0, max_steps=16
        )

    # NOTE: on the axon platform block_until_ready can return before the
    # first real execution completes; a tiny device_get is the reliable sync.
    carry = carry0
    carry, preds = chunk_rollout(variables, carry, events)  # compile + first exec
    _ = jax.device_get(preds[-1, 0, 0, 0])

    times = []
    for _ in range(N_CHUNKS_TIMED + 1):
        t0 = time.perf_counter()
        carry, preds = chunk_rollout(variables, carry, events)
        _ = jax.device_get(preds[-1, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    times = times[1:]  # drop warm-up
    dt = float(np.median(times))
    return chunk * batch / dt


def bench_train_iters_per_sec(n_iters_timed: int = 8, dtype_name: str = "float32") -> float:
    """Optimizer iterations/sec at the full NFS recipe shapes (batch 2,
    9-window clips, 2048-event windows, full BMCNet x4, BPTT + Adam).
    ``dtype_name='bfloat16'`` measures the TPU deviation knob (fp32 master
    weights, bf16 activations)."""
    import jax
    import jax.numpy as jnp

    from bmcnet_esr_tpu.models import BMCNet
    from bmcnet_esr_tpu.training.optim import adam_torch
    from bmcnet_esr_tpu.training.train_step import init_train_state, make_train_step

    batch_size, seq_len = 2, 9
    # "qat": quantization-aware training at the same recipe shapes (bf16
    # activations + fake-quantized 3x3 convs with STE; models/layers.py)
    dtype = jnp.bfloat16 if dtype_name in ("bfloat16", "qat") else jnp.float32
    quant = "qat" if dtype_name == "qat" else False
    model = BMCNet(scale=SCALE, n_c=128, n_b=5, dtype=dtype, quant=quant)
    tx = adam_torch(1e-4, weight_decay=1e-5, amsgrad=True)
    dummy = jnp.zeros((batch_size, 2, H, W, 2))
    params = model.init(jax.random.key(0), dummy, *model.init_state(batch_size, H, W))
    state = init_train_state(params, tx)
    # remat off: NFS-shape activations fit HBM; measured +6.5% vs recompute
    # (matches configs/train_nfs.yml `remat: False`)
    step = make_train_step(
        model, tx, (H, W), (SCALE * H, SCALE * W), seqn=2, use_remat=False
    )

    rng = np.random.default_rng(1)

    def clip_batch(events_n, hh, ww):
        ev = np.zeros((batch_size, seq_len, 4, events_n), np.float32)
        ev[:, :, 0] = rng.integers(0, ww, (batch_size, seq_len, events_n))
        ev[:, :, 1] = rng.integers(0, hh, (batch_size, seq_len, events_n))
        ev[:, :, 2] = np.sort(rng.random((batch_size, seq_len, events_n)), -1)
        ev[:, :, 3] = rng.integers(0, 2, (batch_size, seq_len, events_n)) * 2 - 1
        return ev

    # compact int16/int8 transfer — the trainer's default batch format
    from bmcnet_esr_tpu.ops.batch import compact_events

    inp_xy, inp_p = compact_events(clip_batch(N_EVENTS, H, W))
    gt_xy, gt_p = compact_events(clip_batch(N_EVENTS * SCALE**2, SCALE * H, SCALE * W))
    batch = {
        "inp_xy": jnp.asarray(inp_xy), "inp_p": jnp.asarray(inp_p),
        "gt_xy": jnp.asarray(gt_xy), "gt_p": jnp.asarray(gt_p),
    }
    state, metrics = step(state, batch)  # compile + first exec
    _ = jax.device_get(metrics["train_loss"])

    t0 = time.perf_counter()
    for _ in range(n_iters_timed):
        state, metrics = step(state, batch)
    _ = jax.device_get(metrics["train_loss"])
    return n_iters_timed / (time.perf_counter() - t0)


def _daemon_loopback_fps(
    dtype_name: str = "bfloat16", wire_dtype: str = "float32", aux: dict = None,
    fetch_chunks: int = 1,
) -> float:
    """End-to-end serving-daemon rate (TCP loopback, 8 pipelining clients,
    deep ticks): the full production path — sockets, dynamic batching,
    depth-adaptive scan ticks, rasterize, model.  On the tunneled chip this
    is bounded by the device->host transfer of the HR predictions (compare
    ``d2h_mbps``: each window's reply is 460 KB f32 / 230 KB f16 / 115 KB
    i8), NOT by compute — ``wire_dtype`` is one lever
    (tools/bench_serving.py, server.py protocol v3) and ``fetch_chunks``
    the other (in-graph slot-axis fetch split -> concurrent d2h copies;
    ``d2h_mbps_x2`` documents the per-stream bound it exploits).  Stashes
    the server's own observability snapshot in ``aux`` for the artifact."""
    from tools.bench_serving import bench_daemon_loopback

    wps, stats = bench_daemon_loopback(
        dtype_name, n_clients=8, windows_per_client=256, scan_k=8,
        wire_dtype=wire_dtype, fetch_chunks=fetch_chunks,
    )
    if aux is not None:
        key = f"daemon_stats_{wire_dtype}" + (
            f"_c{fetch_chunks}" if fetch_chunks > 1 else ""
        )
        aux[key] = {
            k: stats.get(k)
            for k in (
                "ticks", "windows_served", "batch_occupancy_mean",
                "latency_ms_p50", "latency_ms_p99",
            )
        }
    return wps


def bench_link_mbps(aux: dict) -> float:
    """Host<->device link bandwidth at the daemon's actual transfer shape.

    The serving daemon's dominant byte stream is the deep tick's HR
    prediction stack ([K=8, B=8, 180, 320, 2] — 29.5 MB f32 / 14.7 MB
    bf16); on the tunneled attachment this link, not the MXU, bounds
    ``fps_daemon_loopback``.  Measures device->host (``d2h_mbps``, the
    reply fetch) and host->device (``h2d_mbps``, the event upload) so the
    artifact carries the decomposition; returns d2h for the record() value.
    """
    import jax
    import jax.numpy as jnp

    # every timed fetch must pull a buffer the host has NEVER seen: the
    # PJRT client caches the host copy of an unchanged array after the
    # first device_get, so re-fetching the same buffer times a host memcpy
    # (round-4 capture showed 1.5 TB/s "d2h" — a cache hit, not the link).
    # x + i is a fresh on-device buffer per iteration.
    x = jnp.ones((8, 8, 180, 320, 2), jnp.bfloat16)  # 14.7 MB on device
    jax.block_until_ready(x)
    nbytes = x.size * 2
    _ = jax.device_get(x)  # warm the path (compile the add too)
    _ = jax.block_until_ready(x + 1.0)
    times = []
    for i in range(3):
        fresh = x + float(i + 2)
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        _ = jax.device_get(fresh)
        times.append(time.perf_counter() - t0)
    d2h = nbytes / float(np.median(times)) / 2**20

    # two concurrent fetch streams: if this beats d2h_mbps the link is
    # per-transfer latency-bound and a multi-threaded fetcher would pay;
    # if it matches, the link is saturated and fewer bytes (wire_dtype)
    # is the only lever
    import threading

    def fetch(arr):
        _ = jax.device_get(arr)

    times = []
    for i in range(3):
        # fresh pair per iteration — same cache-defeat as above
        fa = jax.block_until_ready(x + float(10 + 2 * i))
        fb = jax.block_until_ready(x + float(11 + 2 * i))
        t0 = time.perf_counter()
        t = threading.Thread(target=fetch, args=(fb,))
        t.start()
        _ = jax.device_get(fa)
        t.join()
        times.append(time.perf_counter() - t0)
    aux["d2h_mbps_x2"] = round(2 * nbytes / float(np.median(times)) / 2**20, 1)

    host = np.ones((8, 8, 180, 320, 2), np.float32)  # 29.5 MB upload
    dev = jax.device_put(host)
    jax.block_until_ready(dev)
    times = []
    for i in range(3):
        fresh_host = host + float(i + 1)  # new object + content per put
        t0 = time.perf_counter()
        dev = jax.device_put(fresh_host)
        jax.block_until_ready(dev)
        times.append(time.perf_counter() - t0)
    aux["h2d_mbps"] = round(host.nbytes / float(np.median(times)) / 2**20, 1)
    return d2h


def bench_torch_cpu(budget_s: float = 60.0):
    """Same rollout with the reference torch implementation on host CPU.

    Returns fps from the FASTEST single iteration, not the mean: box
    contention (the driver runs other jobs) can only slow iterations down,
    and a slowed baseline would inflate ``vs_baseline`` — observed swings of
    0.13..0.67 fps across otherwise-identical runs.  min-time is the most
    charitable-to-the-reference estimate, so the published ratio is the
    conservative one.
    """
    import torch

    sys.path.insert(0, "/root/reference")
    import types

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    from models.BMCNet import BMCNet as TorchBMCNet

    torch.set_num_threads(os.cpu_count() or 8)
    model = TorchBMCNet(SCALE, 128, 5).eval()
    x = torch.randn(1, 2, 2, H, W)
    with torch.no_grad():
        t = torch.zeros_like(x[:, 0:1, 0])
        o = t.repeat(1, SCALE * SCALE * 2, 1, 1)
        h = t.repeat(1, 128, 1, 1)
        hp = h.clone()
        hn = h.clone()
        h, hp, hn, pred = model(x, h, hp, hn, o, True)  # warm
        n = 0
        best = float("inf")
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget_s and n < 50:
            t1 = time.perf_counter()
            h, hp, hn, pred = model(x, h, hp, hn, pred, False)
            best = min(best, time.perf_counter() - t1)
            n += 1
    return 1.0 / best


# --------------------------------------------------------------------------
# child entry points
# --------------------------------------------------------------------------

def _write_state(state_file: str, aux: dict) -> None:
    # atomic rewrite so the polling parent never reads a torn file
    tmp = state_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aux, f)
    os.replace(tmp, state_file)


def child_tpu(state_file: str, budget_s: float) -> None:
    """Run the TPU measurements, checkpointing each metric as it lands.

    Ordered so the headline + VERDICT-required aux come first; the optional
    Pallas-route probes and extras run only while budget remains.  Writes
    ``_phase`` markers around plugin init so the parent watchdog can kill a
    child wedged there (the round-3 failure: axon answered the probe, then
    the child hung at init for the whole 1500 s stall budget) within
    ``BENCH_DEVICE_INIT_S`` instead.
    """
    aux: dict = {"_phase": "importing_jax"}
    _write_state(state_file, aux)

    if os.environ.get("BENCH_FAKE_CHIP"):
        # driver-window regression mode (tests/test_bench_artifact.py):
        # the full parent machinery runs — probe child, state-file polling,
        # watchdogs, emission, history — with the measurements themselves
        # stubbed instant, so `timeout 1500 python bench.py` pins the
        # exact rc=0 + parseable-last-line contract the driver enforces.
        aux.update({
            "_phase": "device_ok",
            "fps_bf16_serving": 1021.0,
            "fps_int8_serving": 1156.0,
            "fps_int8_b16": 1203.6,
            "b1_ms_per_window": 1.57,
            "train_iters_per_sec": 3.7,
            "fake_chip": True,
            "tpu_bench_complete": True,
        })
        _write_state(state_file, aux)
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    aux["_phase"] = "jax_imported"
    _write_state(state_file, aux)
    aux["_devices"] = repr(jax.devices())  # plugin init happens HERE
    aux["_phase"] = "device_ok"
    _write_state(state_file, aux)

    t_end = time.monotonic() + budget_s

    def record(name, fn, *, optional=False, reserve_s=120.0, cite=None):
        # `reserve_s` keeps headroom for the parent to collect partials.
        # `cite`: a committed docs/bench_runs decision record that already
        # answers this probe — a budget skip points the artifact reader at
        # it instead of silently re-measuring settled questions.
        if optional and time.monotonic() + reserve_s > t_end:
            aux[f"{name}_skipped"] = (
                f"budget; decision record: {cite}" if cite else "budget"
            )
            _write_state(state_file, aux)
            return
        try:
            aux[name] = round(float(fn()), 3)
        except Exception as e:  # a failed mode must not sink later metrics
            aux[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
        _write_state(state_file, aux)

    # HEADLINE-FIRST ordering (VERDICT r4 item 1b): the required set
    # (fp32/bf16/int8 fps, b1_ms_per_window, train_iters_per_sec) plus the
    # headline candidate int8@B16, then the cheap aux decompositions, then
    # ONE daemon config (the shipped default), and only then the
    # decision-record re-probes — each of those gated behind a reserve
    # large enough that a driver-window run (1380 s) skips it with a
    # citation to the committed artifact that already answers it.
    record("fps_bf16_serving", lambda: _rollout_fps(B, "bfloat16"))
    record("fps_int8_serving", lambda: _rollout_fps(B, "int8"))
    # int8's overhead-bound quantize passes amortize a little further at
    # B=16 (measured 1155 -> 1202 fps on v5e; B=32 regresses, and bf16 at
    # B=16 is WORSE than B=8 — only the int8 mode gets the wider candidate)
    record("fps_int8_b16", lambda: _rollout_fps(16, "int8"), optional=True,
           reserve_s=300.0)
    record("b1_ms_per_window", lambda: 1000.0 / _rollout_fps(1, "bfloat16", chunk=CHUNK_B1))
    record("train_iters_per_sec", lambda: bench_train_iters_per_sec())
    record("fps_fp32_serving", lambda: _rollout_fps(B, "float32"),
           optional=True, reserve_s=240.0)
    record(
        "train_iters_per_sec_bf16",
        lambda: bench_train_iters_per_sec(dtype_name="bfloat16"),
        optional=True, reserve_s=200.0,
    )
    # QAT cost at the same shapes (model;args;quant: qat): how much the
    # fake-quant + STE passes tax the bf16 train step
    record(
        "train_iters_per_sec_qat",
        lambda: bench_train_iters_per_sec(dtype_name="qat"),
        optional=True, reserve_s=200.0,
    )
    # true one-window-per-dispatch latency (reference's exact measurement
    # shape); on this attachment it is dominated by the ~33 ms tunnel
    # dispatch overhead — the amortized number above is the serving figure
    record(
        "b1_ms_single_dispatch",
        lambda: 1000.0 / _rollout_fps(1, "bfloat16", chunk=1),
        optional=True, reserve_s=150.0,
    )
    # the link-bandwidth decomposition (cheap, no compiles): shows WHY the
    # daemon numbers sit where they do on a tunneled attachment
    record("d2h_mbps", lambda: bench_link_mbps(aux), optional=True)
    # full-production-path rate: TCP daemon + deep ticks, in the shipped
    # configuration ONLY (f16 wire + fetch_chunks 4 — cli.serve's
    # auto-defaults for bf16 compute modes: lossless, both bandwidth
    # levers).  The full wire×chunks matrix is a settled decision record
    # (docs/bench_runs/r4_wire_chunks.json: i8×c4 fastest at 126.3 wps,
    # c8 a dead end on both dtypes) — re-probed below only when a manual
    # long-budget run leaves room.
    _WIRE_REC = "docs/bench_runs/r4_wire_chunks.json"
    record(
        "fps_daemon_loopback_f16_c4",
        lambda: _daemon_loopback_fps(
            wire_dtype="float16", aux=aux, fetch_chunks=4
        ),
        optional=True,
        reserve_s=450.0,
        cite=_WIRE_REC + " (f16_c4 86.6 wps) + BENCH_HISTORY 2026-08-20",
    )
    # ---- decision-record re-probes (manual BENCH_TOTAL_BUDGET_S>=3600
    # runs only; a driver-window run skips these WITH the citation) ----
    _ROUTE_REC = ("docs/DESIGN.md §6 (chain ties plain int8, chainq/p1x1 "
                  "regress, pconv/pall/pquant fail the axon remote-compile; "
                  "BENCH_HISTORY 2026-08-20)")
    record(
        "fps_daemon_loopback_i8_c4",
        lambda: _daemon_loopback_fps(wire_dtype="int8", aux=aux, fetch_chunks=4),
        optional=True, reserve_s=700.0, cite=_WIRE_REC,
    )
    record(
        "fps_daemon_loopback_c4",
        lambda: _daemon_loopback_fps(aux=aux, fetch_chunks=4),
        optional=True, reserve_s=700.0, cite=_WIRE_REC,
    )
    # quantize-pass attack modes (the act-quantize passes are 38% of the
    # int8 step): chained conv1->conv2 int8 epilogue / standalone Pallas
    # quantize / both (models/layers.QUANT_MODES, ops/pallas/quantize.py)
    record("fps_int8_chain", lambda: _rollout_fps(B, "int8_chain"),
           optional=True, reserve_s=600.0, cite=_ROUTE_REC)
    record("fps_int8_chain_b16", lambda: _rollout_fps(16, "int8_chain"),
           optional=True, reserve_s=600.0, cite=_ROUTE_REC)
    record("fps_int8_pquant", lambda: _rollout_fps(B, "int8_pquant"),
           optional=True, reserve_s=800.0, cite=_ROUTE_REC)
    record("fps_int8_chainq", lambda: _rollout_fps(B, "int8_chainq"),
           optional=True, reserve_s=800.0, cite=_ROUTE_REC)
    record("fps_int8_p1x1", lambda: _rollout_fps(B, "int8_p1x1"),
           optional=True, reserve_s=800.0, cite=_ROUTE_REC)
    record("fps_int8_pconv", lambda: _rollout_fps(B, "int8_pconv"),
           optional=True, reserve_s=900.0, cite=_ROUTE_REC)
    record("fps_int8_pall", lambda: _rollout_fps(B, "int8_pall"),
           optional=True, reserve_s=900.0, cite=_ROUTE_REC)
    aux["tpu_bench_complete"] = True
    _write_state(state_file, aux)


def child_cpu(state_file: str) -> None:
    """Chip-unavailable fallback: the same rollout with JAX on host CPU.

    A real execution of this framework's hot path (rasterize + model scan)
    so the emitted line still carries a machine-verified number on the same
    hardware as the torch baseline.  Launched by the parent with
    JAX_PLATFORMS unset and the axon site dropped from PYTHONPATH — with
    the plugin on the path, even CPU-pinned jobs hang while the tunnel is
    down (CLAUDE.md).
    """
    import jax

    jax.config.update("jax_platform_name", "cpu")
    # fp32 on CPU: bf16 is emulated there, which would understate the
    # framework vs the fp32 torch baseline on the same silicon
    aux = {"fps_jax_cpu": round(float(_rollout_fps(1, "float32", chunk=8)), 3)}
    _write_state(state_file, aux)


# --------------------------------------------------------------------------
# parent orchestration (never imports jax)
# --------------------------------------------------------------------------

def _wait_for_chip(budget_s: float, probe_timeout_s: float = 120.0) -> bool:
    """Probe until the tunneled TPU answers a trivial program, bounded.

    The axon attachment can go down for hours; during an outage ANY process
    that initializes the plugin hangs silently before printing a byte
    (CLAUDE.md).  Probing from a killable child keeps this process clean.
    Returns False (instead of exiting) when the budget runs out so the
    caller can emit the CPU-fallback line.
    """
    probe = (
        "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
        "print(float((x @ x).sum()))"
    )
    if os.environ.get("BENCH_FAKE_CHIP"):
        probe = "print('ok')"  # instant success through the real machinery
    deadline = time.monotonic() + budget_s
    while True:
        # deadline check BEFORE the attempt, and each wait capped by the
        # remaining budget: a zero/expired budget must not still burn a
        # full probe_timeout_s against the global deadline
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(
                f"bench: chip probe budget ({budget_s:.0f}s) exhausted — "
                "falling back to CPU-verified line",
                file=sys.stderr,
                flush=True,
            )
            return False
        # Popen + _CHILDREN (not subprocess.run) so the SIGTERM handler can
        # kill a probe wedged at plugin init — an orphaned axon client would
        # block every later chip job (single-client rule, CLAUDE.md)
        proc = subprocess.Popen(
            [sys.executable, "-c", probe],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        _CHILDREN.append(proc)
        try:
            rc = proc.wait(timeout=min(probe_timeout_s, remaining))
            if rc == 0:
                _CHILDREN.remove(proc)  # reaped; keep _CHILDREN == live
                return True
            raise subprocess.CalledProcessError(rc, "probe")
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            proc.kill()
            proc.wait()
            if proc in _CHILDREN:
                _CHILDREN.remove(proc)
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                print(
                    f"bench: chip probe failed for {budget_s:.0f}s — "
                    "falling back to CPU-verified line",
                    file=sys.stderr,
                    flush=True,
                )
                return False
            print("bench: chip not answering, retrying in 60s", file=sys.stderr, flush=True)
            time.sleep(min(60, max(remaining, 1)))


def _read_state(state_file: str) -> dict:
    try:
        with open(state_file) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _has_metric(state: dict) -> bool:
    """True once any real measurement key (not a ``_phase`` marker) landed."""
    return any(not k.startswith("_") for k in state)


def _run_child(
    mode: str, state_file: str, budget_s: float, stall_s: float,
    env=None, phase_aware: bool = False,
) -> dict:
    """Run a measurement child; kill it on wedge/stall/budget; return partials.

    Phase-aware policy (TPU child): a child that never reports
    ``_phase: device_ok`` is stuck at axon plugin init — kill it after
    ``DEVICE_INIT_S``.  A child with a device but no first metric gets
    ``FIRST_METRIC_S`` (cold bf16 compile is ~400 s).  After the first
    metric, ``stall_s`` applies between metrics.  All of it is additionally
    bounded by ``budget_s`` and the caller's global deadline.
    """
    args = [sys.executable, os.path.abspath(__file__), mode, state_file, str(budget_s)]
    # children report via the state file; their stdout goes to OUR stderr so
    # stray library prints can never pollute the parent's single JSON line
    proc = subprocess.Popen(args, env=env, cwd=_REPO, stdout=sys.stderr.fileno())
    _CHILDREN.append(proc)
    t0 = time.monotonic()
    t_end = t0 + budget_s
    t_device_ok = None
    last_change = t0
    last_mtime = 0.0
    try:
        while proc.poll() is None:
            time.sleep(5)
            now = time.monotonic()
            try:
                mtime = os.stat(state_file).st_mtime
            except OSError:
                mtime = 0.0
            if mtime != last_mtime:
                last_mtime, last_change = mtime, now
            state = _read_state(state_file) if phase_aware else {}
            if phase_aware and t_device_ok is None and state.get("_phase") == "device_ok":
                t_device_ok = now
            why = None
            if now > t_end:
                why = "budget"
            elif phase_aware and t_device_ok is None and now - t0 > DEVICE_INIT_S:
                why = "plugin-init wedge"
            elif phase_aware and t_device_ok is not None and not _has_metric(state) \
                    and now - t_device_ok > FIRST_METRIC_S:
                why = "no first metric"
            elif now - last_change > stall_s and (not phase_aware or _has_metric(state)):
                why = "stall"
            if why:
                print(f"bench: killing {mode} child ({why})", file=sys.stderr, flush=True)
                proc.kill()
                proc.wait()
                break
    finally:
        if proc in _CHILDREN:
            _CHILDREN.remove(proc)
    return _read_state(state_file)


def _cpu_env() -> dict:
    """Child env with the axon plugin fully out of the way (CLAUDE.md) —
    delegates to THE implementation in bmcnet_esr_tpu.utils.env."""
    from bmcnet_esr_tpu.utils.env import clean_cpu_subprocess_env

    return clean_cpu_subprocess_env(_REPO)


# shared with the SIGTERM/SIGINT handler: live children to kill, state
# files to harvest partials from, and a latch so the line prints once
_CHILDREN: list = []
_STATE_FILES: list = []
_EMITTED = False
_T_START = time.monotonic()
_DEADLINE = _T_START + TOTAL_BUDGET_S
_RESERVE_S = 120.0  # headroom for the torch baseline + emission + history


def _remaining() -> float:
    return _DEADLINE - time.monotonic()


def _load_last_good() -> dict | None:
    """Newest BENCH_HISTORY.jsonl entry with a numeric value — preferring
    full captures over degraded ones (a daemon-only partial must not
    displace the newest complete rollout headline)."""
    try:
        with open(HISTORY_PATH) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        fallback = None
        for ln in reversed(lines):
            entry = json.loads(ln)
            if not isinstance(entry.get("value"), (int, float)):
                continue
            if str(entry.get("metric", "")).startswith("degraded capture"):
                fallback = fallback or entry
                continue
            return entry
        return fallback
    except (OSError, json.JSONDecodeError):
        pass
    return None


def _append_history(line_obj: dict) -> None:
    entry = dict(line_obj)
    entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    entry["argv"] = " ".join(sys.argv)
    try:
        with open(HISTORY_PATH, "a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError:
        pass  # history is best-effort; the stdout line is the artifact


def _emit(aux: dict, status: str, torch_live=None) -> None:
    """Build and print THE one JSON line; append to history when measured.

    Callable from the normal path and from the signal handler — whichever
    runs first wins (``_EMITTED`` latch).
    """
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    aux = {k: v for k, v in aux.items() if not k.startswith("_")}
    aux.pop("tpu_bench_complete", None)

    # Conservative denominator: box contention can only slow the torch
    # baseline (inflating the ratio), so take the faster of the live
    # measurement and the best ever observed on this host
    # (TORCH_CPU_BEST_FPS above).  aux records both.
    fps_torch = TORCH_CPU_BEST_FPS
    if torch_live:
        fps_torch = max(torch_live, TORCH_CPU_BEST_FPS)
        aux["torch_cpu_fps_live"] = round(torch_live, 2)
    aux["torch_cpu_fps"] = round(fps_torch, 2)

    # headline: fastest serving config (int8 W8A8 3x3 convs when it wins,
    # else bf16 — both carry the same tested <5e-2 rel-RMSE drift bound;
    # fp32 remains the checkpoint-parity path)
    candidates = [
        (aux.get(k), label)
        for k, label in [
            ("fps_bf16_serving", "bfloat16"),
            ("fps_int8_serving", "int8"),
            ("fps_int8_b16", "int8@B16"),
            ("fps_int8_p1x1", "int8+pallas1x1"),
            ("fps_int8_pconv", "int8+pallas3x3"),
            ("fps_int8_pall", "int8+pallas-all"),
            ("fps_int8_pquant", "int8+pallas-quantize"),
            ("fps_int8_chain", "int8+chained-epilogue"),
            ("fps_int8_chainq", "int8+chain+pquant"),
            ("fps_int8_chain_b16", "int8+chain@B16"),
        ]
        if isinstance(aux.get(k), (int, float))
    ]
    if candidates:
        fps_best, mode = max(candidates)
        metric = (
            "x4 SR voxel-frames/sec/chip, full BMCNet (128ch/5blk), "
            "stateful stride-1 rollout incl. on-device rasterization, "
            "batched independent streams @45x80, fastest serving "
            f"mode ({mode}, <5e-2 drift bound vs fp32 parity path); "
            "vs_baseline = speedup over the reference torch impl on "
            "this host's CPU"
        )
        unit = "frames/sec"
        # numeric north star (BASELINE.json: ">=5x PyTorch-GPU"): the GPU
        # denominator is docs/DESIGN.md §8's ESTIMATED 120-250 fps band
        # (no CUDA in this environment) — flagged as an estimate
        aux["vs_gpu_est_low"] = round(fps_best / GPU_EST_BAND_FPS[1], 2)
        aux["vs_gpu_est_high"] = round(fps_best / GPU_EST_BAND_FPS[0], 2)
        aux["gpu_est_band_fps"] = list(GPU_EST_BAND_FPS)
    elif any(
        k.startswith("fps_") and k != "fps_jax_cpu"
        and isinstance(v, (int, float))
        for k, v in aux.items()
    ):
        # degraded headline: none of the rollout modes completed, but SOME
        # live fps measurement exists (e.g. the daemon/link stage landed
        # before the chip flapped).  An honest degraded number beats a
        # 'failed' artifact that hides a machine-verified measurement —
        # and keeps the line eligible for BENCH_HISTORY.
        fps_best, key = max(
            (v, k) for k, v in aux.items()
            if k.startswith("fps_") and k != "fps_jax_cpu"
            and isinstance(v, (int, float))
        )
        mode = key
        metric = (
            "degraded capture — the headline rollout modes did not "
            f"complete this run; best available live measurement: {key} "
            "(see aux for its definition); vs_baseline = that rate over "
            "the reference torch impl on this host's CPU"
        )
        unit = "frames/sec"
    elif isinstance(aux.get("fps_jax_cpu"), (int, float)):
        # child_cpu measures fp32 deliberately (bf16 is emulated on CPU and
        # would understate the framework vs the fp32 torch baseline)
        fps_best, mode = aux["fps_jax_cpu"], "fp32-on-host-CPU"
        metric = (
            "TPU chip unavailable this run — x4 SR voxel-frames/sec of the "
            "same rollout with JAX on host CPU (machine-verified fallback); "
            "vs_baseline = speedup over the reference torch impl on the "
            "same CPU"
        )
        unit = "frames/sec"
    else:
        fps_best, mode, metric, unit = None, None, (
            "bench could not execute the rollout this run (chip down); "
            "aux.last_good carries the newest committed measured line"
        ), "frames/sec"
        if status not in ("interrupted",):
            status = "failed"
    if not candidates:
        # live TPU capture failed: surface the newest committed measurement
        # so the artifact still answers the perf question, clearly labeled
        last_good = _load_last_good()
        if last_good is not None:
            aux["last_good"] = last_good
    vs = (fps_best / fps_torch) if (fps_best and fps_torch) else None
    aux["status"] = status
    aux["serving_mode"] = mode
    aux["vs_torch_cpu"] = round(vs, 2) if vs else None
    aux["bench_wall_s"] = round(time.monotonic() - _T_START, 1)
    aux["gpu_ceiling_note"] = (
        "no CUDA here; vs_gpu_est_low/high compare the headline to the "
        "ESTIMATED PyTorch-GPU band from exact per-window FLOPs "
        "(XLA cost analysis, docs/DESIGN.md #8)"
    )
    line = {
        "metric": metric,
        "value": round(fps_best, 2) if fps_best else None,
        "unit": unit,
        "vs_baseline": round(vs, 2) if vs else None,
        "aux": aux,
    }
    print(json.dumps(line), flush=True)
    if (
        status in ("ok", "partial")
        and isinstance(line["value"], (int, float))
        and not aux.get("fake_chip")  # regression-mode lines never commit
    ):
        _append_history(line)


def _harvest_partials() -> dict:
    aux: dict = {}
    for sf in _STATE_FILES:
        aux.update(_read_state(sf))
    return aux


def _on_signal(signum, frame):
    """SIGTERM/SIGINT (the driver's timeout sends SIGTERM before SIGKILL):
    kill children, emit the line with whatever partials exist, exit 0."""
    for proc in list(_CHILDREN):
        try:
            proc.kill()
        except OSError:
            pass
    aux = _harvest_partials()
    measured = any(
        k.startswith("fps") and isinstance(v, (int, float)) for k, v in aux.items()
    )
    aux["interrupted_by"] = signal.Signals(signum).name
    _emit(aux, status="partial" if measured else "interrupted")
    os._exit(0)


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    tmpdir = tempfile.mkdtemp(prefix="bench_state_")
    probe_budget = max(0.0, min(PROBE_BUDGET_S, _remaining() - _RESERVE_S))
    chip_ok = _wait_for_chip(probe_budget)

    aux: dict = {}
    status = "ok"
    if chip_ok:
        sf = os.path.join(tmpdir, "tpu.json")
        _STATE_FILES.append(sf)
        aux = _run_child(
            "--child-tpu", sf, max(0.0, _remaining() - _RESERVE_S), STALL_S,
            phase_aware=True,
        )
        measured = any(
            k.startswith("fps") and isinstance(v, (int, float))
            for k, v in aux.items()
        )
        if not measured and _remaining() > _RESERVE_S + 420 and _wait_for_chip(
            min(300.0, _remaining() - _RESERVE_S - 120)
        ):
            # the tunnel can flap: answer one probe, then wedge the child at
            # plugin init before ANY metric lands (observed).  If it answers
            # again now, the child gets ONE bounded retry.
            print("bench: empty first TPU attempt, chip answers — retrying once",
                  file=sys.stderr, flush=True)
            sf2 = os.path.join(tmpdir, "tpu2.json")
            _STATE_FILES.append(sf2)
            aux.update(_run_child(
                "--child-tpu", sf2, max(0.0, _remaining() - _RESERVE_S),
                STALL_S, phase_aware=True,
            ))
        complete = aux.get("tpu_bench_complete", False)
        # only NUMERIC fps entries count as measurements — fps_*_error /
        # fps_*_skipped markers must not mask a run where every rollout
        # failed (that run needs the CPU-verified fallback, not "partial")
        measured = any(
            k.startswith("fps") and isinstance(v, (int, float))
            for k, v in aux.items()
        )
        if not measured:
            status = "chip_unavailable"
        elif not complete:
            status = "partial"
    else:
        status = "chip_unavailable"
    if status == "chip_unavailable" and _remaining() > _RESERVE_S + 120:
        cpu_budget = min(900.0, _remaining() - _RESERVE_S)
        sf_cpu = os.path.join(tmpdir, "cpu.json")
        _STATE_FILES.append(sf_cpu)
        aux.update(_run_child("--child-cpu", sf_cpu, cpu_budget, cpu_budget,
                              env=_cpu_env()))

    torch_live = None
    if _remaining() > 30 and not os.environ.get("BENCH_FAKE_CHIP"):
        try:
            torch_live = bench_torch_cpu(budget_s=min(60.0, _remaining() - 15))
        except Exception:
            torch_live = None
    _emit(aux, status, torch_live)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child-tpu":
        child_tpu(sys.argv[2], float(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--child-cpu":
        child_cpu(sys.argv[2])
    else:
        main()
