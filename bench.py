"""Headline benchmark: voxel-frames/sec/chip, full BMCNet x4, NFS shapes.

Measures the inference hot path on the attached TPU chip: stride-1 stateful
rollout (two consecutive 45x80 LR count windows in -> 180x320 HR count image
out) including on-device event rasterization, scanned in chunks exactly as
``bmcnet_esr_tpu.inference.engine`` runs it.  One window processed == one
voxel frame.

Baseline for ``vs_baseline``: the same architecture/rollout in PyTorch
(reference implementation semantics) on this host's CPU — the only
torch baseline measurable in this environment (no CUDA here).  The metric
string carries that caveat.  ``aux`` adds the other two axes:

* ``b1_ms_per_window`` — the reference's own eval metric (ms per forward at
  batch 1, stateful stride-1 rollout; ``infer_BMCNet.py:54-68``), measured
  as a chunked scan so the ~33 ms per-dispatch tunnel overhead amortizes
  (the honest serving number on this attachment).
* ``train_iters_per_sec`` — full NFS training recipe shapes (full BMCNet x4,
  batch 2, 9-window clips, 2048-event windows, BPTT + Adam(amsgrad), one
  XLA program per iteration).
* ``gpu_ceiling_note`` — context anchoring vs_baseline's torch-CPU basis to
  a GPU estimate from exact per-window FLOPs (docs/DESIGN.md §8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "aux"}.
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# persistent compilation cache: the axon remote-compile of the bf16 rollout
# takes ~400s cold, ~50s cached
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np


def _wait_for_chip(max_wait_s: float = 7200.0, probe_timeout_s: float = 120.0) -> None:
    """Block until the tunneled TPU answers a trivial program (or give up).

    The axon attachment can go down for hours; during an outage ANY process
    that initializes the plugin hangs silently before printing a byte
    (CLAUDE.md).  Probing from a killable child keeps this process clean:
    the first in-process jax import only happens after a probe succeeds, so
    an outage costs bounded retries instead of an unbounded hang.
    """
    probe = (
        "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
        "print(float((x @ x).sum()))"
    )
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", probe],
                timeout=probe_timeout_s,
                check=True,
                capture_output=True,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # exit, don't proceed: with the tunnel down the first
                # in-process jax import hangs forever before printing a byte
                # (CLAUDE.md) — a clear error beats a silent wedge
                print(
                    f"bench: chip probe failed for {max_wait_s:.0f}s — "
                    "giving up (tunnel down)",
                    file=sys.stderr,
                    flush=True,
                )
                sys.exit(3)
            print("bench: chip not answering, retrying in 5 min", file=sys.stderr, flush=True)
            time.sleep(min(300, max(remaining, 1)))

B = 8          # batched independent streams per chip
H, W = 45, 80  # NFS down8 input resolution
SCALE = 4
N_EVENTS = 2048
CHUNK = 512    # windows per scan chunk (amortizes ~33 ms per-dispatch overhead;
               # measured on v5e: 64 -> 895 fps, 128 -> 914, 256 -> 926, 512 -> 932)
CHUNK_B1 = 256 # batch-1 latency chunk (64 -> 1.96 ms/window, 256 -> 1.62)
N_CHUNKS_TIMED = 3


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


def bench_tpu(dtype_name: str = "bfloat16"):
    """Throughput of the serving path (bf16 compute, fp32 params)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return _rollout_fps(B, dtype_name)


def bench_b1_latency(dtype_name: str = "bfloat16") -> float:
    """ms per window at batch 1 — the reference's eval metric
    (infer_BMCNet.py:54-68), amortized over a scan chunk."""
    fps = _rollout_fps(1, dtype_name, chunk=CHUNK_B1)
    return 1000.0 / fps


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
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = BMCNet(scale=SCALE, n_c=128, n_b=5, dtype=dtype)
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


def bench_torch_cpu(budget_s: float = 60.0):
    """Same rollout with the reference torch implementation on host CPU."""
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
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget_s and n < 50:
            h, hp, hn, pred = model(x, h, hp, hn, pred, False)
            n += 1
        dt = time.perf_counter() - t0
    return n / dt


def main():
    _wait_for_chip()
    fps_tpu = bench_tpu()
    fps_int8 = _rollout_fps(B, "int8")
    # int8's overhead-bound quantize passes amortize a little further at
    # B=16 (measured 1155 -> 1202 fps on v5e; B=32 regresses, and bf16 at
    # B=16 is WORSE than B=8 — only the int8 mode gets the wider candidate)
    fps_int8_b16 = _rollout_fps(16, "int8")
    # NOTE: the Pallas int8 probes were measured and LOST on v5e (p1x1:
    # 914 fps vs 1155 XLA; pconv: see ops/pallas/qconv.py STATUS) — they
    # stay available as quant modes for manual probes but are not
    # candidates here.
    b1_ms = bench_b1_latency()
    # true one-window-per-dispatch latency (reference's exact measurement
    # shape); on this attachment it is dominated by the ~33 ms tunnel
    # dispatch overhead — the amortized number above is the serving figure
    b1_ms_single = 1000.0 / _rollout_fps(1, chunk=1)
    train_ips = bench_train_iters_per_sec()
    train_ips_bf16 = bench_train_iters_per_sec(dtype_name="bfloat16")
    try:
        fps_torch = bench_torch_cpu()
    except Exception:
        fps_torch = None
    # headline: fastest serving config (int8 W8A8 3x3 convs when it wins,
    # else bf16 — both carry the same tested <5e-2 rel-RMSE drift bound;
    # fp32 remains the checkpoint-parity path)
    candidates = [
        (fps_tpu, "bfloat16"),
        (fps_int8, "int8"),
        (fps_int8_b16, "int8@B16"),
    ]
    fps_best, mode = max(candidates)
    vs = (fps_best / fps_torch) if fps_torch else None
    print(
        json.dumps(
            {
                "metric": (
                    "x4 SR voxel-frames/sec/chip, full BMCNet (128ch/5blk), "
                    "stateful stride-1 rollout incl. on-device rasterization, "
                    "batched independent streams @45x80, fastest serving "
                    f"mode ({mode}, <5e-2 drift bound vs fp32 parity path); "
                    "vs_baseline = speedup over the reference torch impl on "
                    "this host's CPU"
                ),
                "value": round(fps_best, 2),
                "unit": "frames/sec",
                "vs_baseline": round(vs, 2) if vs else None,
                "aux": {
                    "serving_mode": mode,
                    "fps_bf16_serving": round(fps_tpu, 2),
                    "fps_int8_serving": round(fps_int8, 2),
                    "fps_int8_b16": round(fps_int8_b16, 2),
                    "b1_ms_per_window": round(b1_ms, 3),
                    "b1_ms_single_dispatch": round(b1_ms_single, 2),
                    "train_iters_per_sec": round(train_ips, 2),
                    "train_iters_per_sec_bf16": round(train_ips_bf16, 2),
                    "torch_cpu_fps": round(fps_torch, 2) if fps_torch else None,
                    "gpu_ceiling_note": (
                        "no CUDA here; vs an ESTIMATED PyTorch-GPU ceiling "
                        "from exact per-window FLOPs (XLA cost analysis, "
                        "docs/DESIGN.md #8) this is ~4-7x"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
