"""Headline benchmark: voxel-frames/sec/chip, full BMCNet x4, NFS shapes.

Measures the inference hot path on the attached TPU chip: stride-1 stateful
rollout (two consecutive 45x80 LR count windows in -> 180x320 HR count image
out) including on-device event rasterization, scanned in chunks exactly as
``bmcnet_esr_tpu.inference.engine`` runs it.  One window processed == one
voxel frame.

Baseline for ``vs_baseline``: the same architecture/rollout in PyTorch
(reference implementation semantics) on this host's CPU — the only
torch baseline measurable in this environment (no CUDA here).  The metric
string carries that caveat.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# persistent compilation cache: the axon remote-compile of the bf16 rollout
# takes ~400s cold, ~50s cached
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np

B = 8          # batched independent streams per chip
H, W = 45, 80  # NFS down8 input resolution
SCALE = 4
N_EVENTS = 2048
CHUNK = 64     # windows per scan chunk (amortizes ~33 ms per-dispatch overhead)
N_CHUNKS_TIMED = 3


def random_windows(count, batch, h, w, n, rng):
    ev = np.zeros((count, batch, 4, n), np.float32)
    ev[..., 0, :] = rng.integers(0, w, (count, batch, n))
    ev[..., 1, :] = rng.integers(0, h, (count, batch, n))
    ev[..., 2, :] = np.sort(rng.random((count, batch, n)), -1)
    ev[..., 3, :] = rng.integers(0, 2, (count, batch, n)) * 2 - 1
    return ev


def bench_tpu(dtype_name: str = "bfloat16"):
    """Throughput of the serving path (bf16 compute, fp32 params)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bmcnet_esr_tpu.models import BMCNet
    from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = BMCNet(scale=SCALE, n_c=128, n_b=5, dtype=dtype)
    x0 = jnp.zeros((B, 2, H, W, 2))
    carry0 = tuple(model.init_state(B, H, W))
    variables = model.init(jax.random.key(0), x0, *carry0)

    @jax.jit
    def chunk_rollout(variables, carry, events):  # events [CHUNK+1, B, 4, N]
        frames = batch_events_to_counts(events, (H, W))  # [C+1, B, H, W, 2]
        pairs = jnp.stack([frames[:-1], frames[1:]], axis=1)  # [C, 2, B, ...]

        def body(c, pair):
            x = jnp.moveaxis(pair, 0, 1)  # [B, 2, H, W, 2]
            outs = model.apply(variables, x, *c)
            return tuple(outs), outs[-1]

        carry, preds = jax.lax.scan(body, carry, pairs)
        return carry, preds

    rng = np.random.default_rng(0)
    events = jnp.asarray(random_windows(CHUNK + 1, B, H, W, N_EVENTS, rng))

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
    return CHUNK * B / dt


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
    fps_tpu = bench_tpu()
    try:
        fps_torch = bench_torch_cpu()
    except Exception:
        fps_torch = None
    vs = (fps_tpu / fps_torch) if fps_torch else None
    print(
        json.dumps(
            {
                "metric": (
                    "x4 SR voxel-frames/sec/chip, full BMCNet (128ch/5blk), "
                    "stateful stride-1 rollout incl. on-device rasterization, "
                    f"B={B} streams @45x80; vs_baseline = speedup over the "
                    "reference torch impl on this host's CPU"
                ),
                "value": round(fps_tpu, 2),
                "unit": "frames/sec",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
