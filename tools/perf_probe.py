"""One-off perf probes for the serving rollout on the attached TPU chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe.py <probe>

Probes:
  chunk   — chunk-size sweep of the bench rollout (re-checks the 512 plateau)
  int8    — raw conv throughput at serving shapes in bf16 vs int8
            (does XLA reach the int8 MXU path through lax.conv on this chip?)
  cost    — XLA cost analysis of the bench rollout (FLOPs, bytes, per-op)

These are measurement tools, not product surface; results land in
docs/DESIGN.md §6/§8.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np


def probe_chunk():
    import bench

    for chunk in (256, 512, 1024):
        fps = bench._rollout_fps(8, "bfloat16", chunk=chunk)
        print(f"chunk={chunk}: {fps:.1f} frames/sec", flush=True)


def probe_int8():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    B, H, W, C = 8, 45, 80, 128
    steps = 2048  # amortize the ~33 ms per-dispatch tunnel overhead

    def run(dtype, acc):
        x = jnp.asarray(np.random.default_rng(0).integers(-4, 4, (B, H, W, C)), dtype)
        k = jnp.asarray(np.random.default_rng(1).integers(-4, 4, (3, 3, C, C)), dtype)

        @jax.jit
        def f(x, k):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc,
                )
                return y.astype(dtype), ()

            y, _ = jax.lax.scan(body, x, None, length=steps)
            return y

        y = f(x, k)
        _ = jax.device_get(y.reshape(-1)[0])
        times = []
        for _i in range(4):
            t0 = time.perf_counter()
            y = f(x, k)
            _ = jax.device_get(y.reshape(-1)[0])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times[1:]))
        flops = 2 * steps * B * H * W * C * C * 9
        print(f"{dtype.__name__}: {dt*1e3:.2f} ms -> {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    run(jnp.bfloat16, jnp.float32)
    run(jnp.int8, jnp.int32)


def probe_cost():
    import jax
    import jax.numpy as jnp
    import bench
    from bmcnet_esr_tpu.models import BMCNet
    from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

    model = BMCNet(scale=4, n_c=128, n_b=5, dtype=jnp.bfloat16)
    B, H, W = 8, 45, 80
    x0 = jnp.zeros((B, 2, H, W, 2))
    carry0 = tuple(model.init_state(B, H, W))
    variables = model.init(jax.random.key(0), x0, *carry0)
    chunk = 512

    def chunk_rollout(variables, carry, events):
        frames = batch_events_to_counts(events, (H, W))
        pairs = jnp.stack([frames[:-1], frames[1:]], axis=1)

        def body(c, pair):
            x = jnp.moveaxis(pair, 0, 1)
            outs = model.apply(variables, x, *c)
            return tuple(outs), outs[-1]

        carry, preds = jax.lax.scan(body, carry, pairs)
        return carry, preds

    ev = jnp.zeros((chunk + 1, B, 4, 2048))
    lowered = jax.jit(chunk_rollout).lower(variables, carry0, ev)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", 0.0)
    bytes_ = cost.get("bytes accessed", 0.0)
    print(f"flops/chunk={flops:.3e}  bytes/chunk={bytes_:.3e}")
    print(f"flops/window={flops/(chunk*B):.3e}  arith intensity={flops/max(bytes_,1):.1f}")


if __name__ == "__main__":
    {"chunk": probe_chunk, "int8": probe_int8, "cost": probe_cost}[sys.argv[1]]()
