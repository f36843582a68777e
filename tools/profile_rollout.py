"""Capture a jax.profiler trace of the serving rollout on the attached chip.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_rollout.py <mode> [outdir]

``mode``: bfloat16 | int8 | any int8_* quant mode from bench.py's map
(int8 variants run static-calibrated, the serving fast path).
Writes an xplane trace under ``outdir`` (default /tmp/jaxprof/<mode>) for
``tools/profile_report.py`` to summarize per-op.  Measurement tool, not
product surface; results land in docs/DESIGN.md.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/jaxprof/{mode}"
    os.makedirs(outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from bmcnet_esr_tpu.models import BMCNet, calibrate_act_scales
    from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

    B, H, W, SCALE, N, CHUNK = bench.B, bench.H, bench.W, bench.SCALE, bench.N_EVENTS, bench.CHUNK

    quant_map = {
        "int8": True, "int8_p1x1": "p1x1", "int8_pconv": "pconv",
        "int8_pall": "pall", "int8_pquant": "pquant",
        "int8_chain": "chain", "int8_chainq": "chainq",
    }
    if mode not in quant_map and mode != "bfloat16":
        # a typo must not silently profile the plain bf16 model and land in
        # DESIGN.md as an int8-route measurement (the misroute class the
        # quant-mode-on-module design exists to prevent)
        raise SystemExit(
            f"unknown mode {mode!r}; expected bfloat16 or one of {sorted(quant_map)}"
        )
    quant = quant_map.get(mode, False)
    model = BMCNet(scale=SCALE, n_c=128, n_b=5, dtype=jnp.bfloat16, quant=quant)
    x0 = jnp.zeros((B, 2, H, W, 2))
    carry0 = tuple(model.init_state(B, H, W))
    variables = model.init(jax.random.key(0), x0, *carry0)

    @jax.jit
    def chunk_rollout(variables, carry, events):
        frames = batch_events_to_counts(events, (H, W))
        pairs = jnp.stack([frames[:-1], frames[1:]], axis=1)

        def body(c, pair):
            x = jnp.moveaxis(pair, 0, 1)
            outs = model.apply(variables, x, *c)
            return tuple(outs), outs[-1]

        carry, preds = jax.lax.scan(body, carry, pairs)
        return carry, preds

    rng = np.random.default_rng(0)
    events = jnp.asarray(bench.random_windows(CHUNK + 1, B, H, W, N, rng))

    if quant:
        @jax.jit
        def _pairs(ev):
            fr = batch_events_to_counts(ev, (H, W))
            return jnp.stack([fr[:-1], fr[1:]], axis=2)

        variables = calibrate_act_scales(model, variables, _pairs(events[:17]), carry0, max_steps=16)

    carry = carry0
    carry, preds = chunk_rollout(variables, carry, events)  # compile + load
    _ = jax.device_get(preds[-1, 0, 0, 0])
    t0 = time.perf_counter()
    carry, preds = chunk_rollout(variables, carry, events)  # warm timing
    _ = jax.device_get(preds[-1, 0, 0, 0])
    warm = time.perf_counter() - t0
    print(f"warm chunk: {warm*1e3:.1f} ms -> {CHUNK*B/warm:.1f} fps", flush=True)

    with jax.profiler.trace(outdir):
        carry, preds = chunk_rollout(variables, carry, events)
        _ = jax.device_get(preds[-1, 0, 0, 0])
    print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
