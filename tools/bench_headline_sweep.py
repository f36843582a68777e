"""Round-5 headline attack: sweep the untried levers above int8@B16.

VERDICT r4 item 2: the headline has sat at ~1203.6 fps (int8@B16) for four
rounds — 4.81x the estimated PyTorch-GPU band's top, 4 % short of the >=5x
north star.  DESIGN §6 pins the known dead ends (B=32 plain int8 regresses,
chain ties, Pallas routes lose or fail remote-compile); this tool measures
the levers that have NOT been tried, on the real chip:

* ``pipe``   — pipelined dispatch: enqueue N chunks back-to-back, one sync
  at the end (steady-state serving throughput; the per-chunk device_get in
  the bench loop serializes a tunnel round-trip into every chunk).
* ``donate`` — ``donate_argnums`` on the recurrent carry: lets XLA write
  the new (h, hp, hn, pred) in place instead of fresh buffers (the xplane
  trace bills ~3 % to "HR-prediction carry" layout copies, DESIGN §6).
* ``prepair``— build scan inputs as [C, B, 2, H, W, 2] so the body feeds
  ``model.apply`` directly instead of a per-step ``moveaxis`` transpose.
* batch 32/64 with the above (the old B=32 regression was measured without
  them), chain mode at B=32, and chunk 1024.

Usage (single-client rule — nothing else may hold the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_headline_sweep.py

Writes docs/bench_runs/r5_batch_sweep.json incrementally (one entry per
variant the moment it lands) so a tunnel drop mid-sweep still leaves a
decision record.  Overall deadline via SWEEP_BUDGET_S (default 5400 s).
Measurement tool, not product surface; results land in DESIGN §6.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

OUT = os.path.join(_REPO, "docs", "bench_runs", "r5_batch_sweep.json")
BUDGET_S = float(os.environ.get("SWEEP_BUDGET_S", 5400))


def rollout_fps_v(
    batch, quant_mode=True, chunk=512, donate=False, prepair=False,
    pipelined=False, n_timed=3,
):
    """bench._rollout_fps (bench.py:119) parameterized by the r5 levers."""
    import jax
    import jax.numpy as jnp

    import bench
    from bmcnet_esr_tpu.models import BMCNet, calibrate_act_scales
    from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

    H, W, SCALE, N_EVENTS = bench.H, bench.W, bench.SCALE, bench.N_EVENTS
    model = BMCNet(scale=SCALE, n_c=128, n_b=5, dtype=jnp.bfloat16, quant=quant_mode)
    x0 = jnp.zeros((batch, 2, H, W, 2))
    carry0 = tuple(model.init_state(batch, H, W))
    variables = model.init(jax.random.key(0), x0, *carry0)

    def chunk_rollout(variables, carry, events):  # events [chunk+1, B, 4, N]
        frames = batch_events_to_counts(events, (H, W))  # [C+1, B, H, W, 2]
        if prepair:
            pairs = jnp.stack([frames[:-1], frames[1:]], axis=2)  # [C, B, 2, ...]

            def body(c, x):  # x already [B, 2, H, W, 2]
                outs = model.apply(variables, x, *c)
                return tuple(outs), outs[-1]
        else:
            pairs = jnp.stack([frames[:-1], frames[1:]], axis=1)  # [C, 2, B, ...]

            def body(c, pair):
                x = jnp.moveaxis(pair, 0, 1)
                outs = model.apply(variables, x, *c)
                return tuple(outs), outs[-1]

        carry, preds = jax.lax.scan(body, carry, pairs)
        return carry, preds

    chunk_rollout = jax.jit(
        chunk_rollout, donate_argnums=(1,) if donate else ()
    )

    import numpy as np

    rng = np.random.default_rng(0)
    events = jnp.asarray(
        bench.random_windows(chunk + 1, batch, H, W, N_EVENTS, rng)
    )

    @jax.jit
    def _pairs(ev):
        fr = batch_events_to_counts(ev, (H, W))
        return jnp.stack([fr[:-1], fr[1:]], axis=2)  # [S, B, 2, H, W, 2]

    variables = calibrate_act_scales(
        model, variables, _pairs(events[:17]), carry0, max_steps=16
    )

    carry = carry0
    carry, preds = chunk_rollout(variables, carry, events)  # compile + exec
    _ = jax.device_get(preds[-1, 0, 0, 0])

    if pipelined:
        # steady-state throughput: back-to-back dispatches, one sync.
        # (The engine/daemon likewise keep the device queue non-empty.)
        carry, preds = chunk_rollout(variables, carry, events)  # warm queue
        _ = jax.device_get(preds[-1, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(n_timed):
            carry, preds = chunk_rollout(variables, carry, events)
        _ = jax.device_get(preds[-1, 0, 0, 0])
        dt = (time.perf_counter() - t0) / n_timed
    else:
        times = []
        for _ in range(n_timed + 1):
            t0 = time.perf_counter()
            carry, preds = chunk_rollout(variables, carry, events)
            _ = jax.device_get(preds[-1, 0, 0, 0])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times[1:]))
    return chunk * batch / dt


def main():
    # THE blessed cache helper (CLAUDE.md): makedirs + min-compile-time too
    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    print("devices:", jax.devices(), flush=True)

    t_end = time.monotonic() + BUDGET_S
    results = {"_note": (
        "r5 headline sweep (tools/bench_headline_sweep.py): int8 static-scale "
        "rollout fps by batch/levers; pipe=pipelined dispatch, pp=prepaired "
        "scan layout. Baseline to beat: 1203.6 (BENCH_HISTORY int8@B16). "
        "B64 runs chunk=256 (preds buffer would exceed HBM at 512). "
        "donate_argnums on the carry is UNUSABLE on this attachment: a "
        "donated execute raises TPU-backend INVALID_ARGUMENT or hangs the "
        "axon client outright (isolated 1024x1024 probe, 2026-08-21) — "
        "every donate variant below records that, not a model property."
    )}
    if os.path.exists(OUT):  # merge: a tunnel drop mid-sweep resumes here
        try:
            with open(OUT) as f:
                prev = json.load(f)
            prev.pop("_note", None)
            results.update(prev)
        except (OSError, json.JSONDecodeError):
            pass

    def save():
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")

    # ordered by information value per compile-second; every entry gated on
    # remaining budget (remote compiles of new programs run minutes each)
    variants = [
        # name, kwargs, est_cost_s
        ("base_b16", dict(batch=16), 180),                      # cached replica
        ("pipe_b16", dict(batch=16, pipelined=True), 120),      # same program
        ("pp_pipe_b16", dict(batch=16, prepair=True, pipelined=True), 420),
        ("pp_pipe_b32", dict(batch=32, prepair=True, pipelined=True), 600),
        ("pp_pipe_b64_c256", dict(batch=64, chunk=256, prepair=True,
                                  pipelined=True), 900),
        ("chain_pp_pipe_b32", dict(batch=32, quant_mode="chain",
                                   prepair=True, pipelined=True), 600),
        ("pp_pipe_b16_c1024", dict(batch=16, chunk=1024, prepair=True,
                                   pipelined=True), 600),
    ]
    for name, kw, est in variants:
        if name in results:
            continue  # already captured by a previous (partial) run
        if time.monotonic() + est > t_end:
            results[f"{name}_skipped"] = "budget"
            save()
            continue
        t0 = time.perf_counter()
        try:
            fps = rollout_fps_v(**kw)
            results[name] = round(fps, 1)
            print(f"{name}: {fps:.1f} fps ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            results[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name}: FAILED {e}", flush=True)
        save()

    print("RESULT:", json.dumps({k: v for k, v in results.items()
                                 if not k.startswith("_")}), flush=True)


if __name__ == "__main__":
    main()
