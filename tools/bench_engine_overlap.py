"""A/B the engine's h2d/compute overlap on the attached chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_engine_overlap.py

Builds an NFS-scale synthetic multi-scale h5 (560k down8 / ~9M down2 events,
the docs/DESIGN.md §6b measurement shape: ~545 stride-1 windows), rolls the
full BMCNet over it through ``InferenceEngine.infer_file`` with
``h2d_overlap`` off and on (same compiled programs — the knob only moves the
``device_put`` enqueue), and prints the mean per-window ``time`` metric for
each.  Measurement tool, not product surface; results land in DESIGN §6b.
"""

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))


def main():
    # THE blessed cache helper (CLAUDE.md): makedirs + min-compile-time too
    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bmcnet_esr_tpu.data.h5dataset import DatasetConfig
    from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
    from bmcnet_esr_tpu.inference.engine import InferenceEngine
    from bmcnet_esr_tpu.models import BMCNet

    print("devices:", jax.devices(), flush=True)

    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        path = sys.argv[1]  # reuse a previously written fixture
    else:
        path = os.path.join(tempfile.mkdtemp(prefix="ovl_"), "nfs_scale.h5")
        write_synthetic_fixture(
            path,
            sensor_resolution=(360, 640),
            prefixes=("down2", "down8"),
            events_per_scale={"down2": 9_000_000, "down8": 560_000},
            seed=7,
        )
    print("fixture:", path, flush=True)

    cfg = DatasetConfig(
        scale=4, ori_scale="down8", window=2048, sliding_window=1024,
        need_gt_events=True,
    )
    model = BMCNet(scale=4, n_c=128, n_b=5)
    x = jnp.zeros((1, 2, 45, 80, 2), jnp.float32)
    st = tuple(model.init_state(1, 45, 80))
    variables = model.init(jax.random.key(0), x, *st)

    # one warm-up with each program count, then ALTERNATE off/on so tunnel
    # drift of the minute lands on both sides; report per-side medians
    offs, ons = [], []
    seq = [("warm", True)] + [("off", False), ("on", True)] * 3
    for label, overlap in seq:
        eng = InferenceEngine(
            model, variables, cfg, chunk_size=64, visualize=False,
            h2d_overlap=overlap,
        )
        r = eng.infer_file(path)
        print(f"overlap={label}: time {r['time']:.3f} ms/window "
              f"(esr_mse {r['esr_mse']:.5f})", flush=True)
        if label == "off":
            offs.append(r["time"])
        elif label == "on":
            ons.append(r["time"])

    off = sorted(offs)[len(offs) // 2]
    on = sorted(ons)[len(ons) // 2]
    print(f"RESULT: off median {off:.3f} ms (runs {offs}) -> on median "
          f"{on:.3f} ms (runs {ons}) ({(off - on) / off * 100:.1f}% less)",
          flush=True)


if __name__ == "__main__":
    main()
