"""AOT serving bundle: export -> deserialize -> serve equals the live
StreamingSR rollout bit-for-bit (same jitted step, weights via npz)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from bmcnet_esr_tpu.inference.export import ExportedStream, export_serving_bundle
from bmcnet_esr_tpu.inference.streaming import StreamingSR
from bmcnet_esr_tpu.models import BMCNet, BMCNetPlain

RES = (12, 10)
WINDOW = 96


def make_windows(n, batch=None, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        shape = (4, WINDOW) if batch is None else (batch, 4, WINDOW)
        ev = np.zeros(shape, np.float32)
        ev[..., 0, :] = rng.integers(0, RES[1], shape[:-2] + (WINDOW,))
        ev[..., 1, :] = rng.integers(0, RES[0], shape[:-2] + (WINDOW,))
        ev[..., 2, :] = np.sort(rng.random(shape[:-2] + (WINDOW,)), axis=-1)
        ev[..., 3, :] = rng.integers(0, 2, shape[:-2] + (WINDOW,)) * 2 - 1
        out.append(ev)
    return out


def init_variables(model, batch=1):
    import jax

    x = jnp.zeros((batch, 2, *RES, 2))
    return model.init(jax.random.PRNGKey(0), x, *model.init_state(batch, *RES))


@pytest.mark.slow
class TestServingBundle:
    @pytest.mark.parametrize("cls", [BMCNetPlain, BMCNet])
    def test_bundle_matches_live_stream(self, cls, tmp_path):
        model = cls(scale=2, n_c=8, n_b=2)
        variables = init_variables(model)
        out = export_serving_bundle(
            model, variables, str(tmp_path / "bundle"), RES, window_size=WINDOW
        )

        live = StreamingSR(model, variables, RES, window_size=WINDOW)
        served = ExportedStream(out)
        assert served.meta["variant"] == cls.__name__

        for i, ev in enumerate(make_windows(4)):
            a = live.push(ev)
            b = served.push(ev)
            if i == 0:
                assert a is None and b is None
                continue
            np.testing.assert_array_equal(a, b[0], err_msg=f"window {i}")
        assert served.windows_seen == live.windows_seen == 4

    def test_bundle_files_and_meta(self, tmp_path):
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        variables = init_variables(model)
        out = export_serving_bundle(
            model, variables, str(tmp_path / "b"), RES, window_size=WINDOW
        )
        assert sorted(os.listdir(out)) == ["meta.json", "step.hlo", "variables.npz"]
        meta = json.load(open(os.path.join(out, "meta.json")))
        assert meta["inp_resolution"] == list(RES)
        assert meta["window_size"] == WINDOW
        assert meta["scale"] == 2 and meta["n_b"] == 2
        assert "cpu" in meta["platforms"]
        # weights round-trip the flatten/unflatten exactly
        with np.load(os.path.join(out, "variables.npz")) as z:
            assert all("//" in k or k for k in z.files)

    def test_batched_bundle(self, tmp_path):
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        variables = init_variables(model, batch=3)
        out = export_serving_bundle(
            model, variables, str(tmp_path / "b3"), RES, window_size=WINDOW, batch=3
        )
        served = ExportedStream(out)
        preds = [served.push(ev) for ev in make_windows(3, batch=3, seed=5)]
        assert preds[0] is None
        assert preds[1].shape == (3, RES[0] * 2, RES[1] * 2, 2)
        # batch lanes are independent streams: lane 0 equals a solo rollout
        solo = ExportedStream(
            export_serving_bundle(
                model, variables, str(tmp_path / "b1"), RES, window_size=WINDOW, batch=1
            )
        )
        for ev, want in zip(make_windows(3, batch=3, seed=5), preds):
            got = solo.push(ev[0])
            if want is not None:
                np.testing.assert_allclose(got[0], want[0], atol=1e-6, rtol=1e-6)

    def test_reset_restarts_stream(self, tmp_path):
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        variables = init_variables(model)
        out = export_serving_bundle(
            model, variables, str(tmp_path / "b"), RES, window_size=WINDOW
        )
        served = ExportedStream(out)
        wins = make_windows(3, seed=9)
        first = [served.push(ev) for ev in wins]
        served.reset()
        second = [served.push(ev) for ev in wins]
        assert first[0] is None and second[0] is None
        np.testing.assert_array_equal(first[1], second[1])
        np.testing.assert_array_equal(first[2], second[2])

    def test_int8_bundle_with_calibrated_scales(self, tmp_path):
        """The quant serving mode exports: dynamic scales bake into the
        program; calibrated static scales ride the variables npz as the
        ``quant`` collection and the exported program uses them."""
        import jax

        from bmcnet_esr_tpu.models.quant import calibrate_act_scales

        model = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16, quant=True)
        variables = init_variables(model)

        # calibrate on a couple of count-window pairs (engine layout [S,B,2,H,W,2])
        from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

        wins = make_windows(3, seed=11)
        frames = [batch_events_to_counts(jnp.asarray(ev)[None], RES) for ev in wins]
        pairs = jnp.stack(
            [jnp.stack([frames[i][0], frames[i + 1][0]])[None] for i in range(2)]
        )  # [2, 1, 2, H, W, 2]
        carry = tuple(model.init_state(1, *RES))
        calibrated = calibrate_act_scales(model, variables, pairs, carry)
        assert "quant" in calibrated

        out = export_serving_bundle(
            model, calibrated, str(tmp_path / "q"), RES, window_size=WINDOW
        )
        live = StreamingSR(model, calibrated, RES, window_size=WINDOW)
        served = ExportedStream(out)
        assert served.meta["quant"] is True
        assert served.meta["quant_mode"] == "xla"
        for i, ev in enumerate(make_windows(4, seed=12)):
            a, b = live.push(ev), served.push(ev)
            if a is not None:
                np.testing.assert_array_equal(
                    np.asarray(a, np.float32), np.asarray(b[0], np.float32),
                    err_msg=f"window {i}",
                )

    def test_int8_batched_lanes_equal_solo_bundle(self, tmp_path):
        """Dynamic int8 bundles with batch > 1: activation scales are
        per-lane (QuantConv), so each exported lane computes exactly what a
        batch=1 bundle would on the same stream — lanes never couple."""
        model = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16, quant=True)
        variables = init_variables(model)
        b2 = ExportedStream(export_serving_bundle(
            model, variables, str(tmp_path / "qb2"), RES,
            window_size=WINDOW, batch=2,
        ))
        b1 = ExportedStream(export_serving_bundle(
            model, variables, str(tmp_path / "qb1"), RES,
            window_size=WINDOW, batch=1,
        ))
        wins = make_windows(3, batch=2, seed=31)
        for ev in wins:
            # lane magnitudes differ wildly (lane 1 piles every event on one
            # pixel -> huge count): a shared per-tensor max would visibly
            # distort lane 0's quantization
            ev[1, 0, :] = 3
            ev[1, 1, :] = 4
        batched = [b2.push(ev) for ev in wins]
        for lane in range(2):
            b1.reset()
            solo = [b1.push(ev[lane]) for ev in wins]
            for got, want in zip(batched[1:], solo[1:]):
                np.testing.assert_array_equal(got[lane], want[0])

    def test_cli_int8_calibrates_static_scales(self, tmp_path):
        """CLI --dtype int8 --calib_h5 bakes static scales into the bundle
        and meta records them."""
        import json
        import os as _os

        from bmcnet_esr_tpu.cli.export import main
        from bmcnet_esr_tpu.data.packager import write_synthetic_fixture

        golden = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "goldens", "plain_small.npz"
        )
        out = str(tmp_path / "bundle_q")
        h5 = str(tmp_path / "calib.h5")
        write_synthetic_fixture(
            h5, sensor_resolution=RES, prefixes=("ori",),
            events_per_scale={"ori": WINDOW * 6}, seed=5,
        )
        main([
            "--model_path", golden, "--output_path", out,
            "--variant", "plain", "--scale", "2", "--n_c", "8", "--n_b", "2",
            "--height", str(RES[0]), "--width", str(RES[1]),
            "--window", str(WINDOW), "--dtype", "int8", "--batch", "2",
            "--calib_h5", h5, "--calib_windows", "3",
        ])
        with open(_os.path.join(out, "meta.json")) as f:
            meta = json.load(f)
        assert meta["quant"] is True and meta["quant_static"] is True
        with np.load(_os.path.join(out, "variables.npz")) as z:
            assert any(k.startswith("quant") for k in z.files)

    def test_cli_export_from_golden_checkpoint(self, tmp_path, capsys):
        """CLI drives checkpoint-load -> export; bundle loads and serves."""
        import os as _os

        from bmcnet_esr_tpu.cli.export import main

        golden = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "goldens", "plain_small.npz"
        )
        out = str(tmp_path / "bundle")
        main([
            "--model_path", golden, "--output_path", out,
            "--variant", "plain", "--scale", "2", "--n_c", "8", "--n_b", "2",
            "--height", str(RES[0]), "--width", str(RES[1]),
            "--window", str(WINDOW),
        ])
        assert "wrote serving bundle" in capsys.readouterr().out
        served = ExportedStream(out)
        preds = [served.push(ev) for ev in make_windows(3, seed=2)]
        assert preds[0] is None and preds[2].shape == (1, RES[0] * 2, RES[1] * 2, 2)
        assert np.isfinite(preds[2]).all()

    def test_wrong_batch_and_overflow_rejected(self, tmp_path):
        model = BMCNetPlain(scale=2, n_c=8, n_b=2)
        variables = init_variables(model)
        out = export_serving_bundle(
            model, variables, str(tmp_path / "b"), RES, window_size=WINDOW
        )
        served = ExportedStream(out)
        with pytest.raises(ValueError, match="batch"):
            served.push(np.zeros((2, 4, WINDOW), np.float32))
        with pytest.raises(ValueError, match="exceeds window_size"):
            served.push(np.zeros((4, WINDOW + 1), np.float32))
