"""StreamPool: continuous batching of live streams must reproduce solo
StreamingSR rollouts exactly through attach/idle/detach/slot-reuse churn.

The pool is the serving multiplexer (one jitted step of static shape, masked
in-graph state carry); the reference's serving shape is one stream per
process (`infer_BMCNet.py:45-64`), so the correctness oracle is the solo
streaming rollout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.inference.streaming import StreamingSR, StreamPool
from bmcnet_esr_tpu.models import BMCNetPlain

RES = (16, 16)
WINDOW = 64


@pytest.fixture(scope="module")
def model_vars():
    model = BMCNetPlain(scale=2, n_c=8, n_b=2)
    h, w = RES
    dummy = jnp.zeros((1, 2, h, w, 2))
    variables = model.init(jax.random.key(3), dummy, *model.init_state(1, h, w))
    return model, variables


def make_windows(rng, count, n=48):
    out = []
    for _ in range(count):
        ev = np.zeros((4, n), np.float32)
        ev[0] = rng.integers(0, RES[1], n)
        ev[1] = rng.integers(0, RES[0], n)
        ev[2] = np.sort(rng.random(n))
        ev[3] = rng.integers(0, 2, n) * 2 - 1
        out.append(ev)
    return out


def solo_preds(model, variables, windows):
    s = StreamingSR(model, variables, RES, window_size=WINDOW)
    return [s.push(w) for w in windows]


class TestStreamPool:
    def test_churn_matches_solo(self, model_vars):
        """Interleaved attach/idle/detach with slot reuse: every stream's
        predictions equal its solo rollout."""
        model, variables = model_vars
        rng = np.random.default_rng(0)
        wins = {k: make_windows(rng, n) for k, n in (("a", 4), ("b", 3), ("c", 3))}

        pool = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        got = {k: [] for k in wins}

        a = pool.attach()
        got["a"].append(pool.push({a: wins["a"][0]}).get(a))
        b = pool.attach()
        assert pool.free_slots == 0
        out = pool.push({a: wins["a"][1], b: wins["b"][0]})
        got["a"].append(out.get(a)); got["b"].append(out.get(b))
        got["a"].append(pool.push({a: wins["a"][2]}).get(a))  # b idles
        out = pool.push({a: wins["a"][3], b: wins["b"][1]})
        got["a"].append(out.get(a)); got["b"].append(out.get(b))
        pool.detach(a)
        c = pool.attach()
        assert c == a  # slot reuse
        out = pool.push({c: wins["c"][0], b: wins["b"][2]})
        got["c"].append(out.get(c)); got["b"].append(out.get(b))
        got["c"].append(pool.push({c: wins["c"][1]}).get(c))
        got["c"].append(pool.push({c: wins["c"][2]}).get(c))

        for k in wins:
            want = solo_preds(model, variables, wins[k])
            assert len(got[k]) == len(want)
            for g, w in zip(got[k], want):
                if w is None:
                    assert g is None
                else:
                    np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    def test_guards(self, model_vars):
        model, variables = model_vars
        pool = StreamPool(model, variables, RES, slots=1, window_size=WINDOW)
        s = pool.attach()
        with pytest.raises(RuntimeError, match="busy"):
            pool.attach()
        pool.detach(s)
        with pytest.raises(ValueError, match="not attached"):
            pool.detach(s)
        with pytest.raises(ValueError, match="not attached"):
            pool.push({s: np.zeros((4, 4), np.float32)})
        s = pool.attach()
        with pytest.raises(ValueError, match="exceeds window_size"):
            pool.push({s: np.zeros((4, WINDOW * 2), np.float32)})

    def test_int8_static_scales_keep_streams_independent(self):
        """Quantized serving through the pool: with calibrated static
        activation scales each lane equals its solo rollout (dynamic scales
        would couple the streams through the shared per-tensor max)."""
        from bmcnet_esr_tpu.models import calibrate_act_scales
        from bmcnet_esr_tpu.ops.batch import batch_events_to_counts

        model = BMCNetPlain(scale=2, n_c=8, n_b=2, dtype=jnp.bfloat16, quant=True)
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        variables = model.init(jax.random.key(5), dummy, *model.init_state(1, h, w))

        rng = np.random.default_rng(4)
        cal_windows = make_windows(rng, 5)
        frames = batch_events_to_counts(
            jnp.asarray(np.stack(cal_windows)), RES
        )  # [5, H, W, 2]
        pairs = jnp.stack([frames[:-1], frames[1:]], axis=1)[:, None]  # [S,1,2,H,W,2]
        calibrated = calibrate_act_scales(
            model, variables, pairs, tuple(model.init_state(1, h, w))
        )
        assert "quant" in calibrated

        wins = {k: make_windows(rng, 3) for k in ("a", "b")}
        pool = StreamPool(model, calibrated, RES, slots=2, window_size=WINDOW)
        slots = {k: pool.attach() for k in wins}
        got = {k: [] for k in wins}
        for t in range(3):
            out = pool.push({slots[k]: wins[k][t] for k in wins})
            for k in wins:
                if slots[k] in out:
                    got[k].append(out[slots[k]])
        for k in wins:
            want = [p for p in solo_preds(model, calibrated, wins[k]) if p is not None]
            assert len(got[k]) == len(want) == 2
            for g, x in zip(got[k], want):
                np.testing.assert_allclose(g, x, rtol=1e-4, atol=1e-4)

    def test_mesh_sharded_pool_matches_solo(self, model_vars):
        """Slots sharded over an 8-device mesh: same outputs as solo
        rollouts (SPMD live serving)."""
        from bmcnet_esr_tpu.parallel import make_mesh

        model, variables = model_vars
        rng = np.random.default_rng(2)
        mesh = make_mesh(8)
        pool = StreamPool(
            model, variables, RES, slots=8, window_size=WINDOW, mesh=mesh
        )
        streams = {pool.attach(): make_windows(rng, 3) for _ in range(8)}
        got = {s: [] for s in streams}
        for t in range(3):
            out = pool.push({s: ws[t] for s, ws in streams.items()})
            for s in out:
                got[s].append(out[s])
        for s, ws in streams.items():
            want = [p for p in solo_preds(model, variables, ws) if p is not None]
            assert len(got[s]) == len(want) == 2
            for g, w in zip(got[s], want):
                np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    def test_mesh_sharded_deep_tick_matches_solo(self, model_vars):
        """push_async_deep on a mesh-sharded pool: the [slots, K, 4, N]
        event stack and [slots, K] masks place onto the slot sharding, and
        a ragged backlog drains to exactly the solo trajectories.  Also
        covers prewarm()'s mesh placement of the deep-ladder inputs."""
        from bmcnet_esr_tpu.parallel import make_mesh

        model, variables = model_vars
        rng = np.random.default_rng(11)
        mesh = make_mesh(8)
        pool = StreamPool(
            model, variables, RES, slots=8, window_size=WINDOW, mesh=mesh
        )
        pool.prewarm([1, 2])  # state untouched, programs warm
        a, b = pool.attach(), pool.attach()
        wa, wb = make_windows(rng, 4), make_windows(rng, 2)
        out_map, preds = pool.push_async_deep({a: wa, b: wb}, depth=4)
        preds = np.asarray(preds)  # [K, slots, kH, kW, 2]
        want_a = solo_preds(model, variables, wa)
        want_b = solo_preds(model, variables, wb)
        for slot, want in ((a, want_a), (b, want_b)):
            for (j, has), w in zip(out_map[slot], want):
                assert has == (w is not None)
                if has:
                    np.testing.assert_allclose(
                        preds[j, slot], w, rtol=1e-5, atol=1e-6
                    )

    def test_empty_push_is_noop_tick(self, model_vars):
        """A tick with no windows leaves every stream's trajectory intact."""
        model, variables = model_vars
        rng = np.random.default_rng(1)
        wins = make_windows(rng, 3)
        pool = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        s = pool.attach()
        pool.push({s: wins[0]})
        pool.push({})  # nobody updates
        p1 = pool.push({s: wins[1]})[s]
        p2 = pool.push({s: wins[2]})[s]
        want = solo_preds(model, variables, wins)
        np.testing.assert_allclose(p1, want[1], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(p2, want[2], rtol=1e-5, atol=1e-6)

    def test_hot_reload_swaps_weights_preserving_state(self, model_vars):
        """reload() rolls out new weights under live traffic: recurrent
        state carries across the swap, subsequent predictions use the new
        weights, and pooled lanes still equal the solo rollout exactly."""
        model, v1 = model_vars
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        v2 = model.init(jax.random.key(99), dummy, *model.init_state(1, h, w))
        rng = np.random.default_rng(7)
        wins = make_windows(rng, 4)

        pool = StreamPool(model, v1, RES, slots=2, window_size=WINDOW)
        s = pool.attach()
        pool.push({s: wins[0]})
        before = pool.push({s: wins[1]})[s]
        n_compiles = pool._step._cache_size()
        pool.reload(v2)
        after = [pool.push({s: wv})[s] for wv in wins[2:]]
        # the swap reuses the compiled step — same shapes, no recompile
        assert pool._step._cache_size() == n_compiles

        # oracle: solo rollout that swaps weights at the same point
        solo = StreamingSR(model, v1, RES, window_size=WINDOW)
        want_before = [solo.push(wv) for wv in wins[:2]][1]
        solo.reload(v2)
        want_after = [solo.push(wv) for wv in wins[2:]]
        np.testing.assert_allclose(before, want_before, rtol=1e-5, atol=1e-6)
        for g, wv in zip(after, want_after):
            np.testing.assert_allclose(g, wv, rtol=1e-5, atol=1e-6)

        # and the swap was real: continuing on v1 diverges from the reload
        cont = StreamingSR(model, v1, RES, window_size=WINDOW)
        for wv in wins[:2]:
            cont.push(wv)
        assert not np.allclose(cont.push(wins[2]), after[0], atol=1e-4)

    def test_hot_reload_rejects_mismatched_weights(self, model_vars):
        """A checkpoint of a different architecture must be rejected with
        the old weights left serving (never a recompile or a mid-tick
        crash)."""
        model, v1 = model_vars
        h, w = RES
        other = BMCNetPlain(scale=2, n_c=12, n_b=2)
        dummy = jnp.zeros((1, 2, h, w, 2))
        v_other = other.init(
            jax.random.key(0), dummy, *other.init_state(1, h, w)
        )
        rng = np.random.default_rng(8)
        wins = make_windows(rng, 3)
        pool = StreamPool(model, v1, RES, slots=1, window_size=WINDOW)
        s = pool.attach()
        pool.push({s: wins[0]})
        with pytest.raises(ValueError, match="reload"):
            pool.reload(v_other)
        # dtype change is a program change too (would silently recompile)
        v_cast = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v1)
        with pytest.raises(ValueError, match="reload"):
            pool.reload(v_cast)
        got = [pool.push({s: wv})[s] for wv in wins[1:]]
        want = solo_preds(model, v1, wins)[1:]
        for g, wv in zip(got, want):
            np.testing.assert_allclose(g, wv, rtol=1e-5, atol=1e-6)

    def test_mesh_sharded_pool_hot_reload(self, model_vars):
        """reload() on a mesh-sharded pool: new weights replicate across
        the mesh and every lane continues exactly like a solo rollout that
        swapped weights at the same point."""
        from bmcnet_esr_tpu.parallel import make_mesh

        model, v1 = model_vars
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        v2 = model.init(jax.random.key(77), dummy, *model.init_state(1, h, w))
        rng = np.random.default_rng(9)
        mesh = make_mesh(8)
        pool = StreamPool(
            model, v1, RES, slots=8, window_size=WINDOW, mesh=mesh
        )
        streams = {pool.attach(): make_windows(rng, 4) for _ in range(8)}
        for t in range(2):
            pool.push({s: ws[t] for s, ws in streams.items()})
        pool.reload(v2)
        got = {s: [] for s in streams}
        for t in range(2, 4):
            out = pool.push({s: ws[t] for s, ws in streams.items()})
            for s in out:
                got[s].append(out[s])
        for s, ws in streams.items():
            solo = StreamingSR(model, v1, RES, window_size=WINDOW)
            for wv in ws[:2]:
                solo.push(wv)
            solo.reload(v2)
            want = [solo.push(wv) for wv in ws[2:]]
            for g, wv in zip(got[s], want):
                np.testing.assert_allclose(g, wv, rtol=1e-5, atol=1e-6)

    def test_deep_tick_equals_consecutive_shallow_ticks(self, model_vars):
        """push_async_deep drains a backlog in ONE program with per-step
        ragged masks; it must equal the same windows pushed one tick at a
        time — including a fresh slot whose first window falls mid-tick."""
        model, variables = model_vars
        rng = np.random.default_rng(31)
        wa, wb = make_windows(rng, 5), make_windows(rng, 3)

        deep = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        a, b = deep.attach(), deep.attach()
        # tick 1: a consumes 3 (first mid-attach), b consumes 1 (its first)
        out_map, preds = deep.push_async_deep({a: wa[:3], b: wb[:1]}, depth=3)
        preds = np.asarray(preds)
        assert out_map[a] == [(0, False), (1, True), (2, True)]
        assert out_map[b] == [(0, False)]
        got_a = [preds[j, a] for j, has in out_map[a] if has]
        # tick 2: ragged again — a consumes 2, b consumes 2
        out_map2, preds2 = deep.push_async_deep({a: wa[3:], b: wb[1:]}, depth=2)
        preds2 = np.asarray(preds2)
        got_a += [preds2[j, a] for j, has in out_map2[a] if has]
        got_b = [preds2[j, b] for j, has in out_map2[b] if has]

        want_a = [p for p in solo_preds(model, variables, wa) if p is not None]
        want_b = [p for p in solo_preds(model, variables, wb) if p is not None]
        assert len(got_a) == len(want_a) == 4
        assert len(got_b) == len(want_b) == 2
        for g, w in zip(got_a + got_b, want_a + want_b):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

        # prewarm between live ticks is a numeric no-op on every slot
        # (all-masked ticks pass carry/prev through untouched)
        # idle slot during a deep tick: untouched (b idles in tick 3)
        pool2 = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        a2 = pool2.attach()
        b2 = pool2.attach()
        pool2.push_async_deep({a2: wa[:2], b2: wb[:2]}, depth=2)
        pool2.prewarm((1, 2, 4))
        om, pr = pool2.push_async_deep({a2: wa[2:4]}, depth=2)
        om2, pr2 = pool2.push_async_deep({b2: [wb[2]]}, depth=2)
        np.testing.assert_allclose(
            np.asarray(pr)[1, a2], want_a[2], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pr2)[0, b2], want_b[1], rtol=1e-5, atol=1e-6
        )

    def test_deep_dispatch_failure_keeps_first_window_semantics(self, model_vars):
        """A deep tick whose dispatch raises must leave the slot's
        first-window accounting untouched (matching push_async): the
        retried window still resets state and returns PENDING, so the
        stream equals its solo rollout instead of silently running from a
        zero carry."""
        model, variables = model_vars
        rng = np.random.default_rng(71)
        wins = make_windows(rng, 3)

        pool = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        slot = pool.attach()

        def boom(*args, **kwargs):
            raise RuntimeError("dispatch died")

        pool._deep_steps[2] = boom  # pre-seed the ladder with a failing step
        with pytest.raises(RuntimeError, match="dispatch died"):
            pool.push_async_deep({slot: wins[:2]}, 2)
        assert pool.windows_seen(slot) == 0  # nothing was consumed
        del pool._deep_steps[2]

        # the retry runs the full stream from scratch == solo rollout
        want = solo_preds(model, variables, wins)
        assert slot not in pool.push({slot: wins[0]})  # first window: PENDING
        for w, exp in zip(wins[1:], want[1:]):
            np.testing.assert_allclose(
                pool.push({slot: w})[slot], exp, rtol=1e-5, atol=1e-6
            )


class TestWireModes:
    """out_wire: the prediction's device->host/wire encoding.

    The HR prediction is ~56x the event window that produced it, so on a
    bandwidth-bound attachment (tunneled chip: measured ~20 MB/s d2h,
    BENCH_HISTORY.jsonl fps_daemon_loopback vs fps_bf16_serving) the wire
    encoding — not compute — sets the serving ceiling.  f16 must be
    near-lossless, i8 bounded by its per-window scale; both must preserve
    solo-rollout parity through the pool's masked lanes.
    """

    def test_f16_wire_matches_f32(self, model_vars):
        model, variables = model_vars
        rng = np.random.default_rng(11)
        wins = make_windows(rng, 4)
        ref = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        f16 = StreamPool(
            model, variables, RES, slots=2, window_size=WINDOW, out_wire="f16"
        )
        a_ref, a_f16 = ref.attach(), f16.attach()
        for w in wins:
            want = ref.push({a_ref: w})
            got = f16.push({a_f16: w})
            assert set(got) == set(want)
            for s in want:
                assert got[s].dtype == np.float32  # decoded for the consumer
                peak = np.abs(want[s]).max() + 1e-12
                # one f16 rounding of an fp32 value: <= 2^-11 relative
                np.testing.assert_allclose(
                    got[s], want[s], atol=float(peak) * 2 ** -10
                )

    def test_i8_wire_error_bounded_by_scale(self, model_vars):
        model, variables = model_vars
        rng = np.random.default_rng(12)
        wins = make_windows(rng, 4)
        ref = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        i8 = StreamPool(
            model, variables, RES, slots=2, window_size=WINDOW, out_wire="i8"
        )
        a_ref, a_i8 = ref.attach(), i8.attach()
        for w in wins:
            want = ref.push({a_ref: w})
            got = i8.push({a_i8: w})
            assert set(got) == set(want)
            for s in want:
                # symmetric quantization: worst case half a step, where the
                # step is peak/127 for THIS window
                step = np.abs(want[s]).max() / 127.0
                np.testing.assert_allclose(
                    got[s], want[s], atol=float(step) * 0.75 + 1e-9
                )

    def test_deep_tick_wire_matches_shallow(self, model_vars):
        """Wire encodings commute with deep ticks: a scanned K-step tick's
        decoded outputs equal the same windows pushed one tick at a time."""
        from bmcnet_esr_tpu.inference.streaming import wire_decode

        model, variables = model_vars
        rng = np.random.default_rng(13)
        wins = make_windows(rng, 4)
        for mode in ("f16", "i8"):
            shallow = StreamPool(
                model, variables, RES, slots=2, window_size=WINDOW, out_wire=mode
            )
            deep = StreamPool(
                model, variables, RES, slots=2, window_size=WINDOW, out_wire=mode
            )
            s1, s2 = shallow.attach(), deep.attach()
            want = [shallow.push({s1: w}).get(s1) for w in wins]
            out_map, preds = deep.push_async_deep({s2: wins}, depth=4)
            dec = wire_decode(jax.device_get(preds), mode)
            for idx, (j, has) in enumerate(out_map[s2]):
                if not has:
                    assert want[idx] is None
                    continue
                np.testing.assert_allclose(
                    dec[j, s2], want[idx], rtol=0, atol=1e-6
                )

    def test_unknown_wire_mode_rejected(self, model_vars):
        model, variables = model_vars
        with pytest.raises(ValueError, match="out_wire"):
            StreamPool(model, variables, RES, out_wire="f64")


class TestChunkedFetch:
    """fetch_chunks: the in-graph slot-axis split that turns one d2h copy
    into N concurrent ones (a per-stream-bound link — the tunneled chip —
    moves ~1.9-2.6x the bytes/sec that way; bench.py's `d2h_mbps_x2` probe
    documents the measurement).  Chunking must be a pure layout change:
    every decoded prediction identical to the unchunked pool's."""

    def test_chunked_push_matches_unchunked(self, model_vars):
        model, variables = model_vars
        rng = np.random.default_rng(21)
        wins = {k: make_windows(rng, 3) for k in ("a", "b")}
        ref = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        chk = StreamPool(
            model, variables, RES, slots=2, window_size=WINDOW, fetch_chunks=2
        )
        s_ref = {k: ref.attach() for k in wins}
        s_chk = {k: chk.attach() for k in wins}
        for t in range(3):
            want = ref.push({s_ref[k]: wins[k][t] for k in wins})
            got = chk.push({s_chk[k]: wins[k][t] for k in wins})
            assert {k for k in wins if s_chk[k] in got} == {
                k for k in wins if s_ref[k] in want
            }
            for k in wins:
                if s_ref[k] in want:
                    np.testing.assert_array_equal(
                        got[s_chk[k]], want[s_ref[k]]
                    )

    def test_chunked_async_fetch_roundtrip(self, model_vars):
        """push_async returns a LIST of chunk encodings; device_get +
        assemble_fetch reproduces the unchunked [slots, kH, kW, 2] stack —
        for the bare-f32 wire and for the i8 (pred, scale) pytree."""
        from bmcnet_esr_tpu.inference.streaming import (
            assemble_fetch, wire_decode,
        )

        model, variables = model_vars
        rng = np.random.default_rng(22)
        wins = make_windows(rng, 3)
        for mode in ("f32", "i8"):
            ref = StreamPool(
                model, variables, RES, slots=4, window_size=WINDOW,
                out_wire=mode,
            )
            chk = StreamPool(
                model, variables, RES, slots=4, window_size=WINDOW,
                out_wire=mode, fetch_chunks=4,
            )
            a_ref, a_chk = ref.attach(), chk.attach()
            for w in wins:
                _, want_dev = ref.push_async({a_ref: w})
                _, got_dev = chk.push_async({a_chk: w})
                assert isinstance(got_dev, list) and len(got_dev) == 4
                want = wire_decode(jax.device_get(want_dev), mode)
                got = wire_decode(
                    assemble_fetch(jax.device_get(got_dev)), mode
                )
                np.testing.assert_array_equal(got, want)

    def test_chunked_deep_tick_matches_unchunked(self, model_vars):
        """Deep ticks stack preds as [K, slots, ...]: the chunk split/
        reassembly must cut axis 1, not 0, or streams would swap windows."""
        from bmcnet_esr_tpu.inference.streaming import assemble_fetch

        model, variables = model_vars
        rng = np.random.default_rng(23)
        wa, wb = make_windows(rng, 4), make_windows(rng, 2)
        ref = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        chk = StreamPool(
            model, variables, RES, slots=2, window_size=WINDOW, fetch_chunks=2
        )
        a1, b1 = ref.attach(), ref.attach()
        a2, b2 = chk.attach(), chk.attach()
        map_ref, preds_ref = ref.push_async_deep({a1: wa, b1: wb}, depth=4)
        map_chk, preds_chk = chk.push_async_deep({a2: wa, b2: wb}, depth=4)
        assert map_chk[a2] == map_ref[a1] and map_chk[b2] == map_ref[b1]
        got = assemble_fetch(jax.device_get(preds_chk), deep=True)
        np.testing.assert_array_equal(got, np.asarray(preds_ref))

    def test_bad_fetch_chunks_rejected(self, model_vars):
        model, variables = model_vars
        with pytest.raises(ValueError, match="fetch_chunks"):
            StreamPool(model, variables, RES, slots=4, fetch_chunks=3)
        with pytest.raises(ValueError, match="fetch_chunks"):
            StreamPool(model, variables, RES, slots=4, fetch_chunks=0)


class TestLaneCompaction:
    """compact=True deep ticks: only the pushed slots' lanes are laid out
    for fetch (bucketed in-graph gather — the low-occupancy bandwidth lever,
    measured 3.17x/2.05x the padded serving rate at 25 %/50 % occupancy in
    docs/bench_runs/r5_lane_compaction.json).  Must be a pure FETCH
    transform: state updates identical for every slot, outputs equal to the
    solo rollouts, padded program reused at full occupancy."""

    def test_compact_deep_tick_matches_solo(self, model_vars):
        model, variables = model_vars
        rng = np.random.default_rng(31)
        pool = StreamPool(model, variables, RES, slots=8, window_size=WINDOW)
        s1, s2 = pool.attach(), pool.attach()
        w1, w2 = make_windows(rng, 3), make_windows(rng, 2)
        out_map, preds, lane_of = pool.push_async_deep(
            {s1: w1, s2: w2}, depth=4, compact=True
        )
        preds = np.asarray(preds)
        assert preds.shape[1] == 2  # k=2 bucket, not the 8 padded slots
        assert lane_of == {s1: 0, s2: 1}
        for slot, wins in ((s1, w1), (s2, w2)):
            solo = StreamingSR(model, variables, RES, window_size=WINDOW)
            for (j, has), wv in zip(out_map[slot], wins):
                ref = solo.push(wv)
                assert has == (ref is not None)
                if has:
                    np.testing.assert_allclose(
                        preds[j, lane_of[slot]], ref, rtol=1e-5, atol=1e-6
                    )

    def test_compact_state_advances_like_padded(self, model_vars):
        """Compaction only gathers the FETCH: a slot absent from a compact
        tick keeps its state, and compact/padded ticks interleave freely
        on the same pool with every stream staying solo-exact."""
        model, variables = model_vars
        rng = np.random.default_rng(32)
        pool = StreamPool(model, variables, RES, slots=8, window_size=WINDOW)
        streams = {pool.attach(): make_windows(rng, 3) for _ in range(3)}
        slots = sorted(streams)
        a, b, c = slots
        got = {s: [] for s in slots}

        def collect(windows_map, compact):
            res = pool.push_async_deep(windows_map, depth=2, compact=compact)
            out_map, preds = res[0], np.asarray(res[1])
            lane_of = res[2] if compact else {s: s for s in out_map}
            for slot, entries in out_map.items():
                for j, has in entries:
                    if has:
                        got[slot].append(preds[j, lane_of[slot]])

        # tick 1: a+b compact (k=2); c untouched
        collect({a: streams[a][:2], b: streams[b][:2]}, compact=True)
        # tick 2: all three, compact (k=4 bucket: padding lane repeats)
        collect({s: streams[s][2:] for s in (a, b)} | {c: streams[c][:2]},
                compact=True)
        # tick 3: c's tail through the PADDED program on the same pool
        collect({c: streams[c][2:]}, compact=False)
        for s in slots:
            want = [p for p in solo_preds(model, variables, streams[s])
                    if p is not None]
            assert len(got[s]) == len(want) == 2
            for g, w in zip(got[s], want):
                np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    def test_full_occupancy_falls_back_to_padded_program(self, model_vars):
        model, variables = model_vars
        rng = np.random.default_rng(33)
        pool = StreamPool(model, variables, RES, slots=2, window_size=WINDOW)
        s1, s2 = pool.attach(), pool.attach()
        n_progs = len(pool._deep_steps)
        out_map, preds, lane_of = pool.push_async_deep(
            {s1: make_windows(rng, 2), s2: make_windows(rng, 2)},
            depth=2, compact=True,
        )
        assert lane_of == {s1: s1, s2: s2}  # identity: padded indexing
        assert np.asarray(preds).shape[1] == 2
        # no compact rung was compiled — the padded depth-2 program serves
        assert set(pool._deep_steps) == {2}
        assert len(pool._deep_steps) == n_progs + 1

    def test_compact_composes_with_wire_and_chunked_fetch(self, model_vars):
        """i8 wire + fetch_chunks: the compacted fetch is a LIST of
        gcd(fetch_chunks, k) chunk encodings whose reassembly equals the
        padded program's wire output on the active lanes exactly."""
        from bmcnet_esr_tpu.inference.streaming import (
            assemble_fetch, wire_decode,
        )

        model, variables = model_vars
        rng = np.random.default_rng(34)
        wa, wb = make_windows(rng, 3), make_windows(rng, 2)
        ref = StreamPool(
            model, variables, RES, slots=8, window_size=WINDOW, out_wire="i8"
        )
        cmp_ = StreamPool(
            model, variables, RES, slots=8, window_size=WINDOW, out_wire="i8",
            fetch_chunks=4,
        )
        a1, b1 = ref.attach(), ref.attach()
        a2, b2 = cmp_.attach(), cmp_.attach()
        map_ref, preds_ref = ref.push_async_deep({a1: wa, b1: wb}, depth=4)
        map_cmp, preds_cmp, lane_of = cmp_.push_async_deep(
            {a2: wa, b2: wb}, depth=4, compact=True
        )
        assert isinstance(preds_cmp, list) and len(preds_cmp) == 2  # gcd(4,2)
        got = assemble_fetch(jax.device_get(preds_cmp), deep=True)
        dec_ref = wire_decode(jax.device_get(preds_ref), "i8")
        dec_cmp = wire_decode(got, "i8")
        for slot_r, slot_c in ((a1, a2), (b1, b2)):
            for (j, has), (jc, hc) in zip(map_ref[slot_r], map_cmp[slot_c]):
                assert (j, has) == (jc, hc)
                if has:
                    np.testing.assert_array_equal(
                        dec_cmp[j, lane_of[slot_c]], dec_ref[j, slot_r]
                    )

    def test_mesh_sharded_compact_matches_solo(self, model_vars):
        """Compaction on an 8-device mesh-sharded pool: the gather crosses
        the sharded slot axis (GSPMD collective) and still equals solo."""
        from bmcnet_esr_tpu.parallel import make_mesh

        model, variables = model_vars
        rng = np.random.default_rng(35)
        mesh = make_mesh(8)
        pool = StreamPool(
            model, variables, RES, slots=8, window_size=WINDOW, mesh=mesh
        )
        s1, s2 = pool.attach(), pool.attach()
        w1, w2 = make_windows(rng, 3), make_windows(rng, 3)
        out_map, preds, lane_of = pool.push_async_deep(
            {s1: w1, s2: w2}, depth=4, compact=True
        )
        preds = np.asarray(preds)
        assert preds.shape[1] == 2
        for slot, wins in ((s1, w1), (s2, w2)):
            solo = StreamingSR(model, variables, RES, window_size=WINDOW)
            for (j, has), wv in zip(out_map[slot], wins):
                ref = solo.push(wv)
                assert has == (ref is not None)
                if has:
                    np.testing.assert_allclose(
                        preds[j, lane_of[slot]], ref, rtol=1e-5, atol=1e-6
                    )

    def test_prewarm_compact_rungs(self, model_vars):
        """prewarm(compact=...) builds the (depth, k) rungs without
        touching stream state, and rejects k >= slots."""
        model, variables = model_vars
        pool = StreamPool(model, variables, RES, slots=4, window_size=WINDOW)
        pool.prewarm(depths=(1, 2), compact=((2, 1), (2, 2)))
        assert (2, 1) in pool._deep_steps and (2, 2) in pool._deep_steps
        with pytest.raises(ValueError, match="compact bucket"):
            pool.prewarm(depths=(), compact=((2, 4),))
        # warmed rungs serve traffic with zero extra compiles
        rng = np.random.default_rng(36)
        s = pool.attach()
        out_map, preds, lane_of = pool.push_async_deep(
            {s: make_windows(rng, 2)}, depth=2, compact=True
        )
        assert np.asarray(preds).shape[1] == 1 and lane_of == {s: 0}

    def test_compact_survives_hot_reload(self, model_vars):
        """reload() swaps weights; compact rungs (weights are call args,
        not baked constants) keep serving the new weights with state
        carried — equality vs a solo rollout that swaps at the same
        point, through compacted deep ticks on both sides of the swap."""
        model, v1 = model_vars
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        v2 = model.init(jax.random.key(123), dummy, *model.init_state(1, h, w))
        rng = np.random.default_rng(37)
        wins = make_windows(rng, 4)
        pool = StreamPool(model, v1, RES, slots=4, window_size=WINDOW)
        s = pool.attach()

        def drain(wlist):
            out_map, preds, lane_of = pool.push_async_deep(
                {s: wlist}, depth=2, compact=True
            )
            preds = np.asarray(preds)
            return [preds[j, lane_of[s]] for j, has in out_map[s] if has]

        got = drain(wins[:2])
        pool.reload(v2)
        got += drain(wins[2:])

        solo = StreamingSR(model, v1, RES, window_size=WINDOW)
        want = [solo.push(wv) for wv in wins[:2]]
        solo.reload(v2)
        want += [solo.push(wv) for wv in wins[2:]]
        want = [p for p in want if p is not None]
        assert len(got) == len(want) == 3
        for g, wv in zip(got, want):
            np.testing.assert_allclose(g, wv, rtol=1e-5, atol=1e-6)
