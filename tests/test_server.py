"""EventSRServer: TCP serving daemon over StreamPool.

Concurrent clients over loopback must receive exactly the predictions their
solo StreamingSR rollouts would produce, with concurrent pushes dynamically
batched into shared device ticks."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.inference.server import EventSRClient, EventSRServer
from bmcnet_esr_tpu.inference.streaming import StreamingSR
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


@pytest.fixture()
def server(model_vars):
    model, variables = model_vars
    srv = EventSRServer(
        model, variables, RES, slots=4, window_size=WINDOW,
        port=0, batch_window_ms=20.0,
    )
    srv.start()
    yield srv
    srv.shutdown()


def raw_hello(sock):
    """Raw-socket version handshake (what EventSRClient does on connect)."""
    from bmcnet_esr_tpu.inference import server as server_mod

    sock.sendall(server_mod._frame(server_mod.HELLO,
                                   bytes([server_mod.PROTOCOL_VERSION])))
    opcode, body = server_mod._read_frame(sock)
    assert opcode == server_mod.HELLO_OK
    assert body[0] == server_mod.PROTOCOL_VERSION


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


class TestServer:
    def test_concurrent_clients_match_solo(self, server, model_vars):
        model, variables = model_vars
        rng = np.random.default_rng(0)
        n_clients, n_windows = 3, 4
        streams = [make_windows(rng, n_windows) for _ in range(n_clients)]
        results = [None] * n_clients
        errors = []

        def run(i):
            try:
                client = EventSRClient(*server.address)
                client.attach()
                preds = [client.push(w) for w in streams[i]]
                client.detach()
                client.close()
                results[i] = preds
            except Exception as exc:  # noqa: BLE001
                errors.append((i, exc))

        threads = [threading.Thread(target=run, args=(i,)) for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors

        for i in range(n_clients):
            solo = StreamingSR(model, variables, RES, window_size=WINDOW)
            want = [solo.push(w) for w in streams[i]]
            assert results[i][0] is None and want[0] is None
            for got, exp in zip(results[i][1:], want[1:]):
                np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)

        # dynamic batching actually shared ticks: 3 clients x 4 windows in
        # fewer than 12 device steps (first-window ticks can interleave)
        assert server.ticks < n_clients * n_windows

    def test_protocol_errors(self, server):
        client = EventSRClient(*server.address)
        client.attach()
        # pushing someone else's slot is rejected
        thief = EventSRClient(*server.address)
        thief.slot = client.slot
        with pytest.raises(RuntimeError, match="not yours"):
            thief.push(np.zeros((4, 4), np.float32))
        thief.close()
        # oversize window is rejected at tick time with an ERROR reply
        with pytest.raises(RuntimeError, match="exceeds window_size"):
            client.push(np.zeros((4, WINDOW * 2), np.float32))
        client.close()

    def test_noninteger_polarity_rejected_per_client(self, server):
        """Polarity outside {-1, 0, +1} gets an ERROR at the protocol
        boundary (the compact int8 transfer is only exact on that domain)
        — and the connection keeps serving valid windows afterwards."""
        rng = np.random.default_rng(9)
        client = EventSRClient(*server.address)
        client.attach()
        bad = make_windows(rng, 1)[0]
        bad[3, 0] = 0.5
        with pytest.raises(RuntimeError, match="polarity"):
            client.push(bad)
        good = make_windows(rng, 2)
        assert client.push(good[0]) is None  # first window: PENDING
        assert client.push(good[1]) is not None
        client.close()

    def test_version_mismatch_gets_clean_error(self, server):
        """A client of a future incompatible build must get a clean version
        ERROR and a close — never undefined decode behavior (VERDICT r2
        weak #5)."""
        import socket as socket_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        # wrong version byte
        s = socket_mod.create_connection(server.address)
        s.settimeout(5.0)
        s.sendall(server_mod._frame(server_mod.HELLO, bytes([99])))
        opcode, body = server_mod._read_frame(s)
        assert opcode == server_mod.ERROR
        assert "version" in body.decode() and "v99" in body.decode()
        assert s.recv(1) == b""  # server closed after the error
        s.close()

        # well-formed v1 frames but no HELLO first
        s = socket_mod.create_connection(server.address)
        s.settimeout(5.0)
        s.sendall(server_mod._frame(server_mod.ATTACH))
        opcode, body = server_mod._read_frame(s)
        assert opcode == server_mod.ERROR and b"HELLO" in body
        assert s.recv(1) == b""
        s.close()

        # PIPELINED wrong-version client: HELLO v99 + more frames in one
        # write.  The ERROR must still arrive (graceful close drains the
        # unread bytes and FINs after the reply; an immediate close() would
        # RST the queued ERROR away)
        s = socket_mod.create_connection(server.address)
        s.settimeout(5.0)
        s.sendall(
            server_mod._frame(server_mod.HELLO, bytes([99]))
            + server_mod._frame(server_mod.ATTACH)
            + server_mod._frame(server_mod.PUSH, b"x" * 64)
        )
        # exactly ONE ERROR then EOF: the pipelined frames behind the
        # rejected HELLO must not each queue their own ERROR reply (the
        # dispatch loop stops once the connection enters graceful close)
        frames = []
        while True:
            try:
                frames.append(server_mod._read_frame(s))
            except ConnectionError:
                break
        assert len(frames) == 1, frames
        opcode, body = frames[0]
        assert opcode == server_mod.ERROR and b"v99" in body
        s.close()

        # daemon still serving handshaked clients
        client = EventSRClient(*server.address)
        assert client.server_version == server_mod.PROTOCOL_VERSION
        client.attach()
        assert client.push(np.zeros((4, 4), np.float32)) is None
        client.detach()
        client.close()

    def test_graceful_close_deadline_survives_dribbling_peer(self, server):
        """A peer that keeps writing garbage after a rejected HELLO must
        still be force-closed at the ORIGINAL grace deadline — repeated
        frames must not re-arm it (``_close_gently`` is idempotent and the
        drain path never re-enters ``_handle``)."""
        import socket as socket_mod
        import time as time_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        s = socket_mod.create_connection(server.address)
        s.settimeout(5.0)
        s.sendall(server_mod._frame(server_mod.HELLO, bytes([99])))
        opcode, _ = server_mod._read_frame(s)
        assert opcode == server_mod.ERROR
        # never read further; dribble garbage every 0.2 s — the server must
        # still cut us off ~1 s (grace_s) after the rejected HELLO
        t0 = time_mod.monotonic()
        dead = None
        for _ in range(25):  # 5 s worst case, far past the 1 s grace
            try:
                s.sendall(server_mod._frame(server_mod.PUSH, b"y" * 32))
            except OSError:
                dead = time_mod.monotonic() - t0
                break
            time_mod.sleep(0.2)
        assert dead is not None, "dribbling peer was never force-closed"
        assert dead < 4.0, f"force-close took {dead:.1f}s (grace is 1s)"
        s.close()

        # daemon still serving handshaked clients
        client = EventSRClient(*server.address)
        client.attach()
        assert client.push(np.zeros((4, 4), np.float32)) is None
        client.detach()
        client.close()

    def test_malformed_frames_dont_kill_the_daemon(self, server):
        """A zero-length frame word once raised IndexError past the narrow
        except clause and killed the server thread; a huge length field would
        drive a multi-GB recv.  Both must only cost the sender its
        connection — the daemon keeps serving other clients."""
        import socket as socket_mod
        import struct

        for bad in (struct.pack("<I", 0), struct.pack("<I", 0xFFFFFFFF)):
            s = socket_mod.create_connection(server.address)
            s.sendall(bad)
            # server drops the desynced connection
            s.settimeout(5.0)
            assert s.recv(1) == b""
            s.close()

        # daemon is still alive and serving
        client = EventSRClient(*server.address)
        client.attach()
        assert client.push(np.zeros((4, 4), np.float32)) is None
        client.detach()
        client.close()

    def test_stalled_partial_frame_doesnt_block_others(self, server):
        """A peer that sends half a frame and then goes silent must not
        stall the selector loop: reads are non-blocking and partial frames
        wait in the per-connection buffer while other clients are served."""
        import socket as socket_mod
        import struct

        staller = socket_mod.create_connection(server.address)
        # valid length word for a 9-byte payload... which never arrives
        staller.sendall(struct.pack("<I", 9) + b"\x03")

        client = EventSRClient(*server.address)
        client.attach()
        assert client.push(np.zeros((4, 4), np.float32)) is None
        pred = client.push(np.zeros((4, 4), np.float32))
        assert pred is not None and pred.shape == (32, 32, 2)
        client.detach()
        client.close()
        staller.close()

    def test_protocol_fuzz_random_bytes_never_kill_the_daemon(
        self, server, model_vars
    ):
        """Seeded fuzz: hostile peers stream random garbage (random lengths,
        random opcodes, truncated/oversized bodies, byte-dribbles) while a
        well-behaved client keeps pushing — the daemon must survive every
        connection and keep serving the good client correct predictions."""
        import socket as socket_mod
        import struct

        from bmcnet_esr_tpu.inference import server as server_mod

        rng = np.random.default_rng(1234)
        client = EventSRClient(*server.address)
        client.attach()
        wins = make_windows(rng, 6)

        def fuzz_once(i):
            s = socket_mod.create_connection(server.address)
            s.settimeout(5.0)
            kind = i % 8
            if kind == 0:  # pure random bytes
                s.sendall(rng.bytes(int(rng.integers(1, 512))))
            elif kind == 1:  # valid length word, random opcode + body
                body = bytes([int(rng.integers(0, 256))]) + rng.bytes(
                    int(rng.integers(0, 64))
                )
                s.sendall(struct.pack("<I", len(body)) + body)
            elif kind == 2:  # well-formed PUSH header lying about its size
                raw_hello(s)
                body = struct.pack("<II", 0, 10**6) + rng.bytes(16)
                s.sendall(server_mod._frame(server_mod.PUSH, body))
            elif kind == 3:  # well-formed-but-FUTURE-VERSION hello
                v = int(rng.integers(server_mod.PROTOCOL_VERSION + 1, 256))
                s.sendall(server_mod._frame(server_mod.HELLO, bytes([v])))
            elif kind == 4:  # correct opcode stream but no HELLO first
                s.sendall(server_mod._frame(server_mod.ATTACH, b""))
            elif kind == 5:  # byte-dribbled truncated frame, abrupt close
                frame = server_mod._frame(server_mod.ATTACH, b"")
                for b in frame[: int(rng.integers(1, len(frame)))]:
                    s.sendall(bytes([b]))
            elif kind == 6:  # forged RESUME: random slot + random token
                raw_hello(s)
                body = struct.pack("<I", int(rng.integers(0, 8))) + rng.bytes(
                    int(rng.integers(0, 24))
                )
                s.sendall(server_mod._frame(server_mod.RESUME, body))
            else:  # RELOAD on a server with no loader configured
                raw_hello(s)
                s.sendall(server_mod._frame(server_mod.RELOAD, b""))
            s.close()

        preds = []
        for i, ev in enumerate(wins):
            fuzz_once(3 * i)
            fuzz_once(3 * i + 1)
            fuzz_once(3 * i + 2)
            preds.append(client.push(ev))
        assert all(p is not None and p.shape == (32, 32, 2) for p in preds[1:])
        # solo StreamingSR agrees: fuzz never perturbed the good client
        model, variables = model_vars
        sr = StreamingSR(model, variables, RES, window_size=WINDOW)
        for ev, got in zip(wins, preds):
            want = sr.push(ev)
            if want is not None:
                np.testing.assert_array_equal(got, want)
        client.detach()
        client.close()

    def test_frame_arriving_with_fin_is_handled(self, server):
        """A peer that sends its final frame and close()s in one write: the
        data and the FIN usually land in the same READ event on loopback —
        EOF must drop the connection only AFTER buffered frames are parsed
        and handled, never discard them."""
        import socket as socket_mod
        import time as time_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        handled = []
        orig = server._handle

        def spy(sock, opcode, body):
            handled.append(opcode)
            return orig(sock, opcode, body)

        server._handle = spy
        try:
            raw = socket_mod.create_connection(server.address)
            raw_hello(raw)
            raw.sendall(server_mod._frame(server_mod.ATTACH, b""))
            raw.close()  # FIN right behind the frame
            deadline = time_mod.time() + 10
            while time_mod.time() < deadline and server_mod.ATTACH not in handled:
                time_mod.sleep(0.02)
            assert server_mod.ATTACH in handled
            # ...and the post-handling drop released the slot again
            deadline = time_mod.time() + 10
            while time_mod.time() < deadline and server._slot_owner:
                time_mod.sleep(0.02)
            assert not server._slot_owner
        finally:
            server._handle = orig

    def test_push_queue_cap(self, server, monkeypatch):
        """A client that floods PUSH frames without reading replies gets
        ERROR replies past the per-slot queue cap instead of growing server
        memory without bound."""
        from bmcnet_esr_tpu.inference import server as server_mod

        monkeypatch.setattr(server_mod, "_MAX_QUEUE", 2)
        client = EventSRClient(*server.address)
        client.attach()
        ev = np.zeros((4, 4), np.float32)
        import struct

        body = struct.pack("<II", client.slot, ev.shape[1]) + ev.tobytes()
        frame = server_mod._frame(server_mod.PUSH, body)
        client._sock.sendall(frame * 16)  # burst, no reads in between
        # drain replies: every queued window gets PENDING/PRED, the overflow
        # gets ERROR("queue full"); the connection survives
        saw_error = False
        client._sock.settimeout(30.0)
        for _ in range(16):
            opcode, payload = server_mod._read_frame(client._sock)
            if opcode == server_mod.ERROR:
                assert b"queue full" in payload
                saw_error = True
        assert saw_error
        client.detach()
        client.close()

    def test_cli_wiring(self, monkeypatch):
        """cli.serve builds the server from a checkpoint + flags."""
        import os

        from bmcnet_esr_tpu.cli import serve as serve_cli

        launched = {}

        def fake_serve(self):
            launched["addr"] = self.address
            launched["chunks"] = self.pool.fetch_chunks
            launched["compact"] = self.compact_lanes

        monkeypatch.setattr(
            serve_cli.EventSRServer, "serve_forever", fake_serve
        )
        ckpt = os.path.join(
            os.path.dirname(__file__), "goldens", "plain_small.npz"
        )
        base = [
            "--model_path", ckpt, "--variant", "plain", "--scale", "2",
            "--n_c", "8", "--n_b", "2", "--resolution", "16x16", "--port", "0",
        ]
        serve_cli.main(base)
        assert launched["addr"][1] > 0
        assert launched["chunks"] == 4  # auto default at --slots 8
        assert launched["compact"] is False  # opt-in (DESIGN §10)
        serve_cli.main(base + ["--slots", "6"])
        assert launched["chunks"] == 3  # largest divisor of 6 that is <= 4
        serve_cli.main(
            base + ["--slots", "4", "--scan_k", "2", "--compact_lanes"]
        )
        assert launched["compact"] is True

    def test_cli_int8_startup_calibration(self, monkeypatch, tmp_path):
        """--dtype int8 with --calib_h5 starts the server with a calibrated
        static 'quant' collection in its pool variables (the fast path);
        without it the pool serves dynamic per-lane scales."""
        import os

        from bmcnet_esr_tpu.cli import serve as serve_cli
        from bmcnet_esr_tpu.data.packager import write_synthetic_fixture

        ckpt = os.path.join(
            os.path.dirname(__file__), "goldens", "plain_small.npz"
        )
        base = [
            "--model_path", ckpt, "--variant", "plain", "--scale", "2",
            "--n_c", "8", "--n_b", "2", "--resolution", "16x16", "--port", "0",
            "--window", "64", "--dtype", "int8",
        ]
        launched0 = {}
        monkeypatch.setattr(
            serve_cli.EventSRServer, "serve_forever",
            lambda self: launched0.setdefault("pool", self.pool),
        )
        serve_cli.main(base)
        assert "quant" not in launched0["pool"].variables  # dynamic per-lane

        h5 = str(tmp_path / "calib.h5")
        write_synthetic_fixture(
            h5, sensor_resolution=(16, 16), prefixes=("ori",),
            events_per_scale={"ori": 64 * 8}, seed=7,
        )
        launched = {}
        monkeypatch.setattr(
            serve_cli.EventSRServer, "serve_forever",
            lambda self: launched.setdefault("pool", self.pool),
        )
        serve_cli.main(base + ["--calib_h5", h5, "--calib_windows", "4"])
        pool = launched["pool"]
        assert "quant" in pool.variables
        scales = jax.tree_util.tree_leaves(pool.variables["quant"])
        assert scales and all(np.asarray(s).min() > 0 for s in scales)

    def test_ticks_pipeline_behind_a_slow_device(self, server, model_vars):
        """Tick N+1 must be DISPATCHED while tick N still computes (the
        selector thread no longer blocks on np.asarray for the whole device
        step), and replies must still match solo rollouts exactly.

        The second client holds its first push until the first client's
        window has DISPATCHED: in-lockstep synchronous clients always land
        in the same batched tick (``ready = every attached slot pending``),
        which makes the overlap a thread-scheduling race; staggering by one
        dispatch makes it a guaranteed property of correct pipelining —
        stream B's window must ride the device queue during stream A's
        250 ms tick, or the server has regressed to serialized ticks."""
        import time as time_mod

        pool = server.pool
        orig = pool.push_async
        dispatch_times, fetch_times = [], []
        delay = 0.25

        class SlowPreds:
            """Device-array stand-in whose results 'arrive' after a delay."""

            def __init__(self, arr):
                self.arr = arr
                self.t0 = time_mod.monotonic()

            def is_ready(self):
                return time_mod.monotonic() - self.t0 >= delay

            def __array__(self, dtype=None, copy=None):
                while not self.is_ready():
                    time_mod.sleep(0.005)
                fetch_times.append(time_mod.monotonic())
                a = np.asarray(self.arr)
                return a.astype(dtype) if dtype is not None else a

        def slow_push_async(windows):
            out_slots, preds = orig(windows)
            dispatch_times.append(time_mod.monotonic())
            return out_slots, SlowPreds(np.asarray(preds))

        pool.push_async = slow_push_async
        try:
            rng = np.random.default_rng(7)
            streams = [make_windows(rng, 3) for _ in range(2)]
            results = [None] * 2
            errors = []

            def run(i):
                try:
                    c = EventSRClient(*server.address)
                    c.attach()
                    if i == 1:
                        # stagger: wait until stream 0's first window is ON
                        # the device, so this stream's first push cannot be
                        # batched into the same tick
                        deadline = time_mod.monotonic() + 30
                        while not dispatch_times:
                            if time_mod.monotonic() > deadline:
                                raise TimeoutError("tick 1 never dispatched")
                            time_mod.sleep(0.002)
                    results[i] = [c.push(w) for w in streams[i]]
                    c.detach()
                    c.close()
                except Exception as exc:  # noqa: BLE001
                    errors.append((i, exc))

            threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert not errors, errors
        finally:
            pool.push_async = orig

        model, variables = model_vars
        for i in range(2):
            solo = StreamingSR(model, variables, RES, window_size=WINDOW)
            want = [solo.push(w) for w in streams[i]]
            for got, exp in zip(results[i], want):
                if exp is None:
                    assert got is None
                else:
                    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)

        # the overlap actually happened: some tick was dispatched before the
        # previous tick's results were fetched
        overlapped = any(
            d2 < f1 for d2, f1 in zip(dispatch_times[1:], fetch_times)
        )
        assert overlapped, (dispatch_times, fetch_times)

    def test_reattached_slot_never_receives_a_stale_inflight_reply(
        self, server
    ):
        """A slot detached and re-attached by a NEW client while the old
        owner's tick is still in flight must not deliver the old tick's
        reply to the new owner (owners are captured at dispatch)."""
        import socket as socket_mod
        import struct
        import time as time_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        pool = server.pool
        orig = pool.push_async
        delay = 0.3

        class SlowPreds:
            def __init__(self, arr):
                self.arr = arr
                self.t0 = time_mod.monotonic()

            def is_ready(self):
                return time_mod.monotonic() - self.t0 >= delay

            def __array__(self, dtype=None, copy=None):
                while not self.is_ready():
                    time_mod.sleep(0.005)
                a = np.asarray(self.arr)
                return a.astype(dtype) if dtype is not None else a

        def slow_push_async(windows):
            out_slots, preds = orig(windows)
            return out_slots, SlowPreds(np.asarray(preds))

        pool.push_async = slow_push_async
        try:
            ev = np.zeros((4, 4), np.float32)

            # old owner: attach, push one window, then vanish while the tick
            # is still in flight (no reply read, abrupt close)
            raw = socket_mod.create_connection(server.address)
            raw_hello(raw)
            raw.sendall(server_mod._frame(server_mod.ATTACH))
            opcode, payload = server_mod._read_frame(raw)
            assert opcode == server_mod.ATTACHED
            (slot,) = struct.unpack("<I", payload[:4])
            body = struct.pack("<II", slot, ev.shape[1]) + ev.tobytes()
            raw.sendall(server_mod._frame(server_mod.PUSH, body))
            time_mod.sleep(0.05)  # let the tick dispatch
            raw.close()

            # wait until the server reaped the dead connection (the loop
            # keeps servicing sockets even while the tick is in flight —
            # that IS the pipelining under test), then grab the same slot
            deadline = time_mod.monotonic() + 10
            while slot in server._slot_owner:
                assert time_mod.monotonic() < deadline
                time_mod.sleep(0.02)
            client = EventSRClient(*server.address)
            got = client.attach()
            assert got == slot  # same slot recycled
            # first push of the NEW stream must be PENDING — if the old
            # tick's stale reply leaked here, this would be a PRED/PENDING
            # mixup and the assertion below would see a non-None first reply
            assert client.push(ev) is None
            pred = client.push(ev)
            assert pred is not None and pred.shape == (32, 32, 2)
            client.detach()
            client.close()
        finally:
            pool.push_async = orig

    def test_stats_opcode_reports_live_operation(self, server):
        """STATS must reflect the traffic actually served: counts, batch
        occupancy, service latency and trailing throughput, all computed by
        the server thread itself (the production observability surface)."""
        from bmcnet_esr_tpu.inference import server as server_mod

        client = EventSRClient(*server.address)

        fresh = client.stats()
        assert fresh["protocol_version"] == server_mod.PROTOCOL_VERSION
        assert fresh["slots_total"] == 4 and fresh["window_size"] == WINDOW
        assert fresh["conns_open"] >= 1
        before_windows = fresh["windows_served"]
        before_ticks = fresh["ticks"]

        client.attach()
        rng = np.random.default_rng(11)
        n_windows = 4
        preds = [client.push(w) for w in make_windows(rng, n_windows)]
        stats = client.stats()
        client.detach()
        client.close()

        n_pred = sum(p is not None for p in preds)
        assert stats["windows_served"] >= before_windows + n_pred
        assert stats["ticks"] >= before_ticks + n_windows
        assert stats["pendings_sent"] >= 1  # the stream's first window
        assert stats["slots_attached"] >= 1
        # latency: measured, positive, ordered p50 <= p99 <= max
        assert 0 < stats["latency_ms_p50"] <= stats["latency_ms_p99"]
        assert stats["latency_ms_p99"] <= stats["latency_ms_max"]
        # solo client -> every tick carried exactly one window
        assert stats["batch_occupancy_last"] == 1
        assert stats["throughput_wps_10s"] > 0
        assert stats["uptime_s"] > 0

        # errors are counted: provoke one protocol error
        bad = EventSRClient(*server.address)
        bad.slot = 12345
        with pytest.raises(RuntimeError, match="not yours"):
            bad.push(np.zeros((4, 4), np.float32))
        after = bad.stats()
        bad.close()
        assert after["errors_sent"] >= stats["errors_sent"] + 1

    def test_disconnect_releases_slots(self, server):
        clients = [EventSRClient(*server.address) for _ in range(4)]
        for c in clients:
            c.attach()
        extra = EventSRClient(*server.address)
        with pytest.raises(RuntimeError, match="busy"):
            extra.attach()
        for c in clients:
            c.close()  # drop without detach
        # server reaps dropped connections and frees their slots
        deadline = __import__("time").monotonic() + 10
        while True:
            try:
                extra.attach()
                break
            except RuntimeError:
                assert __import__("time").monotonic() < deadline
                __import__("time").sleep(0.05)
        extra.detach()
        extra.close()


class TestReload:
    def test_reload_opcode_hot_swaps_without_dropping_streams(self, model_vars):
        """RELOAD swaps weights mid-stream: the client keeps its slot and
        recurrent state, later predictions come from the new weights, and
        stats reports the bumped weights_version."""
        model, v1 = model_vars
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        v2 = model.init(jax.random.key(41), dummy, *model.init_state(1, h, w))
        srv = EventSRServer(
            model, v1, RES, slots=2, window_size=WINDOW, port=0,
            batch_window_ms=1.0, weight_loader=lambda: v2,
        )
        srv.start()
        try:
            rng = np.random.default_rng(11)
            wins = make_windows(rng, 4)
            c = EventSRClient(*srv.address)
            c.attach()
            assert c.push(wins[0]) is None
            before = c.push(wins[1])
            assert c.reload() == 2
            after = [c.push(wv) for wv in wins[2:]]
            stats = c.stats()
            assert stats["weights_version"] == 2
            assert stats["reloads_failed"] == 0
            c.detach()
            c.close()
        finally:
            srv.shutdown()

        solo = StreamingSR(model, v1, RES, window_size=WINDOW)
        want_before = [solo.push(wv) for wv in wins[:2]][1]
        solo.reload(v2)
        want_after = [solo.push(wv) for wv in wins[2:]]
        np.testing.assert_allclose(before, want_before, rtol=1e-5, atol=1e-6)
        for g, wv in zip(after, want_after):
            np.testing.assert_allclose(g, wv, rtol=1e-5, atol=1e-6)

    def test_reload_without_loader_is_a_clean_error(self, server):
        c = EventSRClient(*server.address)
        c.attach()
        with pytest.raises(RuntimeError, match="reload not enabled"):
            c.reload()
        # the connection (and the daemon) survives the refused reload
        rng = np.random.default_rng(12)
        wins = make_windows(rng, 2)
        assert c.push(wins[0]) is None
        assert c.push(wins[1]) is not None
        c.detach()
        c.close()

    def test_failing_loader_keeps_old_weights_serving(self, model_vars):
        """A loader that raises (bad checkpoint on disk) must produce an
        ERROR reply, count in reloads_failed, and leave the stream's
        trajectory exactly on the old weights."""
        model, v1 = model_vars

        def bad_loader():
            raise IOError("checkpoint corrupt")

        srv = EventSRServer(
            model, v1, RES, slots=2, window_size=WINDOW, port=0,
            batch_window_ms=1.0, weight_loader=bad_loader,
        )
        srv.start()
        try:
            rng = np.random.default_rng(13)
            wins = make_windows(rng, 3)
            c = EventSRClient(*srv.address)
            c.attach()
            c.push(wins[0])
            with pytest.raises(RuntimeError, match="checkpoint corrupt"):
                c.reload()
            got = [c.push(wv) for wv in wins[1:]]
            stats = c.stats()
            assert stats["weights_version"] == 1
            assert stats["reloads_failed"] == 1
            c.close()
        finally:
            srv.shutdown()
        solo = StreamingSR(model, v1, RES, window_size=WINDOW)
        want = [solo.push(wv) for wv in wins]
        for g, wv in zip(got, want[1:]):
            np.testing.assert_allclose(g, wv, rtol=1e-5, atol=1e-6)

    def test_sighup_triggers_reload(self, model_vars):
        """trigger_reload (the serve CLI's SIGHUP path) swaps weights with
        no client involved."""
        model, v1 = model_vars
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        v2 = model.init(jax.random.key(42), dummy, *model.init_state(1, h, w))
        srv = EventSRServer(
            model, v1, RES, slots=2, window_size=WINDOW, port=0,
            batch_window_ms=1.0, weight_loader=lambda: v2,
        )
        srv.start()
        try:
            srv.trigger_reload()
            c = EventSRClient(*srv.address)
            deadline = __import__("time").monotonic() + 5.0
            while c.stats()["weights_version"] != 2:
                assert __import__("time").monotonic() < deadline
            c.close()
        finally:
            srv.shutdown()


class TestResume:
    def test_resume_continues_stream_after_disconnect(self, server, model_vars):
        """A resumable stream dropped mid-rollout reclaims its slot on a new
        connection and continues EXACTLY where it left off (recurrent state
        is the whole point of resume)."""
        import time

        model, variables = model_vars
        rng = np.random.default_rng(21)
        wins = make_windows(rng, 4)

        c1 = EventSRClient(*server.address)
        slot = c1.attach(resumable=True)
        token = c1.token
        assert token != bytes(16)
        assert c1.push(wins[0]) is None
        p1 = c1.push(wins[1])
        c1.close()  # no DETACH — simulated network drop

        deadline = time.monotonic() + 5.0
        c2 = EventSRClient(*server.address)
        while c2.stats()["slots_orphaned"] != 1:
            assert time.monotonic() < deadline
            time.sleep(0.02)
        seen = c2.resume(slot, token)
        assert seen == 2
        p2 = [c2.push(wv) for wv in wins[2:]]
        assert c2.stats()["slots_orphaned"] == 0
        c2.detach()
        c2.close()

        solo = StreamingSR(model, variables, RES, window_size=WINDOW)
        want = [solo.push(wv) for wv in wins]
        np.testing.assert_allclose(p1, want[1], rtol=1e-5, atol=1e-6)
        for g, wv in zip(p2, want[2:]):
            np.testing.assert_allclose(g, wv, rtol=1e-5, atol=1e-6)

    def test_wrong_token_rejected_valid_token_preempts(self, server):
        """The bearer token is the authority over the slot, not the socket:
        a wrong token is always refused, while a valid RESUME preempts even
        a still-"owned" slot — after a half-open drop (NAT timeout) the
        server may never see FIN/RST, and the reconnecting holder must not
        be locked out by its own stale connection."""
        rng = np.random.default_rng(22)
        wins = make_windows(rng, 3)
        c1 = EventSRClient(*server.address)
        slot = c1.attach(resumable=True)
        token = c1.token
        c1.push(wins[0])

        c2 = EventSRClient(*server.address)
        # wrong token: rejected whether the slot is live or orphaned
        with pytest.raises(RuntimeError, match="not resumable"):
            c2.resume(slot, bytes(16))
        # valid token: preempts the (possibly half-open) old connection
        assert c2.resume(slot, token) == 1
        c2.push(wins[1])
        # the stale owner's claim is gone — its pushes get a clean error
        c1.slot = slot
        with pytest.raises(RuntimeError, match="not yours"):
            c1.push(wins[2])
        c1.close()
        c2.detach()
        c2.close()

    def test_reload_flood_is_bounded_to_one_inflight(self, model_vars):
        """A RELOAD-spamming client must not stack loader threads/weight
        copies: while one load is in flight further RELOADs get a clean
        ERROR (and count in reloads_failed), and the daemon keeps serving."""
        import threading
        import time

        model, v1 = model_vars
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        v2 = model.init(jax.random.key(5), dummy, *model.init_state(1, h, w))
        release = threading.Event()
        loads = []

        def slow_loader():
            loads.append(1)
            release.wait(10)
            return v2

        srv = EventSRServer(
            model, v1, RES, slots=2, window_size=WINDOW, port=0,
            batch_window_ms=1.0, weight_loader=slow_loader,
        )
        srv.start()
        try:
            from bmcnet_esr_tpu.inference import server as server_mod

            c = EventSRClient(*srv.address)
            # first RELOAD starts the (slow) load...
            c._sock.sendall(server_mod._frame(server_mod.RELOAD))
            time.sleep(0.1)
            # ...every further RELOAD while it runs is refused immediately
            for _ in range(5):
                with pytest.raises(RuntimeError, match="already in progress"):
                    c.reload()
            assert len(loads) == 1
            release.set()
            # the first RELOAD's reply finally arrives: the swap applied
            opcode, body = server_mod._read_frame(c._sock)
            assert opcode == server_mod.RELOAD_OK
            stats = c.stats()
            assert stats["weights_version"] == 2
            assert stats["reloads_failed"] == 5
            # and a reload AFTER completion works again
            assert c.reload() == 3
            c.close()
        finally:
            release.set()
            srv.shutdown()

    def test_operator_reload_does_not_release_a_running_loaders_guard(
        self, model_vars
    ):
        """reload(variables) (the operator API) never set _reload_inflight,
        so applying it must NOT clear the flag a still-running RELOAD
        loader owns — otherwise RELOAD spam could stack loader threads
        behind a slow load and race their completion order."""
        import threading
        import time

        model, v1 = model_vars
        h, w = RES
        dummy = jnp.zeros((1, 2, h, w, 2))
        v2 = model.init(jax.random.key(6), dummy, *model.init_state(1, h, w))
        release = threading.Event()
        loads = []

        def slow_loader():
            loads.append(1)
            release.wait(10)
            return v2

        srv = EventSRServer(
            model, v1, RES, slots=2, window_size=WINDOW, port=0,
            batch_window_ms=1.0, weight_loader=slow_loader,
        )
        srv.start()
        try:
            from bmcnet_esr_tpu.inference import server as server_mod

            c = EventSRClient(*srv.address)
            c._sock.sendall(server_mod._frame(server_mod.RELOAD))
            deadline = time.monotonic() + 5.0
            while not loads:
                assert time.monotonic() < deadline
                time.sleep(0.01)
            # an operator hot swap lands while the loader still runs...
            srv.reload(v2)
            deadline = time.monotonic() + 5.0
            while c.stats()["weights_version"] != 2:
                assert time.monotonic() < deadline
                time.sleep(0.02)
            # ...and must not have released the loader's single-inflight
            # guard: further RELOADs are still refused, no loader stacked
            with pytest.raises(RuntimeError, match="already in progress"):
                c.reload()
            assert len(loads) == 1
            release.set()
            opcode, body = server_mod._read_frame(c._sock)
            assert opcode == server_mod.RELOAD_OK
            assert c.stats()["weights_version"] == 3
            c.close()
        finally:
            release.set()
            srv.shutdown()

    def test_nonresumable_slot_frees_on_disconnect(self, server):
        import time

        c1 = EventSRClient(*server.address)
        slot = c1.attach()  # resumable=False
        token = c1.token
        assert token == bytes(16)
        c1.close()
        c2 = EventSRClient(*server.address)
        deadline = time.monotonic() + 5.0
        while c2.stats()["slots_attached"] != 0:
            assert time.monotonic() < deadline
            time.sleep(0.02)
        assert c2.stats()["slots_orphaned"] == 0
        with pytest.raises(RuntimeError, match="not resumable"):
            c2.resume(slot, token)
        c2.close()

    def test_orphan_expires_after_grace(self, model_vars):
        """Past resume_grace_s the orphan detaches: the slot frees for new
        streams and the stale token is refused."""
        import time

        model, variables = model_vars
        srv = EventSRServer(
            model, variables, RES, slots=1, window_size=WINDOW, port=0,
            batch_window_ms=1.0, resume_grace_s=0.2,
        )
        srv.start()
        try:
            rng = np.random.default_rng(23)
            wins = make_windows(rng, 2)
            c1 = EventSRClient(*srv.address)
            slot = c1.attach(resumable=True)
            token = c1.token
            c1.push(wins[0])
            c1.close()
            c2 = EventSRClient(*srv.address)
            deadline = time.monotonic() + 5.0
            while c2.stats()["slots_orphaned"] != 0:
                assert time.monotonic() < deadline
                time.sleep(0.05)
            with pytest.raises(RuntimeError, match="not resumable"):
                c2.resume(slot, token)
            # the only slot is free again for a fresh stream
            assert c2.attach() == slot
            assert c2.push(wins[0]) is None  # fresh state: first window
            c2.detach()
            c2.close()
        finally:
            srv.shutdown()


class TestDeepTicks:
    def test_backlog_drains_in_deep_ticks_with_exact_replies(
        self, server, model_vars
    ):
        """A client that blasts windows without reading replies builds a
        backlog; the server must drain it in few deep ticks (not one
        dispatch per window) and every reply must equal the solo rollout in
        per-slot FIFO order."""
        import socket as socket_mod
        import struct as struct_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        model, variables = model_vars
        rng = np.random.default_rng(41)
        wins = make_windows(rng, 12)

        s = socket_mod.create_connection(server.address)
        s.settimeout(20.0)
        raw_hello(s)
        s.sendall(server_mod._frame(server_mod.ATTACH, b""))
        opcode, body = server_mod._read_frame(s)
        assert opcode == server_mod.ATTACHED
        (slot,) = struct_mod.unpack("<I", body[:4])

        ticks_before = server.ticks
        blob = b"".join(
            server_mod._frame(
                server_mod.PUSH,
                struct_mod.pack("<II", slot, w.shape[1])
                + np.ascontiguousarray(w, np.float32).tobytes(),
            )
            for w in wins
        )
        s.sendall(blob)  # 12 windows, no reply reads in between

        replies = [server_mod._read_frame(s) for _ in range(len(wins))]
        assert replies[0][0] == server_mod.PENDING
        preds = []
        for opcode, body in replies[1:]:
            assert opcode == server_mod.PRED
            code, kh, kw, c, scale = server_mod._PRED_HEAD.unpack_from(body)
            assert code == 0 and scale == 1.0  # default wire is float32
            preds.append(
                np.frombuffer(
                    body, np.float32, kh * kw * c,
                    offset=server_mod._PRED_HEAD.size,
                ).reshape(kh, kw, c)
            )
        # exactness: per-slot FIFO order equals the solo rollout
        solo = StreamingSR(model, variables, RES, window_size=WINDOW)
        want = [solo.push(w) for w in wins]
        for g, w in zip(preds, want[1:]):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
        # and it was amortized: 12 windows in far fewer dispatches
        # (depth ladder: e.g. 8 + 4, plus maybe a shallow first tick)
        assert server.ticks - ticks_before <= 5
        s.close()

    def test_scan_k_1_disables_deep_ticks(self, model_vars):
        model, variables = model_vars
        srv = EventSRServer(
            model, variables, RES, slots=2, window_size=WINDOW, port=0,
            batch_window_ms=1.0, scan_k=1,
        )
        srv.start()
        try:
            rng = np.random.default_rng(42)
            wins = make_windows(rng, 4)
            c = EventSRClient(*srv.address)
            c.attach()
            got = [c.push(w) for w in wins]
            assert got[0] is None and all(p is not None for p in got[1:])
            assert srv.ticks == 4  # one dispatch per window
        finally:
            srv.shutdown()

    def test_prewarm_compiles_ladder_without_touching_state(self, model_vars):
        """prewarm() must build every ladder program and leave stream state
        untouched (masked-out ticks are numeric no-ops)."""
        model, variables = model_vars
        srv = EventSRServer(
            model, variables, RES, slots=2, window_size=WINDOW, port=0,
            batch_window_ms=1.0, scan_k=4,
        )
        srv.prewarm()  # before traffic — the CLI's startup sequence
        assert set(srv.pool._deep_steps) == {2, 4}
        srv.start()
        try:
            rng = np.random.default_rng(43)
            wins = make_windows(rng, 3)
            c = EventSRClient(*srv.address)
            c.attach()
            c.push(wins[0])
            got = [c.push(w) for w in wins[1:]]
            solo = StreamingSR(model, variables, RES, window_size=WINDOW)
            want = [solo.push(w) for w in wins]
            for g, w in zip(got, want[1:]):
                np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
            c.detach()
            c.close()
        finally:
            srv.shutdown()

    def test_chunked_fetch_server_matches_solo(self, model_vars):
        """fetch_chunks=2 end-to-end: shallow ticks (interactive push) and
        deep ticks (a blasted backlog) both reassemble the LIST-of-chunks
        fetch correctly — every reply equals the solo rollout, proving
        the server's assemble_fetch(deep=...) axis handling."""
        import socket as socket_mod
        import struct as struct_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        model, variables = model_vars
        srv = EventSRServer(
            model, variables, RES, slots=4, window_size=WINDOW, port=0,
            batch_window_ms=1.0, scan_k=4, fetch_chunks=2,
        )
        srv.start()
        try:
            rng = np.random.default_rng(45)
            # shallow path: interactive client
            wins_a = make_windows(rng, 4)
            c = EventSRClient(*srv.address)
            c.attach()
            got_a = [c.push(w) for w in wins_a]
            # deep path: blast a backlog without reading replies
            wins_b = make_windows(rng, 8)
            s = socket_mod.create_connection(srv.address)
            s.settimeout(20.0)
            raw_hello(s)
            s.sendall(server_mod._frame(server_mod.ATTACH, b""))
            opcode, body = server_mod._read_frame(s)
            assert opcode == server_mod.ATTACHED
            (slot,) = struct_mod.unpack("<I", body[:4])
            s.sendall(b"".join(
                server_mod._frame(
                    server_mod.PUSH,
                    struct_mod.pack("<II", slot, w.shape[1])
                    + np.ascontiguousarray(w, np.float32).tobytes(),
                )
                for w in wins_b
            ))
            replies = [server_mod._read_frame(s) for _ in range(len(wins_b))]
            assert replies[0][0] == server_mod.PENDING
            got_b = []
            for opcode, body in replies[1:]:
                assert opcode == server_mod.PRED
                _, kh, kw, ch, _ = server_mod._PRED_HEAD.unpack_from(body)
                got_b.append(np.frombuffer(
                    body, np.float32, kh * kw * ch,
                    offset=server_mod._PRED_HEAD.size,
                ).reshape(kh, kw, ch))
            s.close()
            c.detach()
            c.close()

            for wins, got in ((wins_a, got_a[1:]), (wins_b, got_b)):
                solo = StreamingSR(model, variables, RES, window_size=WINDOW)
                want = [solo.push(w) for w in wins]
                for g, w in zip(got, want[1:]):
                    np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
        finally:
            srv.shutdown()

    def test_client_pipelining_api(self, server, model_vars):
        """push_nowait/read_reply: replies arrive in push order and equal
        the solo rollout (the flow-controlled client loop bench_serving
        uses)."""
        model, variables = model_vars
        rng = np.random.default_rng(44)
        wins = make_windows(rng, 6)
        c = EventSRClient(*server.address)
        c.attach()
        for w in wins[:4]:
            c.push_nowait(w)
        got = [c.read_reply() for _ in range(4)]
        for w in wins[4:]:
            c.push_nowait(w)
        got += [c.read_reply() for _ in range(2)]
        solo = StreamingSR(model, variables, RES, window_size=WINDOW)
        want = [solo.push(w) for w in wins]
        assert got[0] is None
        for g, w in zip(got[1:], want[1:]):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
        c.detach()
        c.close()


class TestAsyncFetch:
    def test_dispatch_and_stats_stay_live_during_a_blocked_transfer(
        self, server, model_vars
    ):
        """The device->host prediction transfer runs on the fetcher thread:
        while tick N's ``np.asarray`` is mid-transfer (gated here), the
        serve loop must still DISPATCH tick N+1 and answer STATS — on a
        remote-attached chip the transfer costs more than the compute, and
        the old inline fetch serialized the whole loop behind it.  Replies
        must still drain in FIFO order with solo-rollout values."""
        import time as time_mod

        pool = server.pool
        orig = pool.push_async
        gate = threading.Event()  # held: every transfer blocks
        transfer_started = threading.Event()
        dispatch_times = []

        class GatedPreds:
            def __init__(self, arr):
                self.arr = arr

            def __array__(self, dtype=None, copy=None):
                transfer_started.set()
                assert gate.wait(30), "test gate never opened"
                a = np.asarray(self.arr)
                return a.astype(dtype) if dtype is not None else a

        def gated_push_async(windows):
            out_slots, preds = orig(windows)
            dispatch_times.append(time_mod.monotonic())
            return out_slots, GatedPreds(np.asarray(preds))

        pool.push_async = gated_push_async
        try:
            rng = np.random.default_rng(45)
            wins = make_windows(rng, 2)
            c = EventSRClient(*server.address)
            c.attach()
            c.push_nowait(wins[0])
            assert transfer_started.wait(30)  # tick 1 is mid-transfer
            c.push_nowait(wins[1])
            deadline = time_mod.monotonic() + 10
            while len(dispatch_times) < 2:  # tick 2 dispatches regardless
                assert time_mod.monotonic() < deadline, (
                    "dispatch blocked behind an in-flight transfer"
                )
                time_mod.sleep(0.002)
            # ...and the control plane stays responsive too
            mon = EventSRClient(*server.address)
            stats = mon.stats()
            assert stats["inflight_ticks"] >= 1
            mon.close()
            gate.set()
            got = [c.read_reply(), c.read_reply()]
        finally:
            gate.set()
            pool.push_async = orig
        model, variables = model_vars
        solo = StreamingSR(model, variables, RES, window_size=WINDOW)
        want = [solo.push(w) for w in wins]
        assert got[0] is None
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5, atol=1e-6)
        c.detach()
        c.close()


class TestErrorReplies:
    """A failed tick must send one ERROR per CONSUMED window — a pipelining
    client counts one reply per PUSH, and a deep tick may have drained
    several of its windows; under-replying would strand it in read_reply()."""

    N = 6

    def _blast_and_read(self, server, n):
        """Push n windows without reading, then collect n reply frames."""
        from bmcnet_esr_tpu.inference import server as server_mod

        rng = np.random.default_rng(61)
        wins = make_windows(rng, n)
        c = EventSRClient(*server.address)
        c.attach()
        c._sock.settimeout(30.0)
        for w in wins:
            c.push_nowait(w)
        frames = [server_mod._read_frame(c._sock) for _ in range(n)]
        return c, frames

    def test_deep_tick_dispatch_failure_errors_every_consumed_window(
        self, server
    ):
        from bmcnet_esr_tpu.inference import server as server_mod

        pool = server.pool
        orig_deep, orig_shallow = pool.push_async_deep, pool.push_async

        def boom(*args, **kwargs):
            raise RuntimeError("device rejected the dispatch")

        pool.push_async_deep = boom
        pool.push_async = boom
        try:
            c, frames = self._blast_and_read(server, self.N)
        finally:
            pool.push_async_deep = orig_deep
            pool.push_async = orig_shallow
        assert [op for op, _ in frames] == [server_mod.ERROR] * self.N
        # errored windows still land latency samples, so an error burst is
        # visible in the percentiles instead of vanishing from stats()
        assert len(server._latency) >= self.N
        assert server.stats()["latency_ms_p50"] is not None
        # the daemon survives and serves the same connection afterwards
        rng = np.random.default_rng(62)
        more = make_windows(rng, 2)
        assert c.push(more[0]) is None  # ERROR ticks consumed the windows;
        got = c.push(more[1])           # the stream restarts cleanly
        assert got is not None
        c.detach()
        c.close()

    def test_fetch_failure_errors_every_consumed_window(self, server):
        """Same contract on the OTHER failure path: the device->host
        transfer (fetcher thread) raising mid-tick."""
        from bmcnet_esr_tpu.inference import server as server_mod

        pool = server.pool
        orig_deep, orig_shallow = pool.push_async_deep, pool.push_async

        class FailingPreds:
            def __array__(self, dtype=None, copy=None):
                raise RuntimeError("transfer died")

        def deep(windows, depth):
            out_map, _ = orig_deep(windows, depth)
            return out_map, FailingPreds()

        def shallow(windows):
            out_slots, _ = orig_shallow(windows)
            return out_slots, FailingPreds()

        pool.push_async_deep = deep
        pool.push_async = shallow
        try:
            c, frames = self._blast_and_read(server, self.N)
        finally:
            pool.push_async_deep = orig_deep
            pool.push_async = orig_shallow
        assert [op for op, _ in frames] == [server_mod.ERROR] * self.N
        assert len(server._latency) >= self.N  # error burst visible in stats
        c.close()


class TestServeCliSigterm:
    """SIGTERM — what init systems and container runtimes send — must get
    the bounded graceful drain: the daemon dispatches accepted windows,
    delivers in-flight replies, FINs each connection (reply then clean EOF,
    never RST), and exits 0.  Mirrors the trainer's preemption handling."""

    def test_sigterm_mid_stream_replies_then_eof(self):
        import os
        import re
        import signal
        import subprocess
        import sys
        import time

        from conftest import clean_cpu_env

        env = clean_cpu_env()  # no axon plugin (single-client rule)
        ckpt = os.path.join(os.path.dirname(__file__), "goldens", "plain_small.npz")
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "bmcnet_esr_tpu.cli.serve",
                "--model_path", ckpt, "--variant", "plain", "--scale", "2",
                "--n_c", "8", "--n_b", "2", "--resolution", "16x16",
                "--window", str(WINDOW), "--port", "0", "--stats_every", "0",
                "--scan_k", "2",
            ],
            env=env, stderr=subprocess.PIPE, text=True,
        )
        port = None
        try:
            deadline = time.time() + 240
            seen = []
            while time.time() < deadline:
                line = proc.stderr.readline()
                if not line:
                    break
                seen.append(line)
                m = re.search(r"serving .* on 127\.0\.0\.1:(\d+)", line)
                if m:
                    port = int(m.group(1))
                    break
            assert port, f"daemon never announced its port:\n{''.join(seen)}"
            client = EventSRClient("127.0.0.1", port)
            client.attach()
            rng = np.random.default_rng(3)
            w1, w2 = make_windows(rng, 2)
            assert client.push(w1) is None  # first window: PENDING (warm)
            client.push_nowait(w2)  # leave one window in flight ...
            # give the serve loop one beat to PARSE the frame: bytes still
            # in the kernel buffer are not yet accepted work, but once
            # parsed the window is owed a reply whether it is pending,
            # dispatched, or fetched when the signal lands
            time.sleep(0.5)
            proc.send_signal(signal.SIGTERM)  # ... and preempt the daemon
            pred = client.read_reply()  # the drain must still deliver it
            assert pred is not None and pred.shape == (32, 32, 2)
            with pytest.raises(ConnectionError):  # then clean EOF, no hang
                client.read_reply()
            assert proc.wait(timeout=60) == 0
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()


class TestBenchServingDtype:
    def test_unknown_dtype_raises_with_choices(self):
        """tools/bench_serving must reject unknown dtype names with the
        accepted list (mirroring the CLIs' argparse choices), not a bare
        KeyError."""
        from tools.bench_serving import bench_daemon_loopback

        with pytest.raises(ValueError, match="int8_pall"):
            bench_daemon_loopback("int8x", n_clients=1, windows_per_client=1)


@pytest.mark.slow
class TestShutdownDrain:
    def test_shutdown_answers_pending_windows_then_eof(self, server):
        """shutdown() while a pipelining client has several unread pushes:
        every ACCEPTED window still gets its reply (pending ones are
        dispatched by the drain, not dropped), the socket then FINs cleanly
        — the unread pipelined bytes in the server's receive queue must not
        turn the close into an RST that destroys queued replies."""
        from bmcnet_esr_tpu.inference import server as server_mod

        server.prewarm()  # the serve CLI always prewarns; without it the
        # first tick's compile eats the bounded drain window
        rng = np.random.default_rng(77)
        wins = make_windows(rng, 8)
        c = EventSRClient(*server.address)
        c.attach()
        c._sock.settimeout(30.0)
        for w in wins:
            c.push_nowait(w)
        # let the serve loop parse the frames (accepted work), then stop it
        # before it can possibly have replied to all of them
        import time as time_mod

        time_mod.sleep(0.3)
        server.shutdown()
        got = 0
        while True:
            try:
                opcode, _ = server_mod._read_frame(c._sock)
            except ConnectionError:
                break  # clean EOF after the replies
            assert opcode in (server_mod.PRED, server_mod.PENDING)
            got += 1
        assert got == len(wins), f"only {got}/{len(wins)} replies before EOF"
        c.close()

    # (placed here with the other subprocess-CLI drives)
    def test_serve_cli_mesh_devices_matches_solo(self, model_vars):
        """--mesh_devices 8: the serve CLI shards the slot axis over an
        8-device mesh; a client's replies must equal the solo in-process
        rollout exactly (the pool invariant, now through the CLI flag,
        real sockets and the f32 wire)."""
        import os
        import re
        import subprocess
        import sys
        import time as time_mod

        from conftest import clean_cpu_env

        env = clean_cpu_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        ckpt = os.path.join(
            os.path.dirname(__file__), "goldens", "plain_small.npz"
        )
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "bmcnet_esr_tpu.cli.serve",
                "--model_path", ckpt, "--variant", "plain", "--scale", "2",
                "--n_c", "8", "--n_b", "2", "--resolution", "16x16",
                "--window", str(WINDOW), "--port", "0", "--stats_every", "0",
                "--scan_k", "2", "--slots", "8", "--mesh_devices", "8",
            ],
            env=env, stderr=subprocess.PIPE, text=True,
        )
        try:
            port = None
            deadline = time_mod.time() + 240
            seen = []
            while time_mod.time() < deadline:
                line = proc.stderr.readline()
                if not line:
                    break
                seen.append(line)
                m = re.search(r"serving .* on 127\.0\.0\.1:(\d+)", line)
                if m:
                    port = int(m.group(1))
                    break
            assert port, f"daemon never announced its port:\n{''.join(seen)}"
            rng = np.random.default_rng(11)
            wins = make_windows(rng, 4)
            client = EventSRClient("127.0.0.1", port)
            client.attach()
            got = [client.push(w) for w in wins]
            assert got[0] is None and all(g is not None for g in got[1:])

            from bmcnet_esr_tpu.inference.engine import load_model_for_inference
            from bmcnet_esr_tpu.inference.streaming import StreamingSR

            model, variables = load_model_for_inference(
                ckpt, 2, 8, 2, "plain", "float32"
            )
            solo = StreamingSR(model, variables, RES, window_size=WINDOW)
            for w, g in zip(wins, got):
                want = solo.push(w)
                if want is None:
                    continue
                np.testing.assert_array_equal(
                    g, np.asarray(want, np.float32)
                )
        finally:
            proc.terminate()
            proc.wait(timeout=60)

    def test_wedged_backend_cannot_hang_the_drain(self, model_vars):
        """A dispatch that never returns (dead tunnel mid-h2d, CLAUDE.md's
        silent device_put hang) must not wedge the shutdown drain: the
        drain's fresh dispatches run on an abandonable daemon thread, so
        the serve loop's finally block still finishes within the drain
        deadline with pending windows unanswered (their clients get EOF,
        not a hang)."""
        import threading as th
        import time as time_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        model, variables = model_vars
        srv = EventSRServer(
            model, variables, RES, slots=2, window_size=WINDOW, port=0,
        )
        release = th.Event()

        def wedged(*args, **kwargs):
            release.wait(60.0)  # a dead backend: the call never returns
            raise RuntimeError("released for teardown")

        srv.pool.push_async = wedged
        srv.pool.push_async_deep = wedged
        # pre-load accepted-but-undispatched work (what the drain owes
        # replies for) and enter serve_forever with stop already set: the
        # loop body never runs, only the finally-block drain
        rng = np.random.default_rng(5)
        (win,) = make_windows(rng, 1)
        srv._pending[0] = [(win, time_mod.monotonic())]
        srv._stop.set()
        t0 = time_mod.monotonic()
        srv.serve_forever()
        took = time_mod.monotonic() - t0
        release.set()  # unblock the abandoned drainer thread
        assert took < server_mod._DRAIN_TIMEOUT_S + 5.0, (
            f"drain took {took:.1f}s — wedged dispatch hung the shutdown"
        )


class TestWireDtypes:
    """Protocol v3 wire_dtype: PRED payloads in f16/i8 must decode back to
    the f32-wire predictions within their encoding's error bound, end to
    end through real sockets (the client dequantizes transparently)."""

    @pytest.mark.parametrize("wire_dtype", ["float16", "int8"])
    def test_wire_roundtrip_matches_f32_server(self, model_vars, wire_dtype):
        model, variables = model_vars
        rng = np.random.default_rng(21)
        wins = make_windows(rng, 5)

        srv = EventSRServer(
            model, variables, RES, slots=2, window_size=WINDOW,
            port=0, batch_window_ms=1.0, wire_dtype=wire_dtype,
        )
        srv.start()
        try:
            c = EventSRClient(*srv.address)
            c.attach()
            got = [c.push(w) for w in wins]
            assert srv.stats()["wire_dtype"] == wire_dtype
            c.detach(); c.close()
        finally:
            srv.shutdown()

        solo = StreamingSR(model, variables, RES, window_size=WINDOW)
        want = [solo.push(w) for w in wins]
        assert got[0] is None and want[0] is None
        for g, w in zip(got[1:], want[1:]):
            assert g.dtype == np.float32
            peak = float(np.abs(w).max()) + 1e-12
            tol = peak * (2 ** -10 if wire_dtype == "float16" else 0.75 / 127)
            np.testing.assert_allclose(g, w, atol=tol)

    def test_unknown_wire_dtype_rejected(self, model_vars):
        model, variables = model_vars
        with pytest.raises(ValueError, match="wire_dtype"):
            EventSRServer(model, variables, RES, wire_dtype="uint4")


class TestLaneCompaction:
    def test_compact_lanes_server_matches_solo(self, model_vars):
        """compact_lanes=True end-to-end at partial occupancy (1 client on
        an 8-slot daemon): deep ticks fetch only the pushed lane (the
        bucketed in-graph gather, docs/bench_runs/r5_lane_compaction.json)
        and every reply still equals the solo rollout exactly."""
        import socket as socket_mod
        import struct as struct_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        model, variables = model_vars
        srv = EventSRServer(
            model, variables, RES, slots=8, window_size=WINDOW, port=0,
            batch_window_ms=1.0, scan_k=4, fetch_chunks=2,
            compact_lanes=True,
        )
        srv.start()
        try:
            rng = np.random.default_rng(51)
            wins = make_windows(rng, 9)
            s = socket_mod.create_connection(srv.address)
            s.settimeout(20.0)
            raw_hello(s)
            s.sendall(server_mod._frame(server_mod.ATTACH, b""))
            opcode, body = server_mod._read_frame(s)
            assert opcode == server_mod.ATTACHED
            (slot,) = struct_mod.unpack("<I", body[:4])
            # blast a backlog so ticks go deep (depth > 1 engages compact)
            s.sendall(b"".join(
                server_mod._frame(
                    server_mod.PUSH,
                    struct_mod.pack("<II", slot, w.shape[1])
                    + np.ascontiguousarray(w, np.float32).tobytes(),
                )
                for w in wins
            ))
            replies = [server_mod._read_frame(s) for _ in range(len(wins))]
            assert replies[0][0] == server_mod.PENDING
            got = []
            for opcode, body in replies[1:]:
                assert opcode == server_mod.PRED
                _, kh, kw, ch, _ = server_mod._PRED_HEAD.unpack_from(body)
                got.append(np.frombuffer(
                    body, np.float32, kh * kw * ch,
                    offset=server_mod._PRED_HEAD.size,
                ).reshape(kh, kw, ch))
            s.close()
            # a compact rung really served (k=1 bucket for the lone slot)
            assert any(
                isinstance(key, tuple) for key in srv.pool._deep_steps
            ), "no lane-compacted program was built"
            solo = StreamingSR(model, variables, RES, window_size=WINDOW)
            want = [solo.push(w) for w in wins]
            for g, w in zip(got, want[1:]):
                np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
        finally:
            srv.shutdown()

    def test_prewarm_builds_compact_ladder(self, model_vars):
        """Server prewarm with compact_lanes compiles every (depth, k)
        rung up front — no live tick pays a compile."""
        model, variables = model_vars
        srv = EventSRServer(
            model, variables, RES, slots=4, window_size=WINDOW, port=0,
            batch_window_ms=1.0, scan_k=4, compact_lanes=True,
        )
        try:
            srv.prewarm()
            keys = set(srv.pool._deep_steps)
            # padded depths 2 and 4, plus k in {1, 2} for each
            assert {2, 4, (2, 1), (2, 2), (4, 1), (4, 2)} <= keys
        finally:
            srv.shutdown()


class TestDaemonRobustnessR5:
    """Round-5 review fixes: races and resource bounds that could kill or
    wedge the whole daemon from one client's behavior."""

    def test_rejected_push_does_not_poison_shared_tick(self, server, model_vars):
        """A PUSH that fails validation (bad polarity) must not leave an
        empty queue entry behind: the NEXT shared tick used to IndexError
        on it, erroring every other client's consumed windows."""
        import socket as socket_mod
        import struct as struct_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        model, variables = model_vars
        rng = np.random.default_rng(61)

        def attach(s):
            s.sendall(server_mod._frame(server_mod.ATTACH, b""))
            opcode, body = server_mod._read_frame(s)
            assert opcode == server_mod.ATTACHED
            return struct_mod.unpack("<I", body[:4])[0]

        sa = socket_mod.create_connection(server.address)
        sa.settimeout(20.0)
        raw_hello(sa)
        slot_a = attach(sa)
        bad = make_windows(rng, 1)[0]
        bad[3, 0] = 0.5  # invalid polarity -> per-client rejection
        sa.sendall(server_mod._frame(
            server_mod.PUSH,
            struct_mod.pack("<II", slot_a, bad.shape[1])
            + np.ascontiguousarray(bad, np.float32).tobytes(),
        ))
        opcode, _ = server_mod._read_frame(sa)
        assert opcode == server_mod.ERROR
        # no ghost entry for A's slot may survive the rejection
        assert slot_a not in server._pending

        sb = socket_mod.create_connection(server.address)
        sb.settimeout(20.0)
        raw_hello(sb)
        slot_b = attach(sb)
        good = make_windows(rng, 1)[0]
        sb.sendall(server_mod._frame(
            server_mod.PUSH,
            struct_mod.pack("<II", slot_b, good.shape[1])
            + np.ascontiguousarray(good, np.float32).tobytes(),
        ))
        opcode, _ = server_mod._read_frame(sb)
        assert opcode == server_mod.PENDING  # served, not errored
        sa.close()
        sb.close()

    def test_tick_depth_survives_emptied_pending(self, server):
        """_pending can empty between the due check and the dispatch (a
        reply-drain _drop releases the only pending client's slots); the
        tick path must no-op, not ValueError the serve thread."""
        assert server._pending == {}
        assert server._tick_depth() == 1
        assert server._dispatch_tick() is None

    def test_oversized_unparseable_stream_dropped_not_oomed(self, server):
        """A single 'frame' claiming a length beyond any legitimate frame
        must drop the connection once the buffered residue exceeds the
        inbound cap — never grow rbuf unboundedly."""
        import socket as socket_mod
        import struct as struct_mod

        from bmcnet_esr_tpu.inference import server as server_mod

        import time as time_mod

        before = server.conns_closed
        s = socket_mod.create_connection(server.address)
        s.settimeout(20.0)
        raw_hello(s)
        # one frame header claiming ~3x the cap, then stream garbage
        s.sendall(struct_mod.pack("<BI", server_mod.PUSH, 3 * server_mod._MAX_RBUF))
        blob = b"\x00" * (1 << 20)
        try:
            for _ in range(3 * server_mod._MAX_RBUF // len(blob) + 2):
                s.sendall(blob)
        except (BrokenPipeError, ConnectionResetError):
            pass  # server dropped us mid-stream: exactly the guard firing
        # the server must DROP the connection (counter increments) rather
        # than buffer the stream forever — poll briefly for the teardown
        deadline = time_mod.monotonic() + 10.0
        while server.conns_closed <= before and time_mod.monotonic() < deadline:
            time_mod.sleep(0.05)
        assert server.conns_closed > before, "oversized stream never dropped"
        s.close()
        c = EventSRClient(*server.address)  # daemon still serves
        c.attach()
        c.detach()
        c.close()
