"""Native C++ eventops: parity vs the numpy/JAX implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from bmcnet_esr_tpu import native
from bmcnet_esr_tpu.ops.encodings import event_redistribute_stack, events_to_channels

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain available"
)


class TestRedistribute:
    @pytest.mark.parametrize("shape", [(2, 4, 5, 6), (2, 2, 3, 5, 6)])
    def test_linear_matches_numpy(self, shape):
        rng = np.random.default_rng(0)
        stack = rng.integers(-3, 4, size=shape).astype(np.float32)
        want = event_redistribute_stack(stack, mode="linear")
        got = native.redistribute_stack(stack, mode="linear")
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_empty_stack(self):
        stack = np.zeros((2, 3, 4, 4), np.float32)
        got = native.redistribute_stack(stack)
        assert got.shape == (2, 1, 4)
        assert (got == 0).all()

    def test_random_mode_bins_respected(self):
        rng = np.random.default_rng(1)
        stack = rng.integers(0, 4, size=(1, 4, 6, 6)).astype(np.float32)
        cloud = native.redistribute_stack(stack, mode="random", seed=7)
        num_bins = 4
        for xx, yy, t, p in cloud[0]:
            if p == 0:
                continue
            c = min(int(np.ceil(t * num_bins)) - 1, num_bins - 1)
            assert stack[0, c, int(yy), int(xx)] != 0

    def test_speedup_over_python(self):
        import time

        rng = np.random.default_rng(2)
        stack = rng.integers(-2, 3, size=(4, 8, 32, 32)).astype(np.float32)
        t0 = time.perf_counter()
        native.redistribute_stack(stack)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        event_redistribute_stack(stack)
        t_py = time.perf_counter() - t0
        assert t_native < t_py  # typically 50-200x


class TestLoader:
    def test_binary_is_content_hash_keyed_and_not_committed(self):
        """The .so is rebuilt from source (cache keyed on a content hash),
        self-tested after load, and never lives in VCS (round-1 ADVICE #2)."""
        import os
        import re

        path = native._lib_path()
        assert re.search(r"_eventops_[0-9a-f]{16}\.so$", path)
        assert os.path.exists(path)  # built by native_available() above
        # the build command must not bake in host-specific ISA extensions
        import subprocess
        from unittest import mock

        with mock.patch.object(subprocess, "run") as run:
            native._build("/tmp/ignored.so")
        flags = run.call_args[0][0]
        assert "-march=native" not in flags

    def test_self_test_rejects_broken_library(self):
        class Broken:
            def rasterize_counts(self, *args):
                pass  # leaves img zeroed -> wrong answer

        with pytest.raises(RuntimeError, match="self-test"):
            native._self_test(Broken())


class TestRasterize:
    def test_matches_jax_encoder(self):
        rng = np.random.default_rng(3)
        n, h, w = 2000, 17, 23
        xs = rng.integers(-2, w + 2, n).astype(np.float32)
        ys = rng.integers(-2, h + 2, n).astype(np.float32)
        ps = (rng.integers(0, 2, n) * 2 - 1).astype(np.float32)
        want = np.asarray(events_to_channels(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ps), (h, w)))
        got = native.rasterize_counts(xs, ys, ps, (h, w))
        np.testing.assert_array_equal(got, want)
