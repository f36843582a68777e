"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding/collective tests run
against ``xla_force_host_platform_device_count=8`` on CPU (the TPU-native
replacement for a fake distributed backend — SURVEY.md §4).  Must run before
jax initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS; pin the platform explicitly so
# tests never silently run on the tunneled chip (and with bf16 matmuls).
import jax

jax.config.update("jax_platform_name", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected xla_force_host_platform_device_count=8"


def clean_cpu_env(repo: str | None = None) -> dict:
    """Subprocess env with the axon chip plugin scrubbed (single-client
    rule, CLAUDE.md) — thin alias of THE implementation in
    bmcnet_esr_tpu.utils.env.clean_cpu_subprocess_env."""
    from bmcnet_esr_tpu.utils.env import clean_cpu_subprocess_env

    return clean_cpu_subprocess_env(repo)
