"""Subprocess environment sanitation for this host's TPU attachment.

The axon PJRT plugin (CLAUDE.md) makes two things true of ANY Python child
that inherits the parent env: plugin init is mandatory once
``JAX_PLATFORMS=axon`` is set (a down tunnel hangs the child before it
prints a byte), and a second concurrent axon client can wedge BOTH
processes (single-client rule).  Every CPU-only subprocess — pytest
drivers, bench children, dryrun workers — must therefore scrub the plugin
from its env.  This is THE one implementation; tests (conftest), bench.py
and ``__graft_entry__`` all delegate here so a future env gotcha is fixed
in one place.
"""

from __future__ import annotations

import os


def clean_cpu_subprocess_env(repo: str | None = None) -> dict:
    """Env for a CPU-only Python subprocess: no ``JAX_PLATFORMS``, no axon
    site dir on ``PYTHONPATH``, repo root prepended."""
    if repo is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    parts = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    return env
