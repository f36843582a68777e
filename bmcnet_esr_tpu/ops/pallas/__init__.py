"""Pallas TPU kernels."""

from bmcnet_esr_tpu.ops.pallas.rasterize import (
    pallas_events_to_counts,
    pallas_available,
)

__all__ = ["pallas_events_to_counts", "pallas_available"]
