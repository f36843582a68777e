"""Jittable event-stream ops: rasterization, resize, pixel (un)shuffle."""

from bmcnet_esr_tpu.ops.encodings import (
    events_to_image,
    events_to_channels,
    events_to_voxel,
    events_to_stack_no_polarity,
    events_to_stack_polarity,
    events_to_mask,
    events_polarity_mask,
    get_hot_event_mask,
    normalize_event_times,
    stack_to_count,
    event_redistribute_stack,
    event_conversion,
    event_restore,
)
from bmcnet_esr_tpu.ops.resize import (
    resize_bicubic,
    resize_bilinear,
    upsample_bilinear,
)
from bmcnet_esr_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

__all__ = [
    "events_to_image",
    "events_to_channels",
    "events_to_voxel",
    "events_to_stack_no_polarity",
    "events_to_stack_polarity",
    "events_to_mask",
    "events_polarity_mask",
    "get_hot_event_mask",
    "normalize_event_times",
    "stack_to_count",
    "event_redistribute_stack",
    "event_conversion",
    "event_restore",
    "resize_bicubic",
    "resize_bilinear",
    "upsample_bilinear",
    "pixel_shuffle",
    "pixel_unshuffle",
]
