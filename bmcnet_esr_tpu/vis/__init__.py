"""Event visualisation: count images, stacks, 3-D clouds, PLY export."""

from bmcnet_esr_tpu.vis.events import EventVisualizer, render_event_count

__all__ = ["EventVisualizer", "render_event_count"]
