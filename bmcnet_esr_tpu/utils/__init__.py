"""Observability utilities: metrics, timers, logging, structured results."""

from bmcnet_esr_tpu.utils.metrics import MetricTracker
from bmcnet_esr_tpu.utils.timers import Timer, DeviceTimer, timing_stats, print_timing_info
from bmcnet_esr_tpu.utils.logging import setup_logging, get_logger
from bmcnet_esr_tpu.utils.yaml_logger import YamlResultLogger
from bmcnet_esr_tpu.utils.tensorboard import TensorboardWriter
from bmcnet_esr_tpu.utils.profiling import annotate, device_time, trace
from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

__all__ = [
    "MetricTracker",
    "Timer",
    "DeviceTimer",
    "timing_stats",
    "print_timing_info",
    "setup_logging",
    "get_logger",
    "YamlResultLogger",
    "TensorboardWriter",
    "annotate",
    "device_time",
    "trace",
    "enable_compilation_cache",
]
