"""Inference/evaluation engine + streaming serving API."""

from bmcnet_esr_tpu.inference.engine import InferenceEngine, load_model_for_inference
from bmcnet_esr_tpu.inference.export import ExportedStream, export_serving_bundle
from bmcnet_esr_tpu.inference.server import EventSRClient, EventSRServer
from bmcnet_esr_tpu.inference.streaming import StreamingSR, StreamPool

__all__ = [
    "EventSRClient",
    "EventSRServer",
    "ExportedStream",
    "InferenceEngine",
    "StreamPool",
    "StreamingSR",
    "export_serving_bundle",
    "load_model_for_inference",
]
