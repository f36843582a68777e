"""Inference/evaluation engine."""

from bmcnet_esr_tpu.inference.engine import InferenceEngine, load_model_for_inference

__all__ = ["InferenceEngine", "load_model_for_inference"]
