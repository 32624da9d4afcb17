"""Serving runtime: sampling, continuous-batching engine."""

from quant_tpu.engine.sampler import sample, SamplingConfig
from quant_tpu.engine.engine import Engine, Request

__all__ = ["Engine", "Request", "sample", "SamplingConfig"]
