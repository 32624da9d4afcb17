"""Serving runtime: sampling, continuous-batching engine, speculation."""

from quant_tpu.engine.sampler import sample, SamplingConfig
from quant_tpu.engine.engine import Engine, Request
from quant_tpu.engine.spec import NgramProposer

__all__ = ["Engine", "NgramProposer", "Request", "sample", "SamplingConfig"]
