"""Serving runtime: sampling, continuous-batching engine, speculation."""

from quant_tpu.engine.sampler import sample, SamplingConfig
from quant_tpu.engine.engine import Engine, QueueFullError, Request
from quant_tpu.engine.spec import DraftModelProposer, NgramProposer

__all__ = ["DraftModelProposer", "Engine", "NgramProposer",
           "QueueFullError", "Request", "sample", "SamplingConfig"]
