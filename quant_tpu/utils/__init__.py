"""Utilities: timing, profiling, logging."""

from quant_tpu.utils.timing import differential_time, force_sync
from quant_tpu.utils.profiling import trace

__all__ = ["differential_time", "force_sync", "trace"]
