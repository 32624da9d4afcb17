"""Model families (pure JAX, quantized weights via QTensor)."""

from quant_tpu.models.config import ModelConfig, PRESETS
from quant_tpu.models import llama

__all__ = ["ModelConfig", "PRESETS", "llama"]
