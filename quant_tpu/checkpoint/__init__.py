"""Checkpoint: packed at-rest format + HF safetensors converter."""

from quant_tpu.checkpoint.format import save_checkpoint, load_checkpoint
from quant_tpu.checkpoint.hf import convert_hf_llama

__all__ = ["save_checkpoint", "load_checkpoint", "convert_hf_llama"]
