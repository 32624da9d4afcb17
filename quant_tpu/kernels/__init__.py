"""Pallas TPU kernels: fused dequant+matmul, on-device unpack, KV attention."""

from quant_tpu.kernels.dequant_matmul import (
    dequant_matmul,
    dequant_matmul_reference,
)
from quant_tpu.kernels.unpack import unpack_int4_device
from quant_tpu.kernels.attention import flash_decode_int8
from quant_tpu.kernels.cache_insert import cache_insert_int8

__all__ = [
    "dequant_matmul",
    "dequant_matmul_reference",
    "unpack_int4_device",
    "flash_decode_int8",
    "cache_insert_int8",
]
