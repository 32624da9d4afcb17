"""Pallas TPU kernels: fused dequant+matmul, on-device unpack, KV attention."""

from quant_tpu.kernels.dequant_matmul import (
    dequant_matmul,
    dequant_matmul_reference,
)
from quant_tpu.kernels.unpack import unpack_int4_device

__all__ = [
    "dequant_matmul",
    "dequant_matmul_reference",
    "unpack_int4_device",
]
