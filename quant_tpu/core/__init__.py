"""Codec core: quantization, packing, entropy coding, QTensor format."""

from quant_tpu.core.codec import (
    dequantize,
    pack_int4,
    pack_int4_matmul,
    quantize,
    unpack_int4,
    unpack_int4_matmul,
)
from quant_tpu.core.qtensor import QTensor, quantize_tensor, quantize_tensor_device
from quant_tpu.core import entropy

__all__ = [
    "quantize",
    "dequantize",
    "pack_int4",
    "unpack_int4",
    "pack_int4_matmul",
    "unpack_int4_matmul",
    "QTensor",
    "quantize_tensor",
    "quantize_tensor_device",
    "entropy",
]
