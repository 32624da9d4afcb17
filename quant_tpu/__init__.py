"""quant_tpu — TPU-native quantized-inference engine.

A from-scratch JAX/XLA/Pallas framework generalizing the coodie/quant codec
(float→bin scalar quantization + entropy/byte packing; see cpp/quantref.h for
the frozen codec spec and SURVEY.md for the provenance note that the reference
mount was empty at survey time) into weight-only INT4/INT8 storage with an
INT8 KV-cache for transformer decoding on TPU meshes.

Layering (SURVEY.md §1.2):
  core/        codec: quantize/dequantize, bit packing, entropy coding, QTensor
  ops/         Pallas TPU kernels + jnp fallbacks (fused dequant+matmul, ...)
  models/      pure-JAX model families (Llama)
  parallel/    mesh building, PartitionSpecs, TP/SP/PP helpers
  checkpoint/  HF safetensors -> packed checkpoint converter + loader
  engine/      serving runtime: continuous batching scheduler, decode loop
  utils/       config dataclasses, logging, profiling
"""

__version__ = "0.1.0"
