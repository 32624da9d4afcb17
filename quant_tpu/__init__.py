"""quant_tpu — TPU-native quantized-inference engine.

A from-scratch JAX/XLA/Pallas framework generalizing the coodie/quant codec
(float→bin scalar quantization + entropy/byte packing; see cpp/quantref.h for
the frozen codec spec and SURVEY.md for the provenance note that the reference
mount was empty at survey time) into weight-only INT4/INT8 storage with
INT8/INT4 KV-caches for transformer decoding on TPU meshes.

Layering (SURVEY.md §1.2):
  core/        codec: quantize/dequantize, bit packing, entropy coding, QTensor
  kernels/     Pallas TPU kernels (fused dequant+matmul, flash/paged decode
               attention, aliased cache insert, nibble unpack)
  models/      pure-JAX decoder families (Llama/Qwen2/Qwen3/Mistral/Gemma)
  parallel/    mesh building, PartitionSpecs, TP/DP/SP/PP helpers
  checkpoint/  HF safetensors -> packed sharded checkpoint converter + loader
  engine/      serving runtime: continuous batching, paged KV pool, prefix
               cache, speculative decoding, HTTP server
  eval/        perplexity evaluation
  utils/       timing (relay-safe differential), profiling
"""

__version__ = "0.2.0"
