"""Evaluation: perplexity harness."""

from quant_tpu.eval.perplexity import perplexity

__all__ = ["perplexity"]
