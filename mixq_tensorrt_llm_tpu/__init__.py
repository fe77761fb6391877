"""mixq_tensorrt_llm_tpu — TPU-native mixed-precision quantized LLM inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Qcompiler/MixQ_Tensorrt_LLM reference (W8A8O16 / W4A8O16 mixed-precision
GEMM with activation-outlier channels, weight-only decode path, int8 KV
cache, Llama/Qwen2 model zoo, quantize/serve/eval pipeline, TP/PP via
jax.sharding) — designed TPU-first, not ported.
"""

__version__ = "0.1.0"

from .quant.config import QuantAlgo, QuantConfig, KVCacheQuantAlgo  # noqa: F401
