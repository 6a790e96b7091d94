"""cold_compress_tpu: a TPU-native KV-cache-compression generation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
AnswerDotAI/cold-compress (see SURVEY.md): a hackable toolkit for creating,
extending, and comparing KV-cache compression methods on top of a compiled
Llama/Qwen generation engine, with weight quantization, tensor parallelism
over TPU meshes, and a long-context evaluation harness.
"""

__version__ = "0.1.0"

from .models.config import ModelConfig  # noqa: F401
