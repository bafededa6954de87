"""TPU-native DC-TTS framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of everything Kyubyong/dc_tts does — Text2Mel,
SSRN, Griffin-Lim, guided-attention training, synthesis — designed for TPU:
functional pytree models, jit-compiled training/decode steps, device-resident
DSP, and mesh-sharded data parallelism.
"""
__version__ = "0.1.0"

from .config import Config, base_config, test_config

__all__ = ["Config", "base_config", "test_config", "__version__"]
