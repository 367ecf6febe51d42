"""xsdeepfwfm_deprecated_tpu — TPU-native DeepLight / DeepFwFM CTR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``ShanningLiu/xsDeepFwFM_deprecated`` (the DeepLight WSDM'21 reference):
FM-family CTR models (LR/FM/FFM/FwFM/DeepFM/DeepFFM/DeepFwFM/NFM), DeepLight
structural pruning, int8 quantization, QR compositional embeddings, knowledge
distillation, and a serving/latency benchmark suite — built TPU-first with
packed embedding tables, fused interactions, jit-compiled train steps, device
meshes for multi-chip scaling, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from .config import ModelConfig, TrainConfig, get_parser, configs_from_args  # noqa: F401
