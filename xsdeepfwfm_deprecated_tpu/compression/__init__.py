from . import pruning, quantization, distillation  # noqa: F401
