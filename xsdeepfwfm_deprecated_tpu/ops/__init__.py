from . import embedding, interactions, mlp, quantized  # noqa: F401
