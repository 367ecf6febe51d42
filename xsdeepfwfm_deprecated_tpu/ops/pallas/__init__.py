from . import int8_mlp  # noqa: F401
