from . import fwfm, int8_mlp  # noqa: F401
