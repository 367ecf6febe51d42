from .factory import get_model  # noqa: F401
from . import deepfwfm  # noqa: F401
