from .predictor import Predictor  # noqa: F401
from .benchmark import run_benchmark  # noqa: F401
