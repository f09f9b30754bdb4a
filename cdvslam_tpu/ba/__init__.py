"""Bundle adjustment + pose graph solvers (L2)."""
from .ba import ba_solve, BAParams, INFERENCE_PARAMS, TRAINING_PARAMS  # noqa: F401
