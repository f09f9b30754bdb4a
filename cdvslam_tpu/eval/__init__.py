"""Evaluation utilities (L7)."""
from .ate import ate_rmse, umeyama_alignment, associate_timestamps  # noqa: F401
