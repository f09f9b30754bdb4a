"""SLAM runtime (L4)."""
from .runtime import SLAM  # noqa: F401
from .state import PatchGraph  # noqa: F401
