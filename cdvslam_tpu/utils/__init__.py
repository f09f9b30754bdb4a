from .timer import Timer, ALL_TIMES  # noqa: F401
