"""Compute kernels (L2): patch gather, local correlation, segment ops."""
from .patchify import patchify  # noqa: F401
from .corr import corr  # noqa: F401
from .scatter import segment_sum, segment_max, segment_softmax, segment_mean, neighbors_np  # noqa: F401
