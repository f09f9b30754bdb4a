"""Projective geometry ops (L1)."""
from .projective import iproj, proj, transform, point_cloud, flow_mag, MIN_DEPTH  # noqa: F401
