"""Device-mesh parallelism (replaces the reference's NCCL DDP)."""
from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
