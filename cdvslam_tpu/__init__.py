"""CDV-SLAM-TPU: a TPU-native (JAX/XLA/Pallas) deep visual SLAM framework.

A ground-up rebuild of the capabilities of CDV-SLAM (monocular deep patch
visual odometry + semantic/geometric SLAM, cf. /root/reference) designed for
TPU hardware: fixed-shape masked tensor programs under ``jit``, MXU-friendly
batched linear algebra for bundle adjustment, Pallas kernels for the patch
correlation hot path, and ``jax.sharding``-based data parallel training.

Layer map (mirrors reference SURVEY.md section 1):
  L0  cdvslam_tpu.lie        -- SO3/RxSO3/SE3/Sim3 Lie groups (pure JAX)
  L1  cdvslam_tpu.geom       -- projective geometry (iproj/proj/transform)
  L2  cdvslam_tpu.ops        -- patchify / correlation kernels (XLA + Pallas)
  L2  cdvslam_tpu.ba         -- bundle adjustment + Sim3 pose graph solvers
  L3  cdvslam_tpu.models     -- VONet / CDVNet networks (flax)
  L4  cdvslam_tpu.slam       -- SLAM runtime (patch graph, keyframing)
  L5  cdvslam_tpu.loop       -- loop closure backends
  L6  cdvslam_tpu.train      -- trainers, data readers
  L7  demo.py / evaluate_*.py entry points
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compiles of the big kernels are
# expensive (especially with remote compilation); cache them across runs.
import os as _os

_cache_dir = _os.environ.get("CDVSLAM_JAX_CACHE", "/tmp/cdvslam_jax_cache")
try:
    import jax as _jax

    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass
