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
