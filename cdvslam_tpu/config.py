"""Config system: yacs-compatible CfgNode + the reference's default knobs.

Mirrors reference cdvslam/config.py:1-50 exactly (same keys, same
defaults) plus TPU-specific additions at the bottom. Three-tier override:
defaults -> YAML preset (merge_from_file) -> CLI list (merge_from_list).
"""
from __future__ import annotations

import copy


class CfgNode(dict):
    """Minimal yacs-style config node with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_file(self, path):
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        for k, v in data.items():
            self[k] = v
        return self

    def merge_from_list(self, opts):
        assert len(opts) % 2 == 0, "opts must be KEY VALUE pairs"
        for k, v in zip(opts[::2], opts[1::2]):
            if k in self and not isinstance(self[k], str):
                cur = self[k]
                if isinstance(cur, bool):
                    v = str(v).lower() in ("1", "true", "yes")
                elif isinstance(cur, int):
                    v = int(v)
                elif isinstance(cur, float):
                    v = float(v)
            self[k] = v
        return self


_C = CfgNode(
    # --- reference knobs (cdvslam/config.py) ---
    BUFFER_SIZE=4096,
    PATCHES_PER_FRAME=96,
    REMOVAL_WINDOW=22,
    OPTIMIZATION_WINDOW=10,
    PATCH_LIFETIME=13,
    KEYFRAME_INDEX=4,
    KEYFRAME_THRESH=15.0,
    MOTION_MODEL="DAMPED_LINEAR",
    MOTION_DAMPING=0.5,
    MIXED_PRECISION=True,
    LOOP_CLOSURE=False,
    BACKEND_THRESH=64.0,
    MAX_EDGE_AGE=1000,
    GLOBAL_OPT_FREQ=15,
    CLASSIC_LOOP_CLOSURE=False,
    # run the Sim3 PGO inline instead of on a worker thread: deterministic
    # application frame (tests / single-core hosts); the reference always
    # uses an async process pool (long_term.py:29-31)
    CLASSIC_LOOP_SYNC=False,
    LOOP_RETR_THRESH=0.04,
    LOOP_RETR_RADIUS=50,
    LOOP_CLOSE_NMS=50,   # NMS radius around already-closed loop pairs
    SEG_HEAD="",
    DEPTH_HEAD="",
    FILTER_DYNAMIC_CLASS=False,
    MOTION_PROBE_THR=2.0,
    CENTROID_SEL_STRAT="RANDOM_GRID",
    CENTROID_SAMPLE_STRAT="UPPERLEFT",
    VIEW_FILTERED_WEIGHT=False,
    # --- TPU build additions ---
    EDGE_BUCKETS=(512, 1024, 2048, 4096),  # padded edge-count compile buckets
    POSE_WINDOW=16,                        # static BA pose-window capacity
    GLOBAL_POSE_BUCKETS=(64, 128, 256, 512, 1024, 2048, 4096),
    COMPUTE_DTYPE="bfloat16",              # network compute dtype on TPU
)


def get_cfg():
    return _C.clone()
