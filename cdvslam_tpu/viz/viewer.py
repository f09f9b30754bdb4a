"""Headless trajectory/point-cloud viewer.

The reference ships an interactive Open3D window in a separate process
(reference: cdvslam/o3dviewer.py). Open3D isn't available in this
environment, so the same hooks render periodic matplotlib snapshots
(camera trajectory + colored patch point cloud + current frame) to PNG --
usable over SSH/batch runs. If open3d is importable, prefer porting the
interactive viewer on top of these same hooks.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


class SnapshotViewer:
    """Implements the subset of the O3DViewer surface the runtime calls."""

    def __init__(self, slam, out_dir="viewer_out", every=10):
        self.slam = slam
        self.out = Path(out_dir)
        self.out.mkdir(exist_ok=True, parents=True)
        self.every = every
        self.count = 0
        self.last_image = None

    def update_image(self, image, *args, **kwargs):
        self.last_image = np.asarray(image)
        self.count += 1
        if self.count % self.every == 0:
            self.render(f"{self.out}/frame_{self.count:05d}.png")

    def add_delta(self, *args, **kwargs):
        pass

    def render(self, path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        slam = self.slam
        n = slam.pg.n
        if n < 2:
            return
        poses = np.asarray(slam.pg.poses_[:n])
        # camera centers = -R^T t
        from ..lie import se3_inv
        import jax.numpy as jnp

        inv = np.asarray(se3_inv(jnp.asarray(poses)))
        centers = inv[:, :3]
        pts = slam.points()[: slam.pg.m]

        fig = plt.figure(figsize=(10, 5))
        ax = fig.add_subplot(121, projection="3d")
        valid = np.isfinite(pts).all(axis=1)
        sub = pts[valid][:: max(1, len(pts) // 4000)]
        if len(sub):
            ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.5, c="gray", alpha=0.4)
        ax.plot(centers[:, 0], centers[:, 1], centers[:, 2], "b-", lw=2)
        ax.scatter(*centers[-1], color="r", s=30)
        ax.set_title(f"n={n} keyframes")

        if self.last_image is not None:
            ax2 = fig.add_subplot(122)
            ax2.imshow(self.last_image)
            ax2.axis("off")
        fig.savefig(path, dpi=80, bbox_inches="tight")
        plt.close(fig)

    def join(self):
        self.render(f"{self.out}/final.png")
