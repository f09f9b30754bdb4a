"""Trajectory/plot/export utilities (reference cdvslam/plot_utils.py).

evo/plyfile-free: TUM-format text, matplotlib xz plot, ASCII PLY, COLMAP
text export.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def save_trajectory_tum_format(traj, path):
    poses, tstamps = traj
    with open(path, "w") as f:
        for p, t in zip(poses, tstamps):
            f.write(f"{t} " + " ".join(f"{v:.8f}" for v in p) + "\n")


def plot_trajectory(traj, title="", filename="trajectory.pdf", gt_traj=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses, tstamps = traj
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(poses[:, 0], poses[:, 2], label="estimate")
    if gt_traj is not None:
        ax.plot(gt_traj[0][:, 0], gt_traj[0][:, 2], "--", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend()
    ax.axis("equal")
    fig.savefig(filename, bbox_inches="tight")
    plt.close(fig)


def save_ply(name, slam):
    """ASCII PLY of the patch-center point cloud with colors."""
    pts = slam.points()
    clr = slam.pg.colors_[: slam.pg.n].reshape(-1, 3)[: len(pts)]
    valid = np.isfinite(pts).all(axis=1)
    pts, clr = pts[valid], clr[valid]
    path = Path(f"{name}.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(pts, clr):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")


def save_output_for_COLMAP(name, slam, fx, fy, cx, cy):
    """Minimal COLMAP text-model export (cameras/images/points3D)."""
    out = Path(name)
    out.mkdir(exist_ok=True, parents=True)
    poses = np.asarray(slam.pg.poses_[: slam.pg.n])
    pts = slam.points()
    with open(out / "cameras.txt", "w") as f:
        f.write(f"1 PINHOLE {slam.wd} {slam.ht} {fx} {fy} {cx} {cy}\n")
    with open(out / "images.txt", "w") as f:
        for i, p in enumerate(poses):
            tx, ty, tz, qx, qy, qz, qw = p
            f.write(f"{i+1} {qw} {qx} {qy} {qz} {tx} {ty} {tz} 1 frame_{i:06d}\n\n")
    with open(out / "points3D.txt", "w") as f:
        clr = slam.pg.colors_[: slam.pg.n].reshape(-1, 3)[: len(pts)]
        for i, (p, c) in enumerate(zip(pts, clr)):
            f.write(f"{i+1} {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]} 0\n")
