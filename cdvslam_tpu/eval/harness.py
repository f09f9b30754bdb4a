"""Shared evaluation harness for the dataset eval scripts.

Implements the reference protocol (reference: evaluate_tartan.py:63-70,
143-161): run SLAM over a sequence, associate timestamps, Sim3-aligned ATE
RMSE of the translation part, multi-trial medians, AUC = mean(max(1-ate,0)).
"""
from __future__ import annotations

import glob
import os
from pathlib import Path

import numpy as np

from .ate import ate_rmse, associate_timestamps


def run_sequence(cfg, imagedir, calib, stride=1, skip=0, version="cdv",
                 network="", viz=False, params=None, crop_border=None,
                 slam_sink=None):
    """Run the SLAM loop over an image directory; returns (poses, tstamps).

    ``slam_sink``: optional list; the SLAM instance is appended before
    terminate() so callers (smoke tests) can inspect runtime state such
    as ``slam.stats`` feature-fire counters."""
    from ..slam import SLAM
    from ..slam.stream import image_stream, start_reader

    q, th = start_reader(image_stream, imagedir, calib, stride, skip,
                         crop_border=crop_border)
    slam = None
    while True:
        t, image, intrinsics = q.get()
        if t < 0:
            break
        if slam is None:
            h, w, _ = image.shape
            if params is None and network and Path(network).exists():
                from ..models.convert import load_torch_checkpoint
                params = load_torch_checkpoint(network, version=version)
            slam = SLAM(cfg, network=version, ht=h, wd=w, viz=viz, params=params)
        slam(t, image[..., ::-1].copy(), intrinsics)
    if slam_sink is not None:
        slam_sink.append(slam)
    return slam.terminate()


def evaluate_against_tum_gt(traj_est, tstamps, gt_file, t_scale=1.0, max_diff=0.08):
    """ATE vs a TUM-format ground-truth file (t x y z qx qy qz qw)."""
    gt = np.loadtxt(gt_file)
    if gt.ndim == 1:
        gt = gt[None]
    # strip comments already handled by loadtxt; columns: t, xyz, quat
    ia, ib = associate_timestamps(np.asarray(tstamps) * t_scale, gt[:, 0], max_diff)
    if len(ia) < 3:
        return float("inf")
    return ate_rmse(traj_est[ia, :3], gt[ib, 1:4], align=True, correct_scale=True)


def evaluate_against_pose_array(traj_est, gt_poses):
    """ATE vs a (N, >=3) pose array aligned index-by-index."""
    n = min(len(traj_est), len(gt_poses))
    return ate_rmse(traj_est[:n, :3], gt_poses[:n, :3], align=True, correct_scale=True)


def summarize(results):
    """Per-scene medians + AVG + AUC (reference evaluate_tartan.py:143-161)."""
    out = {}
    all_ates = []
    meds = []
    for scene, ates in results.items():
        med = float(np.median(ates))
        out[scene] = med
        meds.append(med)
        all_ates.extend(ates)
    out["AVG"] = float(np.mean(meds)) if meds else float("nan")
    out["AUC"] = float(np.maximum(1 - np.array(all_ates), 0).mean()) if all_ates else 0.0
    return out


def default_parser(datadir_flag, datadir_default):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--version", type=str, default="cdv", choices=["cdv", "dpv"])
    parser.add_argument("--expname", default="")
    parser.add_argument("--network", type=str, default="")
    parser.add_argument("--config", default="config/default_cdvo.yaml")
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--viz", action="store_true")
    parser.add_argument("--trials", type=int, default=1)
    parser.add_argument(datadir_flag, default=datadir_default)
    parser.add_argument("--backend_thresh", type=float, default=96.0)
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--opts", nargs="+", default=[])
    parser.add_argument("--save_trajectory", action="store_true")
    return parser


def save_results(name, results, summary, expname="", network=""):
    """Append per-scene results + command line to results/{name}_{exp}.txt
    and write a timestamped snapshot (reference evaluate_tartan.py:148-150,
    232-244)."""
    import datetime
    import sys

    os.makedirs("results", exist_ok=True)
    path = os.path.join("results", f"{name}_{expname}.txt")
    with open(path, "a") as f:
        print(network, "\n", file=f)
        print(" ".join(sys.argv), "\n", file=f)
        for k, v in results.items():
            print(k, v, file=f)
        print(summary, "\n", file=f)
    stamp = datetime.datetime.now().strftime("%m-%d-%I%p")
    with open(os.path.join("results", f"{name}-{stamp}.txt"), "w") as f:
        all_vals = [x for v in results.values()
                    for x in (v if isinstance(v, (list, tuple)) else [v])]
        f.write(",".join(str(x) for x in all_vals))
    return path


def load_cfg(args):
    from ..config import get_cfg

    cfg = get_cfg()
    if os.path.exists(args.config):
        cfg.merge_from_file(args.config)
    cfg.BACKEND_THRESH = args.backend_thresh
    cfg.merge_from_list(args.opts)
    return cfg
