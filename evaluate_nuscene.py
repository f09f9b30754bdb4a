"""nuScenes CAM_FRONT evaluation at half resolution (reference: evaluate_nuscene.py)."""
import os
import os.path as osp

import numpy as np

from cdvslam_tpu.eval.harness import (
    default_parser, load_cfg, run_sequence, summarize, save_results,
)
from cdvslam_tpu.eval import ate_rmse


def main():
    parser = default_parser("--nuscdir", "datasets/nuscenes")
    parser.add_argument("--scenes", nargs="+", default=[])
    args = parser.parse_args()
    cfg = load_cfg(args)

    scenes = args.scenes or sorted(
        d for d in os.listdir(args.nuscdir) if d.startswith("scene")
    ) if osp.isdir(args.nuscdir) else []

    results = {}
    for scene in scenes:
        imagedir = osp.join(args.nuscdir, scene, "CAM_FRONT")
        gt_file = osp.join(args.nuscdir, scene, "poses.txt")
        if not osp.isdir(imagedir):
            continue
        # half-resolution calib (reference evaluate_nuscene.py:60-87)
        calib = np.array([1266.417 / 2, 1266.417 / 2, 816.267 / 2, 491.507 / 2])
        cpath = f"calib/nusc_{scene}.txt"
        os.makedirs("calib", exist_ok=True)
        np.savetxt(cpath, calib[None])
        results[scene] = []
        for trial in range(args.trials):
            traj, _ = run_sequence(cfg, imagedir, cpath, args.stride,
                                   version=args.version, network=args.network)
            if osp.exists(gt_file):
                gt = np.loadtxt(gt_file)
                n = min(len(traj), len(gt))
                ate = ate_rmse(traj[:n, :3], gt[:n, :3], align=True, correct_scale=True)
            else:
                ate = float("nan")
            results[scene].append(ate)
            print(f"{scene} trial {trial+1}: ATE {ate:.4f}")
    summary = summarize(results)
    print(summary)
    save_results("nuscene", results, summary, expname=args.expname,
                 network=args.network)


if __name__ == "__main__":
    main()
