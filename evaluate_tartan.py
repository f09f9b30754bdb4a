"""TartanAir evaluation (reference: evaluate_tartan.py).

Validation split (32 scenes) or test split (MH/ME000-007); NED->xyz GT
permutation, multi-trial medians, AUC summary. Also used as the
in-training validator.
"""
import glob
import os
import os.path as osp

import numpy as np

from cdvslam_tpu.eval.harness import (
    default_parser, load_cfg, run_sequence, summarize, save_results,
)
from cdvslam_tpu.eval import ate_rmse

# reference cdvslam/data_readers/tartan.py:17-50
TEST_SPLIT = [f"MH{i:03d}" for i in range(8)] + [f"ME{i:03d}" for i in range(8)]

NED_PERM = [1, 2, 0, 4, 5, 3, 6]  # ned -> xyz (reference evaluate_tartan.py:104)


def validation_scenes(datapath):
    return sorted(glob.glob(osp.join(datapath, "*/Easy/*")))


def evaluate_scene(cfg, scene_path, args):
    imagedir = osp.join(scene_path, "image_left")
    gt_file = osp.join(scene_path, "pose_left.txt")
    calib = "calib/tartan.txt"
    if not osp.exists(calib):
        os.makedirs("calib", exist_ok=True)
        with open(calib, "w") as f:
            f.write("320.0 320.0 320.0 240.0\n")

    traj, tstamps = run_sequence(cfg, imagedir, calib, args.stride,
                                 version=args.version, network=args.network)
    traj_ref = np.loadtxt(gt_file, delimiter=" ")[:: args.stride, NED_PERM]
    n = min(len(traj), len(traj_ref))
    return ate_rmse(traj[:n, :3], traj_ref[:n, :3], align=True, correct_scale=True)


def evaluate(datapath="datasets/TartanAir", cfg=None, args=None, trials=1, split="validation"):
    results = {}
    scenes = validation_scenes(datapath) if split == "validation" else [
        osp.join(datapath, "mono", s) for s in TEST_SPLIT
    ]
    for scene in scenes:
        if not osp.isdir(scene):
            continue
        key = "_".join(scene.split("/")[-3:])
        results[key] = []
        for _ in range(trials):
            results[key].append(evaluate_scene(cfg, scene, args))
        print(key, sorted(results[key]))
    summary = summarize(results)
    save_results("tartan", results, summary, expname=args.expname,
                 network=args.network)
    return summary


def main():
    parser = default_parser("--datapath", "datasets/TartanAir")
    parser.add_argument("--split", default="validation", choices=["validation", "test"])
    args = parser.parse_args()
    cfg = load_cfg(args)
    print(evaluate(args.datapath, cfg, args, trials=args.trials, split=args.split))


if __name__ == "__main__":
    main()
