"""ICL-NUIM evaluation (reference: evaluate_icl_nuim.py)."""
import os
import os.path as osp

import numpy as np

from cdvslam_tpu.eval.harness import (
    default_parser, load_cfg, run_sequence, evaluate_against_tum_gt, summarize, save_results,
)

ICL_SCENES = [
    "living_room_traj0_frei_png", "living_room_traj1_frei_png",
    "living_room_traj2_frei_png", "living_room_traj3_frei_png",
    "traj0_frei_png", "traj1_frei_png", "traj2_frei_png", "traj3_frei_png",
]


def main():
    parser = default_parser("--icldir", "datasets/ICL_NUIM")
    args = parser.parse_args()
    cfg = load_cfg(args)

    results = {}
    for scene in ICL_SCENES:
        imagedir = osp.join(args.icldir, scene, "rgb")
        gt = osp.join(args.icldir, scene, "groundtruth.txt")
        if not osp.isdir(imagedir):
            print(f"[skip] {scene}")
            continue
        results[scene] = []
        for trial in range(args.trials):
            traj, tstamps = run_sequence(cfg, imagedir, "calib/icl_nuim.txt",
                                         args.stride, version=args.version,
                                         network=args.network)
            ate = evaluate_against_tum_gt(traj, np.asarray(tstamps), gt, max_diff=0.5)
            results[scene].append(ate)
            print(f"{scene} trial {trial+1}: ATE {ate:.4f}")
    summary = summarize(results)
    print(summary)
    save_results("icl_nuim", results, summary, expname=args.expname,
                 network=args.network)


if __name__ == "__main__":
    main()
