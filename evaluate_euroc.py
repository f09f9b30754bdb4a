"""EuRoC MAV evaluation (reference: evaluate_euroc.py).

11 sequences, stride 2, timestamp-associated Sim3-aligned ATE vs the
shipped TUM-format ground truth.
"""
import os
import glob
import numpy as np

from cdvslam_tpu.eval.harness import (
    default_parser, load_cfg, run_sequence, evaluate_against_tum_gt, summarize, save_results,
)

EUROC_SCENES = [
    "MH_01_easy", "MH_02_easy", "MH_03_medium", "MH_04_difficult",
    "MH_05_difficult", "V1_01_easy", "V1_02_medium", "V1_03_difficult",
    "V2_01_easy", "V2_02_medium", "V2_03_difficult",
]


def main():
    parser = default_parser("--eurocdir", "datasets/EUROC")
    parser.set_defaults(stride=2)
    args = parser.parse_args()
    cfg = load_cfg(args)

    results = {}
    for scene in EUROC_SCENES:
        imagedir = os.path.join(args.eurocdir, scene, "mav0/cam0/data")
        gt = f"datasets/euroc_groundtruth/{scene}.txt"
        if not os.path.isdir(imagedir):
            print(f"[skip] {scene}: no data at {imagedir}")
            continue
        results[scene] = []
        for trial in range(args.trials):
            traj, _ = run_sequence(cfg, imagedir, "calib/euroc.txt",
                                   args.stride, version=args.version,
                                   network=args.network, viz=args.viz)
            images = sorted(glob.glob(os.path.join(imagedir, "*.png")))[::args.stride]
            tstamps = np.array([float(os.path.basename(x)[:-4]) for x in images]) / 1e9
            ate = evaluate_against_tum_gt(traj, tstamps[: len(traj)], gt)
            results[scene].append(ate)
            print(f"{scene} trial {trial+1}: ATE {ate:.4f}")

    summary = summarize(results)
    print(summary)
    save_results("euroc", results, summary, expname=args.expname,
                 network=args.network)


if __name__ == "__main__":
    main()
