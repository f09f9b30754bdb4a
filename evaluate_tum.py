"""TUM-RGBD freiburg1 evaluation (reference: evaluate_tum.py).

11 sequences, stride 2, timestamp-associated Sim3-aligned ATE vs the
shipped TUM-format ground truth.
"""
import os
import glob
import numpy as np

from cdvslam_tpu.eval.harness import (
    default_parser, load_cfg, run_sequence, evaluate_against_tum_gt, summarize, save_results,
)

TUM_SCENES = [
    "360", "desk", "desk2", "floor", "plant", "room", "rpy", "teddy", "xyz",
]


def main():
    parser = default_parser("--tumdir", "datasets/TUM-RGBD")
    args = parser.parse_args()
    cfg = load_cfg(args)

    results = {}
    for scene in TUM_SCENES:
        seq = f"rgbd_dataset_freiburg1_{scene}"
        imagedir = os.path.join(args.tumdir, seq, "rgb")
        gt = os.path.join(args.tumdir, seq, "groundtruth.txt")
        if not os.path.isdir(imagedir):
            print(f"[skip] {scene}: no data at {imagedir}")
            continue
        results[scene] = []
        for trial in range(args.trials):
            # fr1 intrinsics + distortion with the reference's boundary
            # crop (reference evaluate_tum.py:29-47)
            traj, _ = run_sequence(cfg, imagedir, "calib/tum1.txt",
                                   args.stride, version=args.version,
                                   network=args.network, viz=args.viz,
                                   crop_border=(8, 16))
            images = sorted(glob.glob(os.path.join(imagedir, "*.png")))[::args.stride]
            tstamps = np.array([float(os.path.basename(x)[:-4]) for x in images])
            ate = evaluate_against_tum_gt(traj, tstamps[: len(traj)], gt)
            results[scene].append(ate)
            print(f"{scene} trial {trial+1}: ATE {ate:.4f}")

    summary = summarize(results)
    print(summary)
    save_results("tum", results, summary, expname=args.expname,
                 network=args.network)


if __name__ == "__main__":
    main()
