"""Run CDV-SLAM-TPU odometry on an image directory or video.

Flag-compatible with the reference demo.py (reference: demo.py:58-102).
"""
import argparse
import os
from pathlib import Path

import numpy as np


def run(cfg, args):
    from cdvslam_tpu.slam import SLAM
    from cdvslam_tpu.slam.stream import image_stream, start_reader, video_stream
    from cdvslam_tpu.utils.timer import Timer, ALL_TIMES

    slam = None
    is_video = os.path.isfile(args.imagedir)
    reader = video_stream if is_video else image_stream
    q, th = start_reader(reader, args.imagedir, args.calib, args.stride, args.skip)

    while True:
        t, image, intrinsics = q.get()
        if t < 0:
            break
        if slam is None:
            h, w, _ = image.shape
            params = None
            if args.network and Path(args.network).exists():
                from cdvslam_tpu.models.convert import load_torch_checkpoint
                params = load_torch_checkpoint(args.network, version=args.version)
            slam = SLAM(cfg, network=args.version, ht=h, wd=w, viz=args.viz, params=params)
            slam.enable_timing = args.timeit

        image = image[..., ::-1].copy()  # BGR -> RGB like the reference upload
        with Timer("SLAM", enabled=args.timeit):
            slam(t, image, intrinsics)

    poses, tstamps = slam.terminate()

    if args.timeit:
        for name, times in ALL_TIMES.items():
            print(f"{name}: median {np.median(times)*1000:.2f} ms over {len(times)} calls")

    if args.save_trajectory:
        Path("saved_trajectories").mkdir(exist_ok=True)
        from cdvslam_tpu.viz.plot import save_trajectory_tum_format
        save_trajectory_tum_format((poses, tstamps), f"saved_trajectories/{args.name}.txt")

    if args.save_ply:
        from cdvslam_tpu.viz.plot import save_ply
        save_ply(args.name, slam)

    if args.plot:
        from cdvslam_tpu.viz.plot import plot_trajectory
        Path("trajectory_plots").mkdir(exist_ok=True)
        plot_trajectory((poses, tstamps), title=f"CDV-SLAM-TPU {args.name}",
                        filename=f"trajectory_plots/{args.name}.pdf")

    return poses, tstamps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", type=str, default="")
    parser.add_argument("--imagedir", type=str, required=True)
    parser.add_argument("--calib", type=str, required=True)
    parser.add_argument("--name", type=str, default="result")
    parser.add_argument("--stride", type=int, default=2)
    parser.add_argument("--skip", type=int, default=0)
    parser.add_argument("--version", type=str, default="cdv", choices=["cdv", "dpv"])
    parser.add_argument("--config", default="config/default_cdvo.yaml")
    parser.add_argument("--timeit", action="store_true")
    parser.add_argument("--viz", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--save_ply", action="store_true")
    parser.add_argument("--save_colmap", action="store_true")
    parser.add_argument("--save_trajectory", action="store_true")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args()

    from cdvslam_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config and os.path.exists(args.config):
        cfg.merge_from_file(args.config)
    cfg.merge_from_list(args.opts)

    print("Running with config:")
    print(cfg)
    run(cfg, args)


if __name__ == "__main__":
    main()
