"""Train VONet (DPVO-compatible) on TartanAir (reference: train_dpvo.py).

Same trainer as train_cdvo.py but with the DPVO network and its single
(sparse) rollout mode.
"""
import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="dpvo")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--steps", type=int, default=240000)
    parser.add_argument("--lr", type=float, default=8e-5)
    parser.add_argument("--clip", type=float, default=10.0)
    parser.add_argument("--n_frames", type=int, default=15)
    parser.add_argument("--iter", type=int, default=18)
    parser.add_argument("--pose_weight", type=float, default=10.0)
    parser.add_argument("--flow_weight", type=float, default=0.1)
    parser.add_argument("--datapath", default="datasets/TartanAir")
    parser.add_argument("--scene_info", default="datasets/TartanAir.pickle")
    parser.add_argument("--batch_per_device", type=int, default=1)
    parser.add_argument("--eval_every", type=int, default=10000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from cdvslam_tpu.data.tartan import TartanAirDataset
    from cdvslam_tpu.models import VONet
    from cdvslam_tpu.parallel import make_mesh, replicate, shard_batch
    from cdvslam_tpu.train import (
        RolloutConfig, init_train_state, make_optimizer, make_train_step,
    )
    from cdvslam_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from cdvslam_tpu.train.logger import Logger
    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam.runtime import SLAM

    mesh = make_mesh()
    B = len(jax.devices()) * args.batch_per_device

    model = VONet()
    tmp = SLAM(get_cfg(), network=model, ht=480, wd=640)
    params = tmp.params
    del tmp

    optimizer, _ = make_optimizer(args.lr, args.steps, args.clip)
    state = init_train_state(params, optimizer)
    if args.ckpt:
        state = load_checkpoint(args.ckpt, state)

    cfg = RolloutConfig(F=args.n_frames, M=96, STEPS=args.iter, is_cdv=False,
                        flow_weight=args.flow_weight, pose_weight=args.pose_weight)
    step = make_train_step(model, cfg, optimizer, mesh=mesh)

    db = TartanAirDataset(args.datapath, n_frames=args.n_frames,
                          scene_info_path=args.scene_info)
    logger = Logger(args.name)
    key = jax.random.PRNGKey(0)
    state = replicate(mesh, state)
    total = 0
    for batch in db.batches(B, args.steps):
        key, sub = jax.random.split(key)
        b = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
        state, metrics = step(state, b, replicate(mesh, sub))
        total += 1
        logger.push({k: float(v) for k, v in metrics.items()})
        if total % args.eval_every == 0:
            os.makedirs("checkpoints", exist_ok=True)
            save_checkpoint(f"checkpoints/{args.name}_{total:06d}", state)


if __name__ == "__main__":
    main()
