"""Train CDVNet on TartanAir (reference: train_cdvo.py).

Data-parallel over all local devices via a jax mesh (replaces NCCL DDP);
alternates sparse (PPI=80, 18 steps) / dense (PPI=1530, 4 frames) modes
50/50 like the reference (train_cdvo.py:108-117).
"""
import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="cdv")
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
    from cdvslam_tpu.models import CDVNet
    from cdvslam_tpu.parallel import make_mesh, replicate, shard_batch
    from cdvslam_tpu.train import (
        RolloutConfig, init_train_state, make_optimizer, make_train_step,
    )
    from cdvslam_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from cdvslam_tpu.train.logger import Logger

    mesh = make_mesh()
    n_dev = len(jax.devices())
    B = n_dev * args.batch_per_device

    model = CDVNet()
    # init params via the SLAM helper (same shapes)
    from cdvslam_tpu.slam.runtime import SLAM
    from cdvslam_tpu.config import get_cfg
    tmp = SLAM(get_cfg(), network=model, ht=480, wd=640)
    params = tmp.params
    del tmp

    optimizer, sched = make_optimizer(args.lr, args.steps, args.clip)
    state = init_train_state(params, optimizer)
    if args.ckpt:
        state = load_checkpoint(args.ckpt, state)

    sparse_cfg = RolloutConfig(F=args.n_frames, M=80, STEPS=args.iter, is_cdv=True,
                               flow_weight=args.flow_weight, pose_weight=args.pose_weight)
    # dense mode: PPI=1530 patches/image (reference net_cdv.py:573 setdense)
    dense_cfg = RolloutConfig(F=4, M=1530, STEPS=4, MIN_FRAME=4, is_cdv=True,
                              flow_weight=args.flow_weight, pose_weight=args.pose_weight)
    step_sparse = make_train_step(model, sparse_cfg, optimizer, mesh=mesh)
    step_dense = make_train_step(model, dense_cfg, optimizer, mesh=mesh)

    db = TartanAirDataset(args.datapath, n_frames=args.n_frames,
                          scene_info_path=args.scene_info)
    logger = Logger(args.name)
    rng = np.random.default_rng(12345)
    key = jax.random.PRNGKey(0)

    state = replicate(mesh, state)
    total = 0
    for batch in db.batches(B, args.steps):
        sparse = rng.random() < 0.5
        if not sparse:
            for k in ("images", "poses", "disps"):
                batch[k] = batch[k][:, :4]
        step_fn = step_sparse if sparse else step_dense
        key, sub = jax.random.split(key)
        b = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
        state, metrics = step_fn(state, b, replicate(mesh, sub))
        total += 1
        logger.push({k: float(v) for k, v in metrics.items()})
        if total % args.eval_every == 0:
            os.makedirs("checkpoints", exist_ok=True)
            save_checkpoint(f"checkpoints/{args.name}_{total:06d}", state)
            # in-training validation (reference train_cdvo.py:219-224)
            if os.path.isdir(args.datapath):
                try:
                    import evaluate_tartan
                    import argparse as _ap
                    eargs = _ap.Namespace(
                        version="cdv", network="", stride=1, trials=1,
                        config="config/default_cdvo.yaml", viz=False,
                        backend_thresh=96.0, opts=[], plot=False,
                        save_trajectory=False, expname="",
                    )
                    from cdvslam_tpu.eval.harness import load_cfg
                    vcfg = load_cfg(eargs)
                    results = evaluate_tartan.evaluate(
                        args.datapath, vcfg, eargs, trials=1)
                    logger.write_dict(results)
                except Exception as e:
                    print("validation failed:", e)


if __name__ == "__main__":
    main()
