"""Trained-weights end-to-end proof (in-environment, no datasets).

Trains a CDVNet from scratch on rendered planar-scene clips
(tests/render_plane.py -- exact homography geometry, physically
consistent GT poses/depths), then runs the FULL SLAM loop with the
trained weights on a held-out trajectory and compares ATE against the
random-weights baseline. This is the only in-environment way to prove
the train->infer contract end to end (feature layouts, corr ordering,
patch selection, weight semantics): a disagreement anywhere makes the
trained net no better than random at tracking.

Reference training recipe analog: train_cdvo.py:60-226 (ours), reference
/root/reference/train_cdvo.py:95-160.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/train_e2e_proof.py \
      [steps=1500] [--cpu] [--eval-only CKPT]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

HT, WD = 240, 320
INTR = np.array([140.0, 140.0, 160.0, 120.0], np.float64)
F, M, STEPS, MIN_FRAME = 8, 32, 10, 4
CKPT_PATH = "/tmp/e2e_proof_ckpt.npz"


def random_walk_poses(rng, F, height=1.6):
    """Smooth random camera path above the plane, looking down-ish.
    Returns (F, 7) world->cam."""
    import jax.numpy as jnp
    from cdvslam_tpu.lie import se3_exp, se3_mul
    from cdvslam_tpu.lie.quaternion import qmat

    base = np.asarray(se3_exp(jnp.asarray([0, 0, 0, np.pi, 0, 0], np.float32)))
    C = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                  height + rng.uniform(-0.3, 0.5)])
    vel = rng.normal(0, 0.10, 3) * np.array([1, 1, 0.3])
    rvec = np.zeros(3)
    rvel = rng.normal(0, 0.02, 3)
    poses = []
    for f in range(F):
        C = C + vel
        vel = 0.9 * vel + rng.normal(0, 0.03, 3) * np.array([1, 1, 0.3])
        C[2] = np.clip(C[2], 1.0, 3.0)
        rvec = rvec + rvel
        rvel = 0.9 * rvel + rng.normal(0, 0.01, 3)
        rvec = np.clip(rvec, -0.35, 0.35)  # keep the plane in view
        tilt = np.asarray(se3_exp(jnp.asarray(
            np.concatenate([np.zeros(3), rvec]), np.float32)))
        R = np.asarray(se3_mul(jnp.asarray(tilt), jnp.asarray(base)))
        q = R[3:7]
        t = -np.asarray(qmat(jnp.asarray(q)[None]))[0] @ C
        poses.append(np.concatenate([t, q]).astype(np.float32))
    return np.stack(poses)


def make_clip(scene, rng):
    """One training clip: images, w2c poses, GT disps at 1/4 res,
    intrinsics -- disparity-normalized like the TartanAir reader
    (tartan.py: s = 0.7 * q98(disps); disps /= s; t *= s)."""
    poses = random_walk_poses(rng, F)
    images = np.stack([scene.render(p) for p in poses]).astype(np.float32)
    hf, wf = HT // 4, WD // 4
    px, py = np.meshgrid(np.arange(wf, dtype=np.float64) + 0.5,
                         np.arange(hf, dtype=np.float64) + 0.5)
    px, py = px.reshape(-1), py.reshape(-1)
    disps = np.stack([
        scene.true_inv_depth(p, px, py, res=4).reshape(hf, wf) for p in poses
    ]).astype(np.float32)
    s = 0.7 * np.quantile(disps, 0.98)
    disps = disps / s
    poses = poses.copy()
    poses[:, :3] *= s
    return images, poses, disps, INTR.astype(np.float32)


def build_params(model):
    import jax
    import jax.numpy as jnp
    from cdvslam_tpu.models import CDVNet, build_update_aux

    key = jax.random.PRNGKey(0)
    img = jnp.zeros((F, HT, WD, 3))
    pf = model.init(key, img, method=CDVNet.features_f)
    pi = model.init(key, img, method=CDVNet.features_i)
    E = 8
    net0 = jnp.zeros((1, E, 384))
    corr0 = jnp.zeros((1, E, 2 * 49 * 9))
    aux0 = build_update_aux(np.zeros(E, np.int64), np.arange(E),
                            np.arange(E), 0, 16, M=E, E_pad=E)
    pu = model.init(key, net0, net0, corr0, aux0, 16, method=CDVNet.update)
    pp = model.init(key, jnp.zeros((1, E, 2)), method=CDVNet.posenc)

    def merge(a, b):
        if not isinstance(a, dict):
            return b
        out = dict(a)
        for k, v in dict(b).items():
            out[k] = merge(out[k], v) if k in out else v
        return out

    params = {}
    for p in (pf, pi, pu, pp):
        params = merge(params, dict(p))
    return params


def save_params(params, path):
    import jax
    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez(path, treedef=str(treedef),
             **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_params(model, path):
    import jax
    ref = build_params(model)
    flat_ref, treedef = jax.tree_util.tree_flatten(ref)
    data = np.load(path)
    flat = [data[f"p{i}"] for i in range(len(flat_ref))]
    return jax.tree_util.tree_unflatten(treedef, flat)


def train(steps, lr=2e-4):
    import jax
    import jax.numpy as jnp
    from render_plane import PlaneScene
    from cdvslam_tpu.models import CDVNet
    from cdvslam_tpu.train import (
        RolloutConfig, init_train_state, make_optimizer, make_train_step)

    model = CDVNet()
    params = build_params(model)
    cfg = RolloutConfig(F=F, M=M, STEPS=STEPS, MIN_FRAME=MIN_FRAME,
                        is_cdv=True)
    optimizer, _ = make_optimizer(lr=lr, total_steps=max(steps, 100))
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(model, cfg, optimizer, mesh=None)

    rng = np.random.RandomState(0)
    scenes = [PlaneScene(INTR, HT, WD, seed=s) for s in range(4)]
    print("rendering clip pool...", file=sys.stderr)
    pool = [make_clip(scenes[i % len(scenes)], rng) for i in range(48)]

    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    losses = []
    for it in range(steps):
        img, pose, disp, intr = pool[rng.randint(len(pool))]
        batch = {
            "images": jnp.asarray(img)[None],
            "poses": jnp.asarray(pose)[None],
            "disps": jnp.asarray(disp)[None],
            "intrinsics": jnp.asarray(intr)[None],
        }
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        if it % 25 == 0 or it == steps - 1:
            l = float(metrics["loss"])
            losses.append(l)
            dt = time.perf_counter() - t0
            print(f"step {it:5d} loss {l:8.4f} px1 {float(metrics['px1']):.3f} "
                  f"tr {float(metrics['tr']):.4f} ro {float(metrics['ro']):.4f} "
                  f"({dt:.0f}s)", file=sys.stderr)
    save_params(jax.device_get(state.params), CKPT_PATH)
    print(f"checkpoint -> {CKPT_PATH}", file=sys.stderr)
    return losses


def run_slam(params_arg, scene, gt, tag):
    import jax
    import jax.numpy as jnp
    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.eval import ate_rmse
    from cdvslam_tpu.lie import se3_inv
    from cdvslam_tpu.slam import SLAM

    cfg = get_cfg()
    cfg.MOTION_PROBE_THR = -1.0   # keep every frame: ATE on all poses
    cfg.BUFFER_SIZE = 256
    slam = SLAM(cfg, network="cdv", ht=HT, wd=WD, params=params_arg)
    Fq = len(gt)
    for f in range(Fq):
        slam(f, scene.render(gt[f]), INTR)
    poses, tstamps = slam.terminate()
    gt_wc = np.asarray(se3_inv(jnp.asarray(gt)))
    k = min(len(poses), Fq)
    ate = float(ate_rmse(poses[:k, :3], gt_wc[:k, :3]))
    path = float(np.linalg.norm(np.diff(gt_wc[:k, :3], axis=0),
                                axis=-1).sum())
    print(f"{tag}: ATE {ate:.4f} ({100 * ate / path:.1f}% of {path:.2f} path)",
          file=sys.stderr)
    return ate, path


def evaluate(ckpt):
    from render_plane import PlaneScene, overhead_loop_poses
    from cdvslam_tpu.models import CDVNet

    model = CDVNet()
    # held-out texture (seed 11 unseen in training) + held-out trajectory
    scene = PlaneScene(INTR, HT, WD, seed=11)
    gt = overhead_loop_poses(40, height=1.6, radius=0.7)

    trained = load_params(model, ckpt)
    ate_t, path = run_slam(trained, scene, gt, "trained")
    ate_r, _ = run_slam(None, scene, gt, "random")
    out = {
        "ate_trained": round(ate_t, 4),
        "ate_random": round(ate_r, 4),
        "path_len": round(path, 3),
        "trained_pct_of_path": round(100 * ate_t / path, 2),
        "improvement": round(ate_r / max(ate_t, 1e-9), 2),
    }
    print(json.dumps(out))
    return out


def main():
    args = [a for a in sys.argv[1:]]
    if "--cpu" in args:
        os.environ["JAX_PLATFORMS"] = "cpu"
        args.remove("--cpu")
    if "--eval-only" in args:
        i = args.index("--eval-only")
        ckpt = args[i + 1]
        evaluate(ckpt)
        return
    steps = int(args[0]) if args else 1500
    losses = train(steps)
    print(f"loss first/last: {losses[0]:.4f} -> {losses[-1]:.4f}",
          file=sys.stderr)
    evaluate(CKPT_PATH)


if __name__ == "__main__":
    main()
