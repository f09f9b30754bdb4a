"""Characterize classical-LC retrieval recall on rendered imagery
(VERDICT r3 #8).

Renders a two-loop overhead orbit over a textured plane
(tests/render_plane.py) so every second-loop frame revisits a known
first-loop pose, then degrades the revisit pass with photometric
nuisance (per-frame gain/bias jitter + Gaussian pixel noise) and
measures the ORB + online-vocabulary-BoW retrieval gate
(cdvslam_tpu/loop/retrieval.py, reference retrieval_dbow.py:79-114):

  recall    = revisit frames where detect_loop fires with a GT-valid
              target (pose distance < half the inter-frame step)
  precision = fired detections that are GT-valid

Reported per noise level and for a LOOP_RETR_THRESH sweep, so the
default gate threshold is a documented measurement instead of a guess.

Usage: PYTHONPATH=/root/repo python tools/bench_lc_recall.py [loops]
CPU-only (cv2 + native BoW lib); ~2 min.
"""
import os
import sys

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2

    from cdvslam_tpu.loop.retrieval import RetrievalBoW
    from render_plane import PlaneScene, overhead_loop_poses

    per_loop = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    HT, WD = 192, 256
    INTR = np.array([220.0, 220.0, 128.0, 96.0], np.float32)

    scene = PlaneScene(INTR, HT, WD, seed=3)
    # one physical loop of per_loop frames, traversed twice: frame
    # per_loop + s revisits frame s exactly
    gt1 = np.asarray(overhead_loop_poses(per_loop))
    gt = np.concatenate([gt1, gt1], axis=0)
    F = 2 * per_loop

    rng = np.random.RandomState(0)

    def degrade(img, sigma):
        g = 1.0 + rng.uniform(-0.15, 0.15)
        b = rng.uniform(-12, 12)
        out = img.astype(np.float32) * g + b
        if sigma > 0:
            out = out + rng.randn(*out.shape) * sigma
        return np.clip(out, 0, 255).astype(np.uint8)

    print(f"{F} frames ({per_loop}/loop), exact revisit alignment; "
          f"rad=16, repetition check ON", flush=True)
    print(f"{'noise':>6} {'thresh':>7} {'recall':>7} {'precision':>9} "
          f"{'fired':>6}")
    for sigma in (0.0, 2.0, 5.0, 10.0):
        rng.seed(int(sigma * 100) + 1)
        imgs = [scene.render(gt[f]) for f in range(F)]
        # second loop gets independent photometric nuisance
        imgs = [im if f < per_loop else degrade(im, sigma)
                for f, im in enumerate(imgs)]
        gray = [cv2.cvtColor(im, cv2.COLOR_RGB2GRAY) for im in imgs]

        for thresh in (0.04, 0.06, 0.08, 0.10, 0.15):
            r = RetrievalBoW(rad=16, thresh=thresh, train_threshold=2000)
            fired, valid = 0, 0
            detected_mid = set()
            for f in range(F):
                r.insert_image(gray[f], f)
                det = r.detect_loop(f)
                if det is None:
                    continue
                i, j = det
                fired += 1
                # GT-valid: the target pose is within half an
                # inter-frame step of the query pose
                step = np.linalg.norm(gt1[1, :3] - gt1[0, :3])
                d = np.linalg.norm(gt[i, :3] - gt[j, :3])
                if d < 0.5 * step:
                    valid += 1
                    if i >= per_loop:   # recall counts true revisits only
                        detected_mid.add(i)
            # recall over second-loop frames that COULD fire (the
            # repetition check needs 3 consecutive hits, so the first 2
            # revisit frames cannot)
            eligible = per_loop - 2
            rec = len(detected_mid) / eligible
            prec = valid / fired if fired else float("nan")
            print(f"{sigma:6.1f} {thresh:7.2f} {rec:7.2f} {prec:9.2f} "
                  f"{fired:6d}", flush=True)


if __name__ == "__main__":
    main()
