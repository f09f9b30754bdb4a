"""Measure band-cell sharing among corr edges at steady state.

A 'cell' is the (target frame jj, y-origin a4, x-origin a64) triple that
determines the kernel's per-edge band slice. Edges in the same cell can
share ONE fcache slice + matmul. This probe runs the SLAM to steady
state, recomputes the reprojected coords for the active edge set, and
prints the cell-count histogram for both pyramid levels -> the padding
cost of sorting cell runs to a SUBTE boundary.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_corr_cells.py
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.geom import transform
    from cdvslam_tpu.lie import SE3
    from cdvslam_tpu.ops.corr_pallas import padded_dims, THB as TH, TWB, SUBTE
    from cdvslam_tpu.slam import SLAM

    ht, wd = 480, 752
    cfg = get_cfg()
    cfg.MOTION_PROBE_THR = -1.0
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)
    rng = np.random.RandomState(0)
    frames = [(rng.rand(ht, wd, 3) * 255).astype(np.uint8) for _ in range(8)]
    intr = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    for f in range(60):
        slam(f, frames[f % len(frames)], intr)
    jax.block_until_ready(slam.pg.poses_)

    pg = slam.pg
    ii, jj, kk = pg.ii, pg.jj, pg.kk
    E = len(ii)
    coords = transform(
        SE3(pg.poses_[None]), pg.patches_[None], pg.intrinsics_[None],
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk))
    coords = np.asarray(coords[0])        # (E, P, P, 2)
    P = coords.shape[1]
    print(f"E = {E}, frames spanned = {len(np.unique(jj))}")

    for lvl, (H, W, div) in enumerate(
            [(ht // 4, wd // 4, 1.0), (ht // 16, wd // 16, 4.0)]):
        x = coords[..., 0].reshape(E, -1) / div
        y = coords[..., 1].reshape(E, -1) / div
        D = 8
        Hp, Wpc = padded_dims(H, W)
        ix0 = np.clip(np.floor(x).astype(int) - 3 + D, 0, W + D)
        iy0 = np.clip(np.floor(y).astype(int) - 3 + D, 0, H + D)
        a4 = np.clip((iy0.min(1) // 4) * 4, 0, Hp + 4 - min(TH, Hp))
        a64 = np.clip((ix0.min(1) // 64) * 64, 0, Wpc + 64 - TWB)
        cells = {}
        for e in range(E):
            cells.setdefault((jj[e], a4[e], a64[e]), []).append(e)
        sizes = np.array([len(v) for v in cells.values()])
        for S in (4, 8):
            padded = int(np.sum(-(sizes // -S) * S))
            print(f"lvl{lvl+1}: cells={len(cells)}, edges/cell "
                  f"mean={sizes.mean():.1f} med={np.median(sizes):.0f} "
                  f"max={sizes.max()}; pad-to-{S} EP={padded} "
                  f"(+{100*(padded-E)/E:.0f}%)")

        # chunked-kernel simulation: sort by (frame, PREDICTED cell), take
        # CB-edge chunks, chunk origin = elementwise min of TRUE per-edge
        # aligned origins, fallback = taps spill the chunk band
        TH_, D_ = min(TH, Hp), D
        rng2 = np.random.RandomState(1)
        for noise in (0.0, 2.0, 6.0):
            # prediction error in pixels (stale-target simulation)
            xp = x + rng2.randn(*x.shape) * noise
            yp = y + rng2.randn(*y.shape) * noise
            ix0p = np.clip(np.floor(xp).astype(int) - 3 + D_, 0, W + D_)
            iy0p = np.clip(np.floor(yp).astype(int) - 3 + D_, 0, H + D_)
            a4p = np.clip((iy0p.min(1) // 4) * 4, 0, Hp + 4 - TH_)
            a64p = np.clip((ix0p.min(1) // 64) * 64, 0, Wpc + 64 - TWB)
            cellkey = a4p * 4096 + a64p
            order = np.lexsort((cellkey, jj))
            for CB in (4, 8):
                nch = E // CB
                oky = np.zeros(E, bool)
                for c in range(nch + (E % CB > 0)):
                    es = order[c * CB:(c + 1) * CB]
                    oy = np.clip(a4[es].min(), 0, Hp + 4 - TH_)
                    ox = np.clip(a64[es].min(), 0, Wpc + 64 - TWB)
                    ry = iy0[es] - oy
                    rx = ix0[es] - ox
                    oky[es] = (((ry >= 0) & (ry <= TH_ - D_)).all(1)
                               & ((rx >= 0) & (rx <= TWB - D_)).all(1))
                print(f"lvl{lvl+1} CB={CB} noise={noise:3.1f}px: "
                      f"fallback {100 * (1 - oky.mean()):.1f}%")


if __name__ == "__main__":
    main()
