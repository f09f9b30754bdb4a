"""Experiment: frame insert and update as TWO dispatches vs ONE fused.

Round-3/4 data: the frame insert costs ~19 ms MARGINAL inside the fused
program but only 8.2 ms standalone, and no_frame leaves a 16.1 ms
update-only program -- if the in-context inflation is an artifact of
fusing (aliasing copies / scheduling), the split pipeline should run
~24 ms, not 35. This measures exactly that on chip: the same captured
steady-state args dispatched as (shift+frame_body) then (update_body),
dependent chain.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_split.py [iters]
"""
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM
    from cdvslam_tpu.slam.kernels import shift_span_body, update_body

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    ht, wd = 480, 752
    cfg = get_cfg()
    cfg.MOTION_PROBE_THR = -1.0
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)

    rng = np.random.RandomState(0)
    frames = [(rng.rand(ht, wd, 3) * 255).astype(np.uint8) for _ in range(8)]
    intr = np.array([458.654, 457.296, 367.215, 248.375], np.float32)

    captured = {}
    WARM = 60
    for f in range(WARM):
        slam(f, frames[f % len(frames)], intr)
        if getattr(slam, "_fused_fn", None) is not None and "wrapped" not in captured:
            captured["wrapped"] = True
            inner = slam._fused_fn

            def wrapper(*args, **kw):
                captured["args"] = args
                captured["kw"] = kw
                return inner(*args, **kw)

            slam._fused_fn = wrapper
            captured["inner"] = inner
    jax.block_until_ready(slam.pg.poses_)

    args = list(captured["args"])
    kw = dict(captured["kw"])
    print("static kw:", kw, file=sys.stderr)
    frame_body = slam._frame_body
    model = slam.model
    M_, pmem_, mem_ = slam.M, slam.pmem, slam.mem

    pg = slam.pg
    live = [pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
            pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
            pg.score_dev]
    for slot, val in zip(range(3, 14), live):
        args[slot] = val
    args[17], args[18], args[19] = pg.net, pg.target, pg.weight
    args[29] = -1  # same as bench_fused: shift program runs, no-op rows

    SPAN = kw["shift_span"]

    @partial(jax.jit, static_argnames=("SPAN_",),
             donate_argnums=tuple(range(3, 14)))
    def frame_prog(params, image_u8, seed, poses, patches_buf, intr_buf,
                   imap_buf, gmap_buf, f1buf, f2buf, colors_buf, seg_buf,
                   scale_buf, score_buf, n, fac, intr_row, shift_k, shift_np,
                   fslot, pslot, *, SPAN_):
        if SPAN_ > 0:
            (poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
             f2buf, colors_buf, seg_buf, scale_buf, score_buf,
             dP) = shift_span_body(
                poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
                f2buf, colors_buf, seg_buf, scale_buf, score_buf,
                shift_k, shift_np, SPAN=SPAN_, M=M_, pmem=pmem_, mem=mem_)
        return frame_body(params, image_u8, seed, poses, patches_buf,
                          intr_buf, imap_buf, gmap_buf, f1buf, f2buf,
                          colors_buf, seg_buf, scale_buf, score_buf, n, fac,
                          True, intr_row, fslot, pslot)

    upd_jit = partial(
        jax.jit,
        static_argnames=("model", "NW", "KWIN", "EPAD", "GROUP_M",
                         "iterations", "is_cdv", "HW1", "HW2",
                         "ba_assembly", "LAT_L"),
        donate_argnums=(2, 3, 9, 10, 11),
    )(lambda params, model, *a, **k: update_body(params, model, *a, **k))

    def run_frame(a):
        return frame_prog(a[0], a[1], a[2], *a[3:14], a[14], a[15], a[16],
                          a[29], a[30], a[31], a[32], SPAN_=SPAN)

    def run_update(a):
        return upd_jit(
            a[0], model, a[3], a[4], a[5], a[6], a[7], a[8], a[9],
            a[17], a[18], a[19], a[20], a[13], a[21], a[22], a[23], a[24],
            a[25], a[26], a[27], a[28],
            NW=kw["NW"], KWIN=kw["KWIN"], EPAD=kw["EPAD"],
            GROUP_M=kw["GROUP_M"], iterations=kw["iterations"],
            is_cdv=kw["is_cdv"], HW1=kw["HW1"], HW2=kw["HW2"],
            ba_assembly="lattice" if kw["LAT_L"] else "onehot",
            LAT_L=kw["LAT_L"])

    def set_frame_out(a, out):
        # frame returns: poses, patches, intr, imap, gmap, f1, f2, colors,
        # seg, scale, score
        for slot, val in zip(range(3, 14), out):
            a[slot] = val
        return a

    def set_update_out(a, out):
        # update returns: poses, patches_full, net, target, weight, dn, mm
        a[3], a[4], a[17], a[18], a[19] = out[:5]
        return a

    # compile both
    out_f = run_frame(args)
    args = set_frame_out(args, out_f)
    out_u = run_update(args)
    args = set_update_out(args, out_u)
    jax.block_until_ready(out_u[0])

    t0 = time.perf_counter()
    for _ in range(iters):
        out_f = run_frame(args)
        args = set_frame_out(args, out_f)
        out_u = run_update(args)
        args = set_update_out(args, out_u)
    jax.block_until_ready(out_u[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"split frame+update: {dt*1e3:.2f} ms/frame (chain of {iters})")

    # each part alone (chained on itself)
    t0 = time.perf_counter()
    for _ in range(iters):
        out_f = run_frame(args)
        args = set_frame_out(args, out_f)
    jax.block_until_ready(out_f[0])
    dtf = (time.perf_counter() - t0) / iters
    print(f"  frame part alone: {dtf*1e3:.2f} ms/call")

    t0 = time.perf_counter()
    for _ in range(iters):
        out_u = run_update(args)
        args = set_update_out(args, out_u)
    jax.block_until_ready(out_u[0])
    dtu = (time.perf_counter() - t0) / iters
    print(f"  update part alone: {dtu*1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
