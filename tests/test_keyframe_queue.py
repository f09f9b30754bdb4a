"""Lagged keyframe decisions (runtime._kf_queue): physical-frame-id row
resolution, deferred edge compaction, and delta-chain bookkeeping must
match the synchronous keyframe() semantics (reference slam.py:408-458)."""
import numpy as np
import jax.numpy as jnp

from cdvslam_tpu.config import get_cfg
from cdvslam_tpu.slam import SLAM


def _zero_override(ii, jj, kk, center):
    E = len(ii)
    return np.zeros((E, 2), np.float32), np.full((E, 2), 0.5, np.float32)


def _mk_slam(loop_closure=False):
    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 4
    cfg.BUFFER_SIZE = 64
    cfg.KEYFRAME_INDEX = 2
    cfg.REMOVAL_WINDOW = 6
    cfg.LOOP_CLOSURE = loop_closure
    slam = SLAM(cfg, network="dpv", ht=64, wd=96,
                update_override=_zero_override)
    return slam


def _seed_frames(slam, n):
    pg = slam.pg
    M = slam.M
    pg.n = n
    pg.m = n * M
    pg.counter = n
    pg.tstamps_[:n] = np.arange(n)
    pg.poses_ = pg.poses_.at[:n, 0].set(jnp.arange(n, dtype=jnp.float32))
    # one edge block per frame pair (i -> i+1)
    for i in range(n - 1):
        kk = np.arange(i * M, (i + 1) * M)
        pg.append_edges(kk // M, np.full(M, i + 1), kk)
    return pg


def test_decide_row_resolves_physical_id_after_removal():
    slam = _mk_slam()
    pg = _seed_frames(slam, 10)
    # decision queued for physical frame id 5 (currently row 5)
    low = jnp.asarray([0.1, 0.1])   # below KEYFRAME_THRESH -> remove
    high = jnp.asarray([50.0, 50.0])
    assert slam._decide_row(5, low) == 5
    assert slam._decide_row(5, high) is None
    # an earlier removal shifts rows: remove row 3 -> pid 5 now at row 4
    slam._kf_apply(3, defer=False)
    assert pg.n == 9
    assert slam._decide_row(5, low) == 4
    # removed pid no longer resolvable
    assert slam._decide_row(3, low) is None


def test_kf_apply_matches_reference_bookkeeping():
    slam = _mk_slam()
    pg = _seed_frames(slam, 10)
    M = slam.M
    E0 = pg.E
    poses_before = np.asarray(pg.poses_[:10, 0])

    k = 5
    t1 = int(pg.tstamps_[k])
    slam._kf_apply(k, defer=False)

    # frame count and timestamps shifted
    assert pg.n == 9
    np.testing.assert_array_equal(pg.tstamps_[:9], [0, 1, 2, 3, 4, 6, 7, 8, 9])
    # poses shifted left from row k
    np.testing.assert_allclose(np.asarray(pg.poses_[:9, 0]),
                               np.delete(poses_before, k), atol=1e-6)
    # edges referencing k dropped, later ones reindexed
    assert not np.any((pg.ii == 8) & False)  # shape sanity
    assert pg.E < E0
    assert not np.any(pg.ii == 9)            # max frame index shrank
    assert np.all(pg.jj <= 8)
    # delta chain records the removed frame against its predecessor
    assert t1 in pg.delta
    t0, dP = pg.delta[t1]
    assert t0 == int(pg.tstamps_[k - 1])
    assert np.isfinite(np.asarray(dP)).all()


def test_deferred_compaction_defers_device_work():
    slam = _mk_slam()
    pg = _seed_frames(slam, 10)
    net_before = pg.net
    slam._kf_apply(5, defer=True)
    # host lists updated immediately; device compaction left pending
    assert pg._pending_gather is not None
    keep, nkeep = pg._pending_gather
    assert nkeep == pg.E and len(keep) == nkeep
    assert pg.net is net_before            # untouched device buffer
    assert pg.net_valid == nkeep
    # the pending gather is consumed into the next packed upload (row 12)
    E_pad = pg.bucket(pg.E)
    pg._grow(E_pad)
    _, _, packed, _ = slam._prepare_update(pg.ii, pg.jj, pg.kk, E_pad)
    g = slam._packed_rows16(packed, E_pad)[12]
    np.testing.assert_array_equal(g[:nkeep], keep)
    assert pg._pending_gather is None
    # without a pending compaction the gather row is identity
    _, _, packed2, _ = slam._prepare_update(pg.ii, pg.jj, pg.kk, E_pad)
    np.testing.assert_array_equal(
        slam._packed_rows16(packed2, E_pad)[12, :E_pad], np.arange(E_pad))


def test_queue_drain_at_terminate_applies_decisions():
    slam = _mk_slam()
    pg = _seed_frames(slam, 10)
    slam.is_initialized = True
    slam.tlist = list(range(10))
    low = jnp.asarray([0.1, 0.1])
    slam._kf_queue.append((int(pg.tstamps_[6]), low))
    slam._kf_queue.append((int(pg.tstamps_[7]), low))
    poses, tstamps = slam.terminate()
    assert len(slam._kf_queue) == 0
    # both frames were removed as keyframes but interpolated back
    assert pg.n == 8
    assert poses.shape == (10, 7)
    assert np.isfinite(poses).all()


def test_apply_pending_shift_matches_immediate_removal():
    """A keyframe shift deferred to the fused dispatch, when applied
    eagerly (edges_loop needs coherent device rows), must produce the
    same device/host state and delta entry as an immediate removal."""
    slam_a = _mk_slam()
    slam_b = _mk_slam()
    pg_a = _seed_frames(slam_a, 10)
    pg_b = _seed_frames(slam_b, 10)

    k = 5
    t1 = int(pg_a.tstamps_[k])
    slam_a._kf_apply(k, defer=False)                   # immediate
    slam_b._kf_apply(k, defer=False, fused_shift=True) # deferred
    assert slam_b._pending_shift is not None
    # device poses are stale under post-removal numbering until applied
    slam_b._apply_pending_shift()
    assert slam_b._pending_shift is None

    np.testing.assert_allclose(np.asarray(pg_b.poses_[:9]),
                               np.asarray(pg_a.poses_[:9]), atol=1e-6)
    np.testing.assert_array_equal(pg_b.tstamps_[:9], pg_a.tstamps_[:9])
    assert pg_a.n == pg_b.n == 9
    assert t1 in pg_b.delta
    t0_a, dP_a = pg_a.delta[t1]
    t0_b, dP_b = pg_b.delta[t1]
    assert t0_a == t0_b
    np.testing.assert_allclose(np.asarray(dP_b), np.asarray(dP_a), atol=1e-6)
    # idempotent: a second call is a no-op
    slam_b._apply_pending_shift()


def test_prepare_update_packed_plan_rows():
    """Rows 13-15 of the packed upload must be (order, inv, sub-tile frame
    ids) exactly as plan_corr_order computes them (kernels.update_body
    unpacks them positionally)."""
    import jax.numpy as jnp
    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM
    from cdvslam_tpu.ops.corr_pallas import SUBTE, corr_epad, plan_corr_order

    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 4
    cfg.BUFFER_SIZE = 24
    slam = SLAM(cfg, network="dpv", ht=64, wd=96,
                update_override=lambda *a: None)
    # seed the row->slot indirection tables (normally filled as frames
    # are inserted; this test drives _prepare_update directly)
    slam.fslot_rows[:] = np.arange(len(slam.fslot_rows)) % slam.mem
    slam.pslot_rows[:] = np.arange(len(slam.pslot_rows)) % slam.pmem
    rng = np.random.RandomState(0)
    E = 37
    ii = rng.randint(0, 6, E)
    jj = rng.randint(0, 6, E)
    kk = ii * 4 + rng.randint(0, 4, E)
    E_pad = slam.pg.bucket(E)
    k0, KWIN, packed, _ = slam._prepare_update(ii, jj, kk, E_pad)
    EP2 = corr_epad(E_pad, slam.mem)
    pk = np.asarray(packed).reshape(-1, EP2)[:16]
    jjm_pad = np.concatenate([slam.fslot_rows[jj].astype(np.int64),
                              np.zeros(E_pad - E, np.int64)])
    order, jj_steps, inv = plan_corr_order(jjm_pad, slam.mem, EP2)
    np.testing.assert_array_equal(pk[13], order)
    np.testing.assert_array_equal(pk[14, :E_pad], inv)
    np.testing.assert_array_equal(pk[15, : EP2 // SUBTE], jj_steps)


def test_prepare_update_cache_matches_fresh_across_wrap():
    """The host prep cache reuses sort-heavy rows keyed by the relative
    edge structure; the corr plan sorts by jj %% mem which wraps, so a
    shifted-but-identical structure must still reproduce EXACTLY what a
    cold cache computes (regression: a phase-blind cache key served a
    stale corr order past the ring-buffer boundary)."""
    import jax
    import numpy as np

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 4
    cfg.BUFFER_SIZE = 96
    slam = SLAM(cfg, network="dpv", ht=64, wd=64,
                update_override=lambda *a: None)
    M = slam.M
    mem = slam.mem
    # seed the row->slot tables like a removal-free run would fill them
    slam.fslot_rows[:] = np.arange(len(slam.fslot_rows)) % mem
    slam.pslot_rows[:] = np.arange(len(slam.pslot_rows)) % slam.pmem

    def edges(base):
        # forward/backward-style pattern spanning 6 frames from `base`
        kk, jj = [], []
        for f in range(base, base + 6):
            for s in range(max(base, f - 3), f):
                kk.extend(range(s * M, (s + 1) * M))
                jj.extend([f] * M)
        return (np.asarray(kk) // M, np.asarray(jj), np.asarray(kk))

    outs = {}
    for mode in ("cold", "warm"):
        slam._prep_cache = {}
        packs = []
        # bases chosen so jj % mem wraps between structures
        for base in (mem - 8, mem - 7, 2 * mem - 8, 2 * mem - 7):
            ii, jj, kk = edges(base)
            E_pad = slam.pg.bucket(len(ii))
            if mode == "warm" and base >= 2 * mem - 8:
                # warm run: later bases hit the cache entries built from
                # the SAME phase one ring-cycle earlier
                pass
            k0, KWIN, packed, _ = slam._prepare_update(ii, jj, kk, E_pad)
            packs.append((k0, KWIN, np.asarray(packed)))
        outs[mode] = packs
    for (k0a, ka, pa), (k0b, kb, pb) in zip(outs["cold"], outs["warm"]):
        assert k0a == k0b and ka == kb
        np.testing.assert_array_equal(pa, pb)
