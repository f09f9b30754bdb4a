"""Score-weighted BA weights + selection-time seg filtering
(VERDICT round 1 items #4, #5; reference net_cdv.py:231-238, 543-545)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdvslam_tpu.models.heads import SegHeadFlatten
from cdvslam_tpu.models.patchifier import seg_binary_score, select_score


def test_seg_binary_score_masks_dynamic_and_border():
    hi, wi = 8, 10
    filt = np.zeros(hi * wi, bool)
    filt.reshape(hi, wi)[3:5, 4:7] = True      # dynamic block
    s = seg_binary_score(jnp.asarray(filt), 1, hi, wi)
    s = np.asarray(s)[0]
    assert (s[3:5, 4:7] == 0).all()
    assert (s[0, :] == 0).all() and (s[-1, :] == 0).all()
    assert (s[:, 0] == 0).all() and (s[:, -1] == 0).all()
    assert s[1, 1] == 1.0


def test_select_score_never_picks_zero_score_cells():
    hi, wi = 12, 16
    filt = np.zeros(hi * wi, bool)
    filt.reshape(hi, wi)[2:9, 3:12] = True     # large dynamic region
    smap = seg_binary_score(jnp.asarray(filt), 1, hi, wi)
    scale_f2i = 4.0 / 14.0
    M = 16
    for seed in range(5):
        coords, scores = select_score(
            jax.random.PRNGKey(seed), smap, M, scale_f2i, True)
        # map fine coords back to token cells
        tx = np.floor(np.asarray(coords[0, :, 0]) * scale_f2i).astype(int)
        ty = np.floor(np.asarray(coords[0, :, 1]) * scale_f2i).astype(int)
        picked = np.asarray(smap)[0, ty, tx]
        assert (picked > 0).all(), "selected a dynamic/border cell"
        assert (np.asarray(scores) > 0).all()


def test_seg_head_filt_mask():
    """filt_mask flags exactly the tokens whose argmax class is dynamic."""
    head = SegHeadFlatten(num_classes=5, in_channels=4)
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    cls = np.asarray(head.apply(params, x, method=SegHeadFlatten.seg_class))
    filt_index = jnp.asarray([1, 3])
    m = np.asarray(head.apply(params, x, filt_index,
                              method=SegHeadFlatten.filt_mask))
    assert (m == np.isin(cls, [1, 3])).all()


def test_zero_score_patch_contributes_nothing_to_ba():
    """Edges of a score-0 patch get weight 0 out of the update step, and
    BA poses are identical to explicitly removing those edges."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    (params, poses, patches_full, intr, imap_buf, gmap_buf,
     fmap1, fmap2, net, target, weightb, weight_mul, score_full, packed) = args

    M = 8
    dead_patch = 3                     # zero out patch kk=3 (frame 0)
    score0 = score_full.at[dead_patch].set(0.0)

    def fresh():
        # poses/patches/net/target/weight are donated by the jitted step:
        # hand each call its own copies
        return (jnp.array(poses), jnp.array(patches_full), jnp.array(net),
                jnp.array(target), jnp.array(weightb))

    p1, pf1, n1, t1, w1 = fresh()
    out = fn(params, p1, pf1, intr, imap_buf, gmap_buf,
             fmap1, fmap2, n1, t1, w1, weight_mul, score0, packed)
    poses_a, _, _, _, weight_a, _, _ = out

    kk = np.asarray(packed)[2]         # k0 = 0 in the entry fixture
    dead_edges = kk == dead_patch
    assert dead_edges.any()
    w = np.asarray(weight_a)
    assert (w[dead_edges] == 0).all(), "score-0 edges must have zero weight"
    assert (np.abs(w[~dead_edges]).sum() > 0)

    # equivalence: zeroing the weight_mul on those edges gives the same BA
    wm0 = weight_mul.at[jnp.asarray(dead_edges)].set(0.0)
    p2, pf2, n2, t2, w2 = fresh()
    out2 = fn(params, p2, pf2, intr, imap_buf, gmap_buf,
              fmap1, fmap2, n2, t2, w2, wm0, score_full, packed)
    poses_b = out2[0]
    np.testing.assert_allclose(np.asarray(poses_a), np.asarray(poses_b),
                               rtol=1e-6, atol=1e-6)
