"""Golden-value tests for projective geometry vs. an independent numpy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdvslam_tpu.lie import SE3, Sim3
from cdvslam_tpu.geom import iproj, proj, transform, flow_mag, point_cloud


def _quat_to_R(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _make_problem(seed=0, N=5, M=4, P=3):
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    poses = SE3.exp(0.1 * jax.random.normal(key, (1, N, 6)))
    # patches: plausible pixel coords + positive inverse depth
    x = rng.uniform(10, 90, size=(1, N * M, 1, P, P))
    y = rng.uniform(10, 70, size=(1, N * M, 1, P, P))
    d = rng.uniform(0.3, 2.0, size=(1, N * M, 1, P, P))
    patches = jnp.asarray(np.concatenate([x, y, d], axis=2), jnp.float32)
    intr = jnp.tile(jnp.asarray([50.0, 50.0, 48.0, 36.0]), (1, N, 1))
    ii = jnp.arange(N * M) // M
    kk = jnp.arange(N * M)
    jj = (ii + 1) % N
    return poses, patches, intr, ii, jj, kk


def test_iproj_proj_roundtrip():
    poses, patches, intr, ii, jj, kk = _make_problem()
    X = iproj(patches, jnp.take(intr, ii, axis=1))
    x = proj(X, jnp.take(intr, ii, axis=1), depth=True)
    np.testing.assert_allclose(x[..., 0], patches[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(x[..., 1], patches[:, :, 1], atol=1e-4)
    # Z of the homogeneous point is 1 after iproj, so returned depth is 1
    np.testing.assert_allclose(x[..., 2], jnp.ones_like(x[..., 2]), atol=1e-5)


def test_transform_identity_pose():
    poses, patches, intr, ii, jj, kk = _make_problem()
    ident = SE3.Identity((1, 5))
    coords = transform(ident, patches, intr, ii, ii, kk)
    np.testing.assert_allclose(coords[..., 0], patches[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(coords[..., 1], patches[:, :, 1], atol=1e-4)


def test_transform_numpy_oracle():
    poses, patches, intr, ii, jj, kk = _make_problem()
    coords = np.asarray(transform(poses, patches, intr, ii, jj, kk))
    pd = np.asarray(poses.data[0])
    pa = np.asarray(patches[0])
    E = len(ii)
    for e in [0, 3, 7, E - 1]:
        i, j, k = int(ii[e]), int(jj[e]), int(kk[e])
        fx, fy, cx, cy = np.asarray(intr[0, i])
        Ri, ti = _quat_to_R(pd[i, 3:]), pd[i, :3]
        Rj, tj = _quat_to_R(pd[j, 3:]), pd[j, :3]
        for (pi, pj) in [(0, 0), (1, 1), (2, 2)]:
            x, y, d = pa[k, 0, pi, pj], pa[k, 1, pi, pj], pa[k, 2, pi, pj]
            Pc = np.array([(x - cx) / fx, (y - cy) / fy, 1.0]) / d
            Pw = Ri.T @ (Pc - ti)          # G_i = world->cam_i, so cam_i->world = inv
            Pj = Rj @ Pw + tj
            Z = max(Pj[2], 0.1 / d)  # proj clamps Z*d... careful: clamp applies to Z of X1 (homog w=d)
            # replicate the homogeneous math exactly: X1 = Gij act4 [xn,yn,1,d]
            Gij_R = Rj @ Ri.T
            Gij_t = tj - Gij_R @ ti
            Xh = np.array([(x - cx) / fx, (y - cy) / fy, 1.0, d])
            X1 = np.concatenate([Gij_R @ Xh[:3] + d * Gij_t, [d]])
            dd = 1.0 / max(X1[2], 0.1)
            expect = np.array([fx * dd * X1[0] + cx, fy * dd * X1[1] + cy])
            np.testing.assert_allclose(coords[0, e, pi, pj], expect, atol=1e-3)


def test_transform_jacobian_fd():
    """Analytic pose Jacobian Jj matches finite differences of the retraction."""
    jax.config.update("jax_enable_x64", True)
    try:
        _run_transform_jacobian_fd()
    finally:
        jax.config.update("jax_enable_x64", False)


def _run_transform_jacobian_fd():
    poses, patches, intr, ii, jj, kk = _make_problem(seed=3)
    poses = SE3(poses.data.astype(jnp.float64))
    patches = patches.astype(jnp.float64)
    intr = intr.astype(jnp.float64)
    coords, v, (Ji, Jj, Jz) = transform(poses, patches, intr, ii, jj, kk, jacobian=True)
    P = patches.shape[-1]
    center = coords[..., P // 2, P // 2, :]

    eps = 1e-6
    # perturb pose j by Exp(eps * e_a) on the left, frame by frame
    for a in range(6):
        dxi = np.zeros(6)
        dxi[a] = eps
        dG = SE3.exp(jnp.asarray(dxi, jnp.float64))
        pd = poses.data
        pert = SE3(jnp.broadcast_to(dG.data, pd.shape)).mul(SE3(pd)).data
        for f in range(5):
            sel = np.asarray(jj) == f
            if not sel.any():
                continue
            newp = np.asarray(pd).copy()
            newp[0, f] = np.asarray(pert)[0, f]
            cp = transform(SE3(jnp.asarray(newp)), patches, intr, ii, jj, kk)
            num = (np.asarray(cp[..., P // 2, P // 2, :]) - np.asarray(center)) / eps
            ana = np.asarray(Jj[..., a])
            valid = np.asarray(v)[0] > 0.5
            selv = sel & valid
            np.testing.assert_allclose(num[0][selv], ana[0][selv], atol=1e-4, rtol=1e-4)


def test_flow_mag_shapes():
    poses, patches, intr, ii, jj, kk = _make_problem()
    fm, val = flow_mag(poses, patches, intr, ii, jj, kk, beta=0.5)
    assert fm.shape == (1, len(ii), 3, 3)
    assert val.dtype == jnp.bool_


def test_point_cloud_inverts_projection():
    poses, patches, intr, ii, jj, kk = _make_problem()
    pts = point_cloud(poses, patches, intr, ii)
    # reprojecting the world point through pose i should land at the pixel
    Xw = pts[..., 1, 1, :3] / pts[..., 1, 1, 3:]
    g = jnp.take(poses.data, ii, axis=1)
    Xc = SE3(g).act(Xw)
    fx, fy, cx, cy = [jnp.take(intr, ii, axis=1)[..., i] for i in range(4)]
    x = fx * Xc[..., 0] / Xc[..., 2] + cx
    y = fy * Xc[..., 1] / Xc[..., 2] + cy
    np.testing.assert_allclose(x, patches[:, :, 0, 1, 1], atol=1e-2)
    np.testing.assert_allclose(y, patches[:, :, 1, 1, 1], atol=1e-2)
