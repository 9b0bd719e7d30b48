"""Batched RANSAC DLT-PnP tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.backend.pnp import ransac_pnp, reprojection_errors, solve_pnp_dlt
from tpuslam.common.geometry import so3_exp

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
RNG = np.random.default_rng(5)


def synthetic_pnp(n=60, outlier_frac=0.0, noise_px=0.0, rng=RNG):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * 0.4
    R = np.asarray(so3_exp(jnp.asarray(w)))
    t = np.array([0.3, -0.2, 0.5])
    X = rng.uniform([-3, -2, 4], [3, 2, 12], size=(n, 3))
    # X in world; camera sees x = R X + t
    cam = X @ R.T + t
    pix = cam @ K.T
    uv = pix[:, :2] / pix[:, 2:]
    uv += rng.normal(size=uv.shape) * noise_px
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    return X.astype(np.float32), uv.astype(np.float32), R, t


def rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def test_dlt_exact_recovery():
    X, uv, R, t = synthetic_pnp(n=30)
    xn = (uv - K[:2, 2]) / np.diag(K)[:2]
    Re, te = solve_pnp_dlt(jnp.asarray(X), jnp.asarray(xn, jnp.float32))
    assert rot_angle_deg(np.asarray(Re), R) < 0.05
    np.testing.assert_allclose(np.asarray(te), t, atol=5e-3)
    # orthonormality
    Re = np.asarray(Re)
    np.testing.assert_allclose(Re @ Re.T, np.eye(3), atol=1e-5)


def test_ransac_pnp_clean():
    X, uv, R, t = synthetic_pnp(n=50)
    res = ransac_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(50, bool), jnp.asarray(K),
        jax.random.PRNGKey(0),
    )
    assert bool(res.success)
    assert int(res.num_inliers) == 50
    assert rot_angle_deg(np.asarray(res.R), R) < 0.1
    np.testing.assert_allclose(np.asarray(res.t), t, atol=0.01)


def test_ransac_pnp_outliers():
    X, uv, R, t = synthetic_pnp(n=100, outlier_frac=0.4, noise_px=0.5)
    res = ransac_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(100, bool), jnp.asarray(K),
        jax.random.PRNGKey(1), reproj_threshold=2.0,
    )
    assert bool(res.success)
    assert 50 <= int(res.num_inliers) <= 70
    assert rot_angle_deg(np.asarray(res.R), R) < 0.5
    np.testing.assert_allclose(np.asarray(res.t), t, atol=0.05)


def test_ransac_pnp_insufficient():
    X, uv, *_ = synthetic_pnp(n=20)
    valid = np.zeros(20, bool)
    valid[:4] = True  # < sample size 6
    res = ransac_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid), jnp.asarray(K),
        jax.random.PRNGKey(0),
    )
    assert not bool(res.success)
    np.testing.assert_array_equal(np.asarray(res.R), np.eye(3, dtype=np.float32))


def test_ransac_pnp_min_inliers_gate():
    """Pure-noise correspondences must not 'succeed' (reference gate:
    inliers >= MinInliersForPnP, loop_closure.cpp:224)."""
    X = RNG.uniform([-3, -2, 4], [3, 2, 12], (30, 3)).astype(np.float32)
    uv = RNG.uniform([0, 0], [640, 480], (30, 2)).astype(np.float32)
    res = ransac_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(30, bool), jnp.asarray(K),
        jax.random.PRNGKey(2), reproj_threshold=2.0, min_inliers=10,
    )
    assert not bool(res.success)


def test_reprojection_errors_cheirality():
    X, uv, R, t = synthetic_pnp(n=20)
    err, z = reprojection_errors(
        jnp.asarray(K, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(X), jnp.asarray(uv),
    )
    assert float(jnp.max(err)) < 1e-2
    assert (np.asarray(z) > 0).all()


def test_gn_refine_beats_dlt_refit_on_noise():
    """The GN LO refit must recover the pose at least as well as the DLT
    refit on noisy inliers (it minimises the true pixel error; the DLT
    minimises an algebraic proxy)."""
    X, uv, R, t = synthetic_pnp(n=80, outlier_frac=0.3, noise_px=1.0,
                                rng=np.random.default_rng(11))
    kw = dict(reproj_threshold=3.0, hyp_sweeps=3, lo_rounds=1)
    res_dlt = ransac_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(80, bool), jnp.asarray(K),
        jax.random.PRNGKey(3), refine="dlt", **kw,
    )
    res_gn = ransac_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(80, bool), jnp.asarray(K),
        jax.random.PRNGKey(3), refine="gn", **kw,
    )
    assert bool(res_gn.success)
    ang_gn = rot_angle_deg(np.asarray(res_gn.R), R)
    ang_dlt = rot_angle_deg(np.asarray(res_dlt.R), R)
    assert ang_gn <= ang_dlt + 0.05
    assert ang_gn < 0.5
    np.testing.assert_allclose(np.asarray(res_gn.t), t, atol=0.05)
    # GN pose is a proper rotation
    Rg = np.asarray(res_gn.R)
    np.testing.assert_allclose(Rg @ Rg.T, np.eye(3), atol=1e-5)


def test_gn_refine_exact_noop():
    """At a perfect initial pose with exact correspondences, GN must stay."""
    from tpuslam.backend.pnp import refine_pnp_gn

    X, uv, R, t = synthetic_pnp(n=40, rng=np.random.default_rng(12))
    Rr, tr = refine_pnp_gn(
        jnp.asarray(K, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(X), jnp.asarray(uv),
        jnp.ones(40, jnp.float32), iters=3,
    )
    assert rot_angle_deg(np.asarray(Rr), R) < 0.02
    np.testing.assert_allclose(np.asarray(tr), t, atol=2e-3)


def test_ransac_pnp_vmappable():
    Xs, uvs = [], []
    for i in range(3):
        X, uv, *_ = synthetic_pnp(n=40, rng=np.random.default_rng(i))
        Xs.append(X)
        uvs.append(uv)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    res = jax.vmap(
        lambda X, uv, k: ransac_pnp(X, uv, jnp.ones(40, bool), jnp.asarray(K), k)
    )(jnp.asarray(np.stack(Xs)), jnp.asarray(np.stack(uvs)), keys)
    assert res.R.shape == (3, 3, 3)
    assert bool(res.success.all())
