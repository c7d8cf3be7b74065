import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_birdview_tpu.core import lie
from orbslam_birdview_tpu.solvers import icp, initializer, pnp, sim3, twoview

KEY = jax.random.PRNGKey(0)
K_np = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], dtype=np.float32)


def synth_two_view(rng, n=200, planar=False, noise=0.5, outlier_frac=0.1):
    """Random 3D scene seen by two cameras; returns pixels + ground truth."""
    if planar:
        X = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), np.full(n, 6.0)], axis=1
        )
    else:
        X = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(4, 12, n)], axis=1
        )
    R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.1, 0.03], dtype=jnp.float32)))
    t = np.array([0.8, 0.05, 0.1], dtype=np.float32)

    def proj(Xc):
        uv = (K_np @ Xc.T).T
        return uv[:, :2] / uv[:, 2:3]

    x1 = proj(X)
    x2 = proj(X @ R.T + t)
    x1 += rng.normal(0, noise, x1.shape)
    x2 += rng.normal(0, noise, x2.shape)
    n_out = int(outlier_frac * n)
    x2[:n_out] = rng.uniform(0, 640, size=(n_out, 2))
    valid = np.ones(n, dtype=bool)
    return (
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.asarray(valid),
        R,
        t,
        X,
    )


def test_fundamental_ransac_recovers_motion(rng):
    x1, x2, valid, R_gt, t_gt, X = synth_two_view(rng)
    fit = twoview.fit_fundamental_ransac(KEY, x1, x2, valid, sigma=1.0)
    assert int(jnp.sum(fit.inliers)) > 150
    Rs, ts = twoview.motion_hypotheses_from_F(fit.model, jnp.asarray(K_np))
    ok, R, t, Xtri, good = twoview.select_motion(
        Rs, ts, x1, x2, fit.inliers, jnp.asarray(K_np), 1.0
    )
    assert bool(ok)
    # translation direction matches
    t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert np.dot(t_dir, t_gt_dir) > 0.995
    err_R = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt.T) @ R)))
    assert err_R < 0.01


def test_homography_ransac_planar(rng):
    x1, x2, valid, R_gt, t_gt, X = synth_two_view(rng, planar=True)
    fitH = twoview.fit_homography_ransac(KEY, x1, x2, valid, sigma=1.0)
    fitF = twoview.fit_fundamental_ransac(KEY, x1, x2, valid, sigma=1.0)
    rh = float(fitH.score / (fitH.score + fitF.score))
    assert rh > 0.40, f"planar scene should select H (rh={rh})"
    assert int(jnp.sum(fitH.inliers)) > 150


def test_triangulation_exact():
    P1 = jnp.asarray(K_np @ np.hstack([np.eye(3), np.zeros((3, 1))]), jnp.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.0, -0.05, 0.0], dtype=jnp.float32)))
    t = np.array([1.0, 0, 0], dtype=np.float32)
    P2 = jnp.asarray(K_np @ np.hstack([R, t[:, None]]), jnp.float32)
    X = np.array([[0.5, -0.3, 5.0], [-1.0, 0.8, 8.0]], dtype=np.float32)

    def pr(P, X):
        Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        uv = (np.asarray(P) @ Xh.T).T
        return uv[:, :2] / uv[:, 2:3]

    x1 = jnp.asarray(pr(P1, X), jnp.float32)
    x2 = jnp.asarray(pr(P2, X), jnp.float32)
    Xt = np.asarray(twoview.triangulate_dlt(P1, P2, x1, x2))
    np.testing.assert_allclose(Xt, X, atol=1e-2)


def test_icp2d_ransac(rng):
    n = 150
    p2 = rng.uniform(-5, 5, size=(n, 2)).astype(np.float32)
    th = 0.3
    R_gt = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    t_gt = np.array([1.2, -0.7], np.float32)
    p1 = p2 @ R_gt.T + t_gt + rng.normal(0, 0.02, (n, 2)).astype(np.float32)
    p1[:20] = rng.uniform(-5, 5, size=(20, 2))  # outliers
    res = icp.icp2d_ransac(
        KEY, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool), sigma=0.05
    )
    assert bool(res.ok)
    assert int(res.n_inliers) > 110
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=2e-2)


def test_icp3d_ransac(rng):
    n = 120
    p2 = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.3, 0.5], dtype=jnp.float32)))
    t_gt = np.array([0.5, 1.0, -2.0], np.float32)
    p1 = p2 @ R_gt.T + t_gt + rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    p1[:15] += rng.uniform(1, 3, size=(15, 3))
    res = icp.icp3d_ransac(
        KEY, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool), sigma=0.03
    )
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=2e-2)


def test_horn_sim3(rng):
    n = 50
    p2 = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.3, 0.1, -0.4], dtype=jnp.float32)))
    s_gt = 1.7
    t_gt = np.array([0.3, -1.1, 0.8], np.float32)
    p1 = s_gt * (p2 @ R_gt.T) + t_gt
    R, t, s = sim3.horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
    np.testing.assert_allclose(float(s), s_gt, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)
    # fixed-scale mode
    R2, t2, s2 = sim3.horn_sim3(jnp.asarray(p1), jnp.asarray(p2), fix_scale=True)
    assert float(s2) == 1.0


def test_pnp_ransac(rng):
    n = 100
    X = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(4, 10, n)], axis=1
    ).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.2, 0.05], dtype=jnp.float32)))
    t_gt = np.array([0.4, -0.3, 0.5], np.float32)
    Xc = X @ R_gt.T + t_gt
    xyn = Xc[:, :2] / Xc[:, 2:3]
    xyn += rng.normal(0, 0.001, xyn.shape)
    xyn[:15] = rng.uniform(-0.5, 0.5, size=(15, 2))  # outliers
    res = pnp.pnp_ransac(
        KEY,
        jnp.asarray(X),
        jnp.asarray(xyn, jnp.float32),
        jnp.ones(n, bool),
        chi2_per_point=jnp.full(n, (3.0 / 500.0) ** 2, jnp.float32),
    )
    assert bool(res.ok)
    err_R = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt.T) @ res.R)))
    assert err_R < 5e-3, err_R
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=2e-2)


def test_sim3_ransac(rng):
    n = 80
    p2 = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 9, n)], axis=1
    ).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.05, 0.3, -0.1], dtype=jnp.float32)))
    s_gt, t_gt = 1.4, np.array([0.5, 0.1, -0.4], np.float32)
    p1 = s_gt * (p2 @ R_gt.T) + t_gt
    p1[:10] += rng.uniform(1, 2, (10, 3))
    res = sim3.sim3_ransac(
        KEY,
        jnp.asarray(p1),
        jnp.asarray(p2),
        jnp.ones(n, bool),
        jnp.full(n, 9.21, jnp.float32),
        jnp.full(n, 9.21, jnp.float32),
        500.0, 500.0, 320.0, 240.0, 500.0, 500.0, 320.0, 240.0,
    )
    assert bool(res.ok)
    np.testing.assert_allclose(float(res.s), s_gt, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-3)


def test_sim3_ransac_correlated_depth_noise(rng):
    """Regression: low-parallax monocular loop pairs carry correlated
    depth noise; the 3D LSQ refit then drags the scale off and loses
    reprojection inliers. sim3_ransac must keep the raw best hypothesis
    in that case (observed live: 77-inlier hypothesis degraded to 6 by
    the refit, silently vetoing every loop closure)."""
    n = 96
    p2 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(5, 8, n)], axis=1).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.15, 0.0], jnp.float32)))
    s_gt, t_gt = 1.0, np.array([0.3, 0.0, -0.1], np.float32)
    p1 = s_gt * (p2 @ R_gt.T) + t_gt
    # correlated depth error: perturb both clouds ALONG their viewing rays
    # (triangulation uncertainty), which barely moves reprojections but
    # wrecks a 3D least-squares scale fit
    for p in (p1, p2):
        ray = p / np.linalg.norm(p, axis=1, keepdims=True)
        p += ray * rng.normal(0, 0.12, (n, 1)).astype(np.float32)

    res = sim3.sim3_ransac(
        KEY, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool),
        jnp.full(n, 9.21, jnp.float32),
        jnp.full(n, 9.21, jnp.float32),
        500.0, 500.0, 320.0, 240.0, 500.0, 500.0, 320.0, 240.0,
    )
    assert bool(res.ok)
    assert int(res.n_inliers) >= 0.6 * n
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=0.03)


def test_initializer_monocular(rng):
    x1, x2, valid, R_gt, t_gt, X = synth_two_view(rng, noise=0.3, outlier_frac=0.05)
    res = initializer.initialize_two_view(
        KEY, x1, x2, valid, jnp.asarray(K_np), sigma=1.0
    )
    assert bool(res.ok)
    t_dir = np.asarray(res.t21) / np.linalg.norm(np.asarray(res.t21))
    assert np.dot(t_dir, t_gt / np.linalg.norm(t_gt)) > 0.99
    # up-to-scale point recovery: compare normalized depth stats
    good = np.asarray(res.good)
    assert good.sum() > 120
    Xr = np.asarray(res.points3d)[good]
    assert np.all(Xr[:, 2] > 0)


def test_initializer_with_birdview_metric_scale(rng):
    """The BEV ICP must rescale the monocular translation to metric."""
    x1, x2, valid, R_gt, t_gt, X = synth_two_view(rng, noise=0.3, outlier_frac=0.05)
    # BEV ground points in base frame; base==camera here (identity extrinsics)
    # ground motion: 2D projection of the camera motion. Use a pure planar
    # motion consistent with t_gt x-y and yaw ~ 0.1.
    nb = 120
    g2 = rng.uniform(-6, 6, size=(nb, 2)).astype(np.float32)
    th = 0.1
    R2d = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    tb = np.array([0.9, 0.2], np.float32)
    g1 = g2 @ R2d.T + tb + rng.normal(0, 0.01, (nb, 2)).astype(np.float32)
    # camera motion consistent with the ground: R about z, t = [tb, 0]
    Rg = np.eye(3, dtype=np.float32)
    Rg[:2, :2] = R2d
    # regenerate image points with this ground-truth motion
    Xs = np.stack(
        [rng.uniform(-4, 4, 200), rng.uniform(-3, 3, 200), rng.uniform(4, 12, 200)], 1
    ).astype(np.float32)
    R21 = np.linalg.inv(Rg)
    t21 = (-R21 @ np.array([tb[0], tb[1], 0.0])).astype(np.float32)

    def pr(Xc):
        uv = (K_np @ Xc.T).T
        return uv[:, :2] / uv[:, 2:3]

    x1 = jnp.asarray(pr(Xs) + rng.normal(0, 0.3, (200, 2)), jnp.float32)
    x2 = jnp.asarray(pr(Xs @ R21.T + t21) + rng.normal(0, 0.3, (200, 2)), jnp.float32)
    res = initializer.initialize_two_view(
        jax.random.PRNGKey(1),
        x1,
        x2,
        jnp.ones(200, bool),
        jnp.asarray(K_np),
        sigma=1.0,
        bird_xy1=jnp.asarray(g1),
        bird_xy2=jnp.asarray(g2),
        bird_valid=jnp.ones(nb, bool),
        bird_sigma=0.05,
        R_bc=jnp.eye(3),
        t_bc=jnp.zeros(3),
    )
    assert bool(res.ok)
    assert bool(res.icp_ok)
    # translation must now be METRIC: |t| ≈ |t21|
    t_norm = float(jnp.linalg.norm(res.t21))
    np.testing.assert_allclose(t_norm, np.linalg.norm(t21), rtol=0.08)


def test_initializer_rejects_small_baseline(rng):
    """ICP translation < 0.3 m must veto the init (reference gate)."""
    nb = 100
    g2 = rng.uniform(-6, 6, size=(nb, 2)).astype(np.float32)
    g1 = g2 + np.array([0.05, 0.0], np.float32)  # 5 cm motion
    x1, x2, valid, *_ = synth_two_view(rng, noise=0.3)
    res = initializer.initialize_two_view(
        KEY, x1, x2, valid, jnp.asarray(K_np), sigma=1.0,
        bird_xy1=jnp.asarray(g1), bird_xy2=jnp.asarray(g2),
        bird_valid=jnp.ones(nb, bool), bird_sigma=0.05,
        R_bc=jnp.eye(3), t_bc=jnp.zeros(3),
    )
    assert not bool(res.ok)


def test_epnp_single_shot(rng):
    """EPnP (Lepetit) parity solver: accuracy on clean correspondences."""
    from orbslam_birdview_tpu.solvers import epnp as epnp_mod

    n = 40
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                  rng.uniform(4, 10, n)], 1).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.15], dtype=jnp.float32)))
    t_gt = np.array([0.3, -0.2, 0.8], np.float32)
    Xc = X @ R_gt.T + t_gt
    xyn = Xc[:, :2] / Xc[:, 2:3] + rng.normal(0, 0.0005, (n, 2))
    R, t = epnp_mod.epnp(jnp.asarray(X), jnp.asarray(xyn, jnp.float32))
    errR = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt.T) @ R)))
    errt = np.linalg.norm(np.asarray(t) - t_gt)
    assert errR < 5e-3, errR
    assert errt < 3e-2, errt
