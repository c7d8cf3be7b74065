"""Matrix-free (implicit-Schur PCG) BA: equivalence with the dense path.

`graph.ba_large.bundle_adjust_large` must converge to the same optimum as
`graph.ba.bundle_adjust` — same LM protocol, different linear solver — while
never materializing the (C,6,P,3) coupling tensor.
"""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam_birdview_tpu.core import lie
from orbslam_birdview_tpu.graph import ba, ba_large

from test_graph import synth_ba_problem, FX, FY, CX, CY, BF


def _perturbed(rng, cam_R, cam_t, n_fixed):
    C = cam_R.shape[0]
    pert = jnp.asarray(rng.normal(0, 0.02, (C, 6)).astype(np.float32))
    pert = pert.at[:n_fixed].set(0.0)
    return jax.vmap(lie.se3_update_left)(cam_R, cam_t, pert)


def test_large_matches_dense(rng):
    cam_R, cam_t, X_gt, e_cam, e_pt, e_obs, E = synth_ba_problem(rng)
    C, P = cam_R.shape[0], X_gt.shape[0]
    Rp, tp = _perturbed(rng, cam_R, cam_t, 2)
    Xp = X_gt + jnp.asarray(rng.normal(0, 0.05, (P, 3)).astype(np.float32))
    mono = ba.EdgeSet(e_cam, e_pt, e_obs, jnp.ones(E), jnp.ones(E, bool))
    fixed = jnp.zeros(C, bool).at[0].set(True).at[1].set(True)
    args = (Rp, tp, fixed, jnp.ones(C, bool), Xp, jnp.ones(P, bool),
            mono, None, None, FX, FY, CX, CY)
    dense = ba.bundle_adjust(*args)
    implicit = ba_large.bundle_adjust_large(*args)
    # both reach the same optimum
    for c in range(C):
        dR = np.linalg.norm(np.asarray(
            lie.so3_log(implicit.cam_R[c] @ dense.cam_R[c].T)))
        dt = np.linalg.norm(np.asarray(implicit.cam_t[c] - dense.cam_t[c]))
        assert dR < 2e-3, (c, dR)
        assert dt < 5e-3, (c, dt)
    perr = np.linalg.norm(
        np.asarray(implicit.points) - np.asarray(dense.points), axis=1)
    assert np.median(perr) < 1e-2
    assert float(implicit.cost) < 1.05 * float(dense.cost) + 1e-3
    # inlier classification agrees
    agree = (np.asarray(implicit.inl_mono) == np.asarray(dense.inl_mono)).mean()
    assert agree > 0.99, agree


def test_large_with_outliers(rng):
    cam_R, cam_t, X_gt, e_cam, e_pt, e_obs, E = synth_ba_problem(rng, noise=0.3)
    C, P = cam_R.shape[0], X_gt.shape[0]
    n_out = E // 10
    e_obs = e_obs.at[:n_out].add(
        jnp.asarray(rng.uniform(30, 90, (n_out, 2)).astype(np.float32)))
    Rp, tp = _perturbed(rng, cam_R, cam_t, 2)
    mono = ba.EdgeSet(e_cam, e_pt, e_obs, jnp.ones(E), jnp.ones(E, bool))
    fixed = jnp.zeros(C, bool).at[0].set(True).at[1].set(True)
    res = ba_large.bundle_adjust_large(
        Rp, tp, fixed, jnp.ones(C, bool), X_gt, jnp.ones(P, bool),
        mono, None, None, FX, FY, CX, CY)
    inl = np.asarray(res.inl_mono)
    assert inl[:n_out].mean() < 0.15, "outliers should be rejected"
    assert inl[n_out:].mean() > 0.9
    for c in range(2, C):
        err_t = np.linalg.norm(np.asarray(res.cam_t[c] - cam_t[c]))
        assert err_t < 4e-2, (c, err_t)


def test_large_stereo_and_bird(rng):
    """Mixed mono+stereo+bird edge types through the implicit path."""
    cam_R, cam_t, X_gt, e_cam, e_pt, e_obs, E = synth_ba_problem(rng, n_cams=4)
    C, P = cam_R.shape[0], X_gt.shape[0]
    obs3 = []
    for i in range(E):
        c, p = int(e_cam[i]), int(e_pt[i])
        Xc = np.asarray(X_gt[p]) @ np.asarray(cam_R[c]).T + np.asarray(cam_t[c])
        obs3.append([float(e_obs[i, 0]), float(e_obs[i, 1]),
                     float(e_obs[i, 0]) - BF / Xc[2]])
    stereo = ba.EdgeSet(e_cam, e_pt, jnp.asarray(np.array(obs3, np.float32)),
                        jnp.ones(E), jnp.ones(E, bool))
    nb = 50
    Xb = np.stack([rng.uniform(-6, 6, nb), rng.uniform(-6, 6, nb),
                   np.zeros(nb)], 1).astype(np.float32)
    pts = jnp.concatenate([X_gt, jnp.asarray(Xb)], 0)
    b_cam, b_pt, b_obs = [], [], []
    for c in range(C):
        pc = Xb @ np.asarray(cam_R[c]).T + np.asarray(cam_t[c])
        b_cam += [c] * nb
        b_pt += (np.arange(nb) + P).tolist()
        b_obs += (pc + rng.normal(0, 0.01, pc.shape)).tolist()
    Eb = len(b_cam)
    bird = ba.EdgeSet(
        jnp.asarray(np.array(b_cam, np.int32)),
        jnp.asarray(np.array(b_pt, np.int32)),
        jnp.asarray(np.array(b_obs, np.float32)),
        jnp.full(Eb, 3.0 / 0.01 ** 2), jnp.ones(Eb, bool))
    pert = jnp.asarray(
        rng.normal(0, 0.01, (C, 6)).astype(np.float32)).at[0].set(0.0)
    Rp, tp = jax.vmap(lie.se3_update_left)(cam_R, cam_t, pert)
    fixed = jnp.zeros(C, bool).at[0].set(True)
    Pall = pts.shape[0]
    res = ba_large.bundle_adjust_large(
        Rp, tp, fixed, jnp.ones(C, bool),
        pts + jnp.asarray(rng.normal(0, 0.03, (Pall, 3)).astype(np.float32)),
        jnp.ones(Pall, bool),
        None, stereo, bird, FX, FY, CX, CY, bf=BF)
    for c in range(1, C):
        err_t = np.linalg.norm(np.asarray(res.cam_t[c] - cam_t[c]))
        assert err_t < 2e-2, (c, err_t)
    berr = np.linalg.norm(np.asarray(res.points[P:]) - Xb, axis=1)
    assert np.median(berr) < 2e-2


def test_inv6x6():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(8, 6, 6)).astype(np.float32)
    A = A @ np.transpose(A, (0, 2, 1)) + 6 * np.eye(6, dtype=np.float32)
    Ainv = np.asarray(ba_large._inv6x6(jnp.asarray(A)))
    np.testing.assert_allclose(Ainv @ A, np.broadcast_to(np.eye(6), (8, 6, 6)),
                               atol=2e-3)
