"""Distributed BA on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8). The same code path runs on a real
TPU slice."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_birdview_tpu.core import lie
from orbslam_birdview_tpu.graph.ba import EdgeSet
from orbslam_birdview_tpu.parallel import sharded_ba

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def build_problem(rng, n_dev, pts_per_dev=64, n_cams=4):
    """Each shard owns a block of points; every camera observes every
    point; edges are grouped by shard with LOCAL point indices."""
    P_total = n_dev * pts_per_dev
    X = np.stack([
        rng.uniform(-5, 5, P_total), rng.uniform(-4, 4, P_total),
        rng.uniform(6, 14, P_total)], 1).astype(np.float32)
    cams = []
    for c in range(n_cams):
        xi = np.array([0.4 * c, 0.0, 0.02 * c, 0.0, -0.01 * c, 0.0], np.float32)
        cams.append(lie.se3_exp(jnp.asarray(xi)))
    cam_R = jnp.stack([c[0] for c in cams])
    cam_t = jnp.stack([c[1] for c in cams])
    e_cam, e_pt, e_obs = [], [], []
    for shard in range(n_dev):
        for c in range(n_cams):
            for p_local in range(pts_per_dev):
                p_global = shard * pts_per_dev + p_local
                Xc = np.asarray(cam_R[c]) @ X[p_global] + np.asarray(cam_t[c])
                uv = [FX * Xc[0] / Xc[2] + CX, FY * Xc[1] / Xc[2] + CY]
                e_cam.append(c)
                e_pt.append(p_local)  # LOCAL index within shard
                e_obs.append([uv[0] + rng.normal(0, 0.3),
                              uv[1] + rng.normal(0, 0.3)])
    E = len(e_cam)
    edges = EdgeSet(
        jnp.asarray(np.array(e_cam, np.int32)),
        jnp.asarray(np.array(e_pt, np.int32)),
        jnp.asarray(np.array(e_obs, np.float32)),
        jnp.ones(E, jnp.float32),
        jnp.ones(E, bool),
    )
    return cam_R, cam_t, jnp.asarray(X), edges


def test_sharded_ba_converges(rng):
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected virtual 8-device mesh, got {n_dev}"
    mesh = sharded_ba.make_mesh()
    cam_R, cam_t, X_gt, edges = build_problem(rng, n_dev)
    C = cam_R.shape[0]
    pert = jnp.asarray(rng.normal(0, 0.02, (C, 6)).astype(np.float32))
    pert = pert.at[:2].set(0.0)
    Rp, tp = jax.vmap(lie.se3_update_left)(cam_R, cam_t, pert)
    Xp = X_gt + jnp.asarray(rng.normal(0, 0.05, X_gt.shape).astype(np.float32))
    fixed = jnp.zeros(C, bool).at[0].set(True).at[1].set(True)
    prob = sharded_ba.shard_problem(
        mesh, Rp, tp, fixed, Xp, jnp.ones(X_gt.shape[0], bool), edges)
    R_out, t_out, X_out, cost = sharded_ba.sharded_bundle_adjust(
        mesh, prob, FX, FY, CX, CY, n_iters=12)
    for c in range(2, C):
        err_t = np.linalg.norm(np.asarray(t_out[c] - cam_t[c]))
        assert err_t < 1e-2, (c, err_t)
    perr = np.linalg.norm(np.asarray(X_out) - np.asarray(X_gt), axis=1)
    assert np.median(perr) < 0.05, np.median(perr)
    # residual at noise level: 0.3 px noise → mean chi2 ≈ 2*0.09
    E = edges.cam.shape[0]
    assert float(cost) / E < 0.5


def test_sharded_matches_single_device(rng):
    """The sharded result must agree with a single-shard run (same math,
    different partitioning)."""
    mesh = sharded_ba.make_mesh()
    cam_R, cam_t, X_gt, edges = build_problem(rng, len(jax.devices()),
                                              pts_per_dev=32)
    C = cam_R.shape[0]
    pert = jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))
    pert = pert.at[:2].set(0.0)
    Rp, tp = jax.vmap(lie.se3_update_left)(cam_R, cam_t, pert)
    fixed = jnp.zeros(C, bool).at[0].set(True).at[1].set(True)
    prob = sharded_ba.shard_problem(
        mesh, Rp, tp, fixed, X_gt, jnp.ones(X_gt.shape[0], bool), edges)
    R8, t8, X8, c8 = sharded_ba.sharded_bundle_adjust(
        mesh, prob, FX, FY, CX, CY, n_iters=6)

    mesh1 = sharded_ba.make_mesh(jax.devices()[:1])
    # single-device: edge pt indices must be global — rebuild
    n_dev = len(jax.devices())
    pts_per_dev = X_gt.shape[0] // n_dev
    shard_of_edge = np.repeat(np.arange(n_dev), edges.cam.shape[0] // n_dev)
    ept_global = np.asarray(edges.pt) + shard_of_edge * pts_per_dev
    edges1 = edges._replace(pt=jnp.asarray(ept_global.astype(np.int32)))
    prob1 = sharded_ba.shard_problem(
        mesh1, Rp, tp, fixed, X_gt, jnp.ones(X_gt.shape[0], bool), edges1)
    R1, t1, X1, c1 = sharded_ba.sharded_bundle_adjust(
        mesh1, prob1, FX, FY, CX, CY, n_iters=6)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1), atol=1e-3)
    np.testing.assert_allclose(float(c8), float(c1), rtol=1e-2)


def test_sharded_implicit_matches_dense_sharded(rng):
    """Matrix-free sharded BA (implicit Schur + PCG, one (C,6) psum per CG
    matvec) reaches the same optimum as the dense-S sharded path."""
    mesh = sharded_ba.make_mesh()
    cam_R, cam_t, X_gt, edges = build_problem(rng, len(jax.devices()),
                                              pts_per_dev=32)
    C = cam_R.shape[0]
    pert = jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))
    pert = pert.at[:2].set(0.0)
    Rp, tp = jax.vmap(lie.se3_update_left)(cam_R, cam_t, pert)
    fixed = jnp.zeros(C, bool).at[0].set(True).at[1].set(True)
    prob = sharded_ba.shard_problem(
        mesh, Rp, tp, fixed, X_gt, jnp.ones(X_gt.shape[0], bool), edges)
    Rd, td, Xd, cd = sharded_ba.sharded_bundle_adjust(
        mesh, prob, FX, FY, CX, CY, n_iters=8)
    Ri, ti, Xi, ci = sharded_ba.sharded_bundle_adjust_large(
        mesh, prob, FX, FY, CX, CY, n_iters=8)
    np.testing.assert_allclose(np.asarray(ti), np.asarray(td), atol=2e-3)
    perr = np.linalg.norm(np.asarray(Xi) - np.asarray(Xd), axis=1)
    assert np.median(perr) < 2e-3
    assert float(ci) < 1.05 * float(cd) + 1e-3


def build_full_problem(rng, n_cams=6, n_pts=256):
    """Global-index problem with mono + stereo + bird edges (numpy)."""
    from orbslam_birdview_tpu.graph import ba

    BF = 40.0
    X = np.stack([
        rng.uniform(-5, 5, n_pts), rng.uniform(-4, 4, n_pts),
        rng.uniform(6, 14, n_pts)], 1).astype(np.float32)
    cams = []
    for c in range(n_cams):
        xi = np.array([0.3 * c, 0.0, 0.02 * c, 0.0, -0.008 * c, 0.0],
                      np.float32)
        cams.append(lie.se3_exp(jnp.asarray(xi)))
    cam_R = np.stack([np.asarray(c[0]) for c in cams])
    cam_t = np.stack([np.asarray(c[1]) for c in cams])

    def obs_of(c, p):
        Xc = cam_R[c] @ X[p] + cam_t[c]
        return (FX * Xc[0] / Xc[2] + CX, FY * Xc[1] / Xc[2] + CY, Xc)

    m_cam, m_pt, m_obs = [], [], []
    s_cam, s_pt, s_obs = [], [], []
    b_cam, b_pt, b_obs = [], [], []
    for p in range(n_pts):
        for c in range(n_cams):
            u, v, Xc = obs_of(c, p)
            kind = (p + c) % 3
            if kind == 0:
                m_cam.append(c); m_pt.append(p)
                m_obs.append([u + rng.normal(0, 0.3),
                              v + rng.normal(0, 0.3)])
            elif kind == 1:
                s_cam.append(c); s_pt.append(p)
                s_obs.append([u + rng.normal(0, 0.3),
                              v + rng.normal(0, 0.3),
                              u - BF / Xc[2] + rng.normal(0, 0.3)])
            else:
                b_cam.append(c); b_pt.append(p)
                b_obs.append(Xc + rng.normal(0, 0.01, 3))

    def mk(cs, ps, obs):
        E = len(cs)
        return ba.EdgeSet(
            jnp.asarray(np.array(cs, np.int32)),
            jnp.asarray(np.array(ps, np.int32)),
            jnp.asarray(np.array(obs, np.float32)),
            jnp.ones(E, jnp.float32), jnp.ones(E, bool))

    return (cam_R, cam_t, X, mk(m_cam, m_pt, m_obs),
            mk(s_cam, s_pt, s_obs), mk(b_cam, b_pt, b_obs), BF)


def test_sharded_global_ba_all_edge_types(rng):
    """Distributed full-protocol GBA with mono+stereo+bird edges matches the
    single-device dense-Schur solver (VERDICT r1 items 4 & 9)."""
    from orbslam_birdview_tpu.graph import ba

    cam_R, cam_t, X_gt, mono, stereo, bird, BF = build_full_problem(rng)
    C = cam_R.shape[0]
    n_pts = X_gt.shape[0]
    pert = rng.normal(0, 0.01, (C, 6)).astype(np.float32)
    pert[0] = 0.0
    Rp, tp = jax.vmap(lie.se3_update_left)(
        jnp.asarray(cam_R), jnp.asarray(cam_t), jnp.asarray(pert))
    Xp = X_gt + rng.normal(0, 0.05, X_gt.shape).astype(np.float32)
    fixed = np.zeros(C, bool)
    fixed[0] = True
    valid = np.ones(C, bool)

    # single-device reference
    res = ba.bundle_adjust(
        Rp, tp, jnp.asarray(fixed), jnp.asarray(valid), jnp.asarray(Xp),
        jnp.ones(n_pts, bool), mono, stereo, bird,
        FX, FY, CX, CY, bf=BF, iters_phase1=5, iters_phase2=8)

    # sharded
    n_dev = len(jax.devices())
    mesh = sharded_ba.make_mesh()
    pts_p, ptv_p, part, P_pad = sharded_ba.partition_gba_problem(
        n_dev, Xp, np.ones(n_pts, bool),
        [("mono", mono), ("stereo", stereo), ("bird", bird)])
    (cR, ct, cf, cv, pts_d, ptv_d, edges) = sharded_ba.place_gba_problem(
        mesh, Rp, tp, fixed, valid, pts_p, ptv_p, part)
    R_s, t_s, X_s, masks, cost = sharded_ba.sharded_global_ba(
        mesh, cR, ct, cf, cv, pts_d, ptv_d,
        edges["mono"][0], edges["stereo"][0], edges["bird"][0],
        FX, FY, CX, CY, bf=BF, iters_phase1=5, iters_phase2=8)

    np.testing.assert_allclose(np.asarray(t_s), np.asarray(res.cam_t),
                               atol=2e-3)
    # compare point estimates through the partition permutation: shard
    # order back to global order via the points padding layout
    per = P_pad // n_dev
    Xs = np.asarray(X_s)[:n_pts]
    perr = np.linalg.norm(Xs - np.asarray(res.points)[:n_pts], axis=1)
    assert np.median(perr) < 2e-3, np.median(perr)
    # inlier masks: everything is an inlier in this clean problem
    mono_perm = part["mono"][1]
    m_back = np.zeros(mono.cam.shape[0], bool)
    mm = np.asarray(masks["mono"])
    m_back[mono_perm[mono_perm >= 0]] = mm[mono_perm >= 0]
    assert m_back.mean() > 0.95


def test_sharded_pose_graph_matches_single_device(rng):
    """Sharded Sim3 essential graph == single-device optimizer on the same
    drifted-loop problem (up to float reduction order)."""
    from orbslam_birdview_tpu.graph import pose_graph
    from orbslam_birdview_tpu.parallel import sharded_pose_graph as spg

    K = 16
    gt = []
    for k in range(K):
        th = 2 * np.pi * k / K
        Rk = np.asarray(lie.so3_exp(jnp.asarray([0, 0, th], dtype=jnp.float32)))
        pk = np.array([np.cos(th), np.sin(th), 0.0], np.float32) * 4
        gt.append((Rk.T, -Rk.T @ pk))
    est_R, est_t = [gt[0][0]], [gt[0][1]]
    for k in range(1, K):
        Rp, tp = gt[k - 1]
        Rk, tk = gt[k]
        Rr = Rk @ Rp.T
        tr = (tk - Rr @ tp) * (1.02 ** k) + rng.normal(0, 0.01, 3).astype(np.float32)
        est_R.append(Rr @ est_R[-1])
        est_t.append(Rr @ est_t[-1] + tr)
    est_R = jnp.asarray(np.stack(est_R))
    est_t = jnp.asarray(np.stack(est_t))
    est_s = jnp.ones(K)

    e_i, e_j, mR, mt, ms = [], [], [], [], []
    for k in range(1, K):
        Ri, ti = np.asarray(est_R[k - 1]), np.asarray(est_t[k - 1])
        Rj, tj = np.asarray(est_R[k]), np.asarray(est_t[k])
        Rr = Rj @ Ri.T
        e_i.append(k - 1); e_j.append(k)
        mR.append(Rr); mt.append(tj - Rr @ ti); ms.append(1.0)
    R0, t0 = gt[0]
    R1, t1 = gt[K - 1]
    Rr = R0 @ R1.T
    e_i.append(K - 1); e_j.append(0)
    mR.append(Rr); mt.append(t0 - Rr @ t1); ms.append(1.0)
    E = len(e_i)
    fixed = jnp.zeros(K, bool).at[0].set(True)
    args = (jnp.asarray(np.array(e_i, np.int32)),
            jnp.asarray(np.array(e_j, np.int32)),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(np.array(ms, np.float32)),
            jnp.ones(E), jnp.ones(E, bool))

    R_ref, t_ref, s_ref, cost_ref = pose_graph.optimize_sim3_graph(
        est_R, est_t, est_s, fixed, *args, n_iters=15)

    mesh = sharded_ba.make_mesh()
    sharded = spg.shard_edges(mesh, np.array(e_i, np.int32),
                              np.array(e_j, np.int32), np.stack(mR),
                              np.stack(mt), np.array(ms, np.float32),
                              np.ones(E, np.float32), np.ones(E, bool))
    R_sh, t_sh, s_sh, cost_sh = spg.sharded_optimize_sim3_graph(
        mesh, est_R, est_t, est_s, fixed, *sharded, n_iters=15)

    assert np.isfinite(float(cost_sh))
    np.testing.assert_allclose(np.asarray(R_sh), np.asarray(R_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_ref),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               atol=5e-4)
