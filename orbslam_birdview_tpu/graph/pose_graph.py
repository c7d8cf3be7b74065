"""Sim3 pose-graph (essential graph) optimization.

Re-designs `Optimizer::OptimizeEssentialGraph` (`/root/reference/src/
Optimizer.cc:781-1044`, g2o BlockSolver_7_3 + EdgeSim3) as a dense batched
Gauss-Newton: edge residuals/Jacobians come from autodiff over the Sim3
left-tangent (7-dim), the Hessian is assembled by block scatter into a
(7K × 7K) dense system (a few MB at SLAM keyframe counts) and solved on the
MXU. Vertices: Sim3 world→kf; fixed mask anchors the loop keyframe.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from . import residuals


def sim3_update_left(R, t, s, xi):
    dR, dt, ds = lie.sim3_exp(xi)
    return lie.sim3_mul(dR, dt, ds, R, t, s)


def gauge_normalize(R, t, s, target_rms: float = 3.0):
    """World-frame gauge change that centers camera positions at the origin
    and scales their RMS radius to `target_rms`.

    Sim3 relative measurements S_ji = S_j∘S_i⁻¹ are INVARIANT under
    right-composition with any world similarity G: (S_j∘G)(S_i∘G)⁻¹ =
    S_j∘S_i⁻¹ — so the solve can run in a normalized gauge and the result
    maps back exactly. This matters in f32: at KITTI-scale translations
    (|t| ~ 50-200 m) the Gauss-Newton system's translation blocks carry
    |J| ~ |t|, conditioning the CG system beyond f32 (measured: every LM
    step rejected at K=1024, orbit radius 50). g2o runs in f64 and never
    sees this; the TPU-native fix is to normalize the gauge instead.

    Returns (t', s', unnormalize) where unnormalize(R_o, t_o, s_o) maps a
    solution in the normalized gauge back to the input gauge."""
    # camera centers p = -R^T t / s
    p = -jnp.einsum("kji,kj->ki", R, t) / s[:, None]
    tg = jnp.mean(p, axis=0)
    rms = jnp.sqrt(jnp.mean(jnp.sum((p - tg) ** 2, -1)) + 1e-12)
    sg = jnp.maximum(rms / target_rms, 1e-6)
    # S' = S ∘ G with G = (I, tg, sg):  t' = s·R·tg + t,  s' = s·sg
    t_n = s[:, None] * jnp.einsum("kij,j->ki", R, tg) + t
    s_n = s * sg

    def unnormalize(R_o, t_o, s_o):
        s_back = s_o / sg
        t_back = t_o - s_back[:, None] * jnp.einsum("kij,j->ki", R_o, tg)
        return R_o, t_back, s_back

    return t_n, s_n, unnormalize


@functools.partial(jax.jit, static_argnames=("n_iters",))
@linalg.f32_matmul
def optimize_sim3_graph(
    R, t, s,            # (K,3,3), (K,3), (K,) vertex Sim3 (world→kf)
    fixed,              # (K,) bool
    e_i, e_j,           # (E,) int32 vertex ids: measurement maps i→j
    mR, mt, ms,         # (E,…) measured relative Sim3 S_ji
    e_w, e_valid,       # (E,) weight, validity
    n_iters: int = 20,
):
    K = R.shape[0]
    E = e_i.shape[0]
    dtype = R.dtype
    t, s, ungauge = gauge_normalize(R, t, s)

    def edge_res(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
        Ri2, ti2, si2 = sim3_update_left(Ri, ti, si, xi_i)
        Rj2, tj2, sj2 = sim3_update_left(Rj, tj, sj, xi_j)
        return residuals.sim3_relative(Ri2, ti2, si2, Rj2, tj2, sj2,
                                       Rm, tm, sm)

    zeros7 = jnp.zeros(7, dtype)

    def edge_terms(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
        r = edge_res(zeros7, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
        Ji = jax.jacrev(edge_res, argnums=0)(
            zeros7, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
        Jj = jax.jacrev(edge_res, argnums=1)(
            zeros7, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
        return r, Ji, Jj

    def assemble(R, t, s):
        def per_edge(i, j, Rm_e, tm_e, sm_e):
            return edge_terms(R[i], t[i], s[i], R[j], t[j], s[j],
                              Rm_e, tm_e, sm_e)
        r, Ji, Jj = jax.vmap(per_edge)(e_i, e_j, mR, mt, ms)
        w = e_w * e_valid.astype(dtype)
        cost = jnp.sum(jnp.sum(r * r, -1) * w)
        H = jnp.zeros((K, 7, K, 7), dtype)
        b = jnp.zeros((K, 7), dtype)
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        H = H.at[e_i, :, e_i, :].add(jnp.einsum("eri,erj->eij", JiW, Ji))
        H = H.at[e_j, :, e_j, :].add(jnp.einsum("eri,erj->eij", JjW, Jj))
        H = H.at[e_i, :, e_j, :].add(jnp.einsum("eri,erj->eij", JiW, Jj))
        H = H.at[e_j, :, e_i, :].add(jnp.einsum("eri,erj->eij", JjW, Ji))
        b = b.at[e_i].add(jnp.einsum("eri,er->ei", JiW, r))
        b = b.at[e_j].add(jnp.einsum("eri,er->ei", JjW, r))
        return H.reshape(7 * K, 7 * K), b.reshape(-1), cost

    free = jnp.repeat(~fixed, 7)

    def body(carry, _):
        R, t, s, lam = carry
        H, b, cost0 = assemble(R, t, s)
        Hd = H + lam * jnp.eye(7 * K, dtype=dtype)
        Hd = jnp.where(free[:, None] & free[None, :], Hd, 0.0)
        Hd = Hd + jnp.diag(jnp.where(free, 0.0, 1.0))
        b = jnp.where(free, b, 0.0)
        dx = -jnp.linalg.solve(Hd, b).reshape(K, 7)
        Rn, tn, sn = jax.vmap(sim3_update_left)(R, t, s, dx)
        _, _, cost1 = assemble(Rn, tn, sn)
        ok = (cost1 < cost0) & jnp.isfinite(cost1)
        R = jnp.where(ok, Rn, R)
        t = jnp.where(ok, tn, t)
        s = jnp.where(ok, sn, s)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (R, t, s, lam), cost1

    (R, t, s, _), costs = jax.lax.scan(
        body, (R, t, s, jnp.asarray(1e-6, dtype)), None, length=n_iters)
    R, t, s = ungauge(R, t, s)
    return R, t, s, costs[-1]


@functools.partial(jax.jit, static_argnames=("n_iters", "cg_iters"))
@linalg.f32_matmul
def optimize_sim3_graph_pcg(
    R, t, s, fixed, e_i, e_j, mR, mt, ms, e_w, e_valid,
    n_iters: int = 20, cg_iters: int = 60,
):
    """Matrix-free variant of `optimize_sim3_graph` for LARGE graphs.

    The dense path materializes the (7K x 7K) normal equations and
    Cholesky-solves them — 200 MB and ~30 s on host at K=1024 (measured,
    tools/time_loop_correction.py), which is the wrong shape for a sparse
    pose graph (band + a few loop edges). Here the Gauss-Newton system is
    solved by preconditioned CG where H·v is computed edge-wise
    (gather → 7x7 block products → scatter-add) and the preconditioner is
    the block-Jacobi diagonal — O(E·49) per CG step, no K² anything.
    Same edge residuals/Jacobians as the dense path; converges to the
    same solution on the graphs SLAM produces (chain + loop closures).
    """
    K = R.shape[0]
    dtype = R.dtype
    t, s, ungauge = gauge_normalize(R, t, s)

    def edge_res(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
        Ri2, ti2, si2 = sim3_update_left(Ri, ti, si, xi_i)
        Rj2, tj2, sj2 = sim3_update_left(Rj, tj, sj, xi_j)
        return residuals.sim3_relative(Ri2, ti2, si2, Rj2, tj2, sj2,
                                       Rm, tm, sm)

    zeros7 = jnp.zeros(7, dtype)

    def edge_terms(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
        r = edge_res(zeros7, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
        Ji = jax.jacrev(edge_res, argnums=0)(
            zeros7, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
        Jj = jax.jacrev(edge_res, argnums=1)(
            zeros7, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
        return r, Ji, Jj

    free_v = (~fixed).astype(dtype)[:, None]          # (K,1)

    def assemble(R, t, s):
        def per_edge(i, j, Rm_e, tm_e, sm_e):
            return edge_terms(R[i], t[i], s[i], R[j], t[j], s[j],
                              Rm_e, tm_e, sm_e)
        r, Ji, Jj = jax.vmap(per_edge)(e_i, e_j, mR, mt, ms)
        w = e_w * e_valid.astype(dtype)
        cost = jnp.sum(jnp.sum(r * r, -1) * w)
        return r, Ji, Jj, w, cost

    def cost_only(R, t, s):
        def per_edge(i, j, Rm_e, tm_e, sm_e):
            return edge_res(zeros7, zeros7, R[i], t[i], s[i],
                            R[j], t[j], s[j], Rm_e, tm_e, sm_e)
        r = jax.vmap(per_edge)(e_i, e_j, mR, mt, ms)
        w = e_w * e_valid.astype(dtype)
        return jnp.sum(jnp.sum(r * r, -1) * w)

    def body(carry, _):
        R, t, s, lam = carry
        r, Ji, Jj, w, cost0 = assemble(R, t, s)
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        b = jnp.zeros((K, 7), dtype)
        b = b.at[e_i].add(jnp.einsum("eri,er->ei", JiW, r))
        b = b.at[e_j].add(jnp.einsum("eri,er->ei", JjW, r))
        b = -b * free_v
        # block-Jacobi preconditioner (+ Marquardt damping on the diag)
        D = jnp.zeros((K, 7, 7), dtype)
        Hii = jnp.einsum("eri,erj->eij", JiW, Ji)
        Hjj = jnp.einsum("eri,erj->eij", JjW, Jj)
        D = D.at[e_i].add(Hii).at[e_j].add(Hjj)
        dd = jnp.diagonal(D, axis1=-2, axis2=-1)
        D = D + jax.vmap(jnp.diag)(lam * dd + 1e-8)
        Dinv_mul = lambda v: linalg.solve_psd_small(D, v)

        def Hmul(v):
            vi = v[e_i]
            vj = v[e_j]
            u = (jnp.einsum("erc,ec->er", Ji, vi)
                 + jnp.einsum("erc,ec->er", Jj, vj))
            y = jnp.zeros((K, 7), dtype)
            y = y.at[e_i].add(jnp.einsum("erc,er->ec", JiW, u))
            y = y.at[e_j].add(jnp.einsum("erc,er->ec", JjW, u))
            y = y + lam * dd * v          # Marquardt damping
            return y * free_v

        # PCG
        x = jnp.zeros((K, 7), dtype)
        rcg = b
        z = Dinv_mul(rcg) * free_v
        p = z
        rz = jnp.sum(rcg * z)

        # f32 CG on a long-chain graph loses conjugacy after ~O(100)
        # iterations and the iterate can blow up — keep the BEST-residual
        # iterate seen, not the last (measured: at K=1024 the final
        # iterate made every LM step rejectable; the best iterate
        # converges)
        def cg_step(carry, _):
            x, rcg, p, rz, x_best, rn_best = carry
            Hp = Hmul(p)
            denom = jnp.sum(p * Hp)
            alpha = jnp.where(denom > 1e-20, rz / denom, 0.0)
            x = x + alpha * p
            rcg = rcg - alpha * Hp
            rn = jnp.sum(rcg * rcg)
            better = rn < rn_best
            x_best = jnp.where(better, x, x_best)
            rn_best = jnp.where(better, rn, rn_best)
            z = Dinv_mul(rcg) * free_v
            rz_new = jnp.sum(rcg * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, rcg, p, rz_new, x_best, rn_best), None

        (_, _, _, _, dx, _), _ = jax.lax.scan(
            cg_step, (x, rcg, p, rz, x, jnp.sum(b * b)), None,
            length=cg_iters)

        # multi-scale trial: the truncated-CG direction can overshoot the
        # quadratic model's validity region; try dx at 1, 1/2, 1/4, 1/8
        # and keep the best cost (a fixed-shape backtracking line search)
        def try_scale(sc):
            Rn, tn, sn = jax.vmap(sim3_update_left)(R, t, s, sc * dx)
            return cost_only(Rn, tn, sn)

        scales = jnp.asarray([1.0, 0.5, 0.25, 0.125], dtype)
        trial_costs = jax.vmap(try_scale)(scales)
        trial_costs = jnp.where(jnp.isfinite(trial_costs), trial_costs,
                                jnp.inf)
        k_best = jnp.argmin(trial_costs)
        cost1 = trial_costs[k_best]
        Rn, tn, sn = jax.vmap(sim3_update_left)(R, t, s,
                                                scales[k_best] * dx)
        ok = (cost1 < cost0) & jnp.isfinite(cost1)
        R = jnp.where(ok, Rn, R)
        t = jnp.where(ok, tn, t)
        s = jnp.where(ok, sn, s)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (R, t, s, lam), jnp.where(ok, cost1, cost0)

    (R, t, s, _), costs = jax.lax.scan(
        body, (R, t, s, jnp.asarray(1e-6, dtype)), None, length=n_iters)
    R, t, s = ungauge(R, t, s)
    return R, t, s, costs[-1]


@functools.partial(jax.jit, static_argnames=("g", "n_iters"))
@linalg.f32_matmul
def optimize_sim3_graph_banded(
    R, t, s, fixed,
    b_i, b_j, b_mR, b_mt, b_ms, b_w, b_valid,
    l_i, l_j, l_mR, l_mt, l_ms, l_w, l_valid,
    g: int = 8, n_iters: int = 15,
):
    """EXACT O(K) essential-graph solver for large graphs.

    A SLAM essential graph is a temporal chain (spanning tree + strong
    covisibility, |i-j| small) plus a handful of long-range loop edges.
    g2o exploits that with sparse Cholesky; the TPU-native equivalent
    here groups `g` consecutive vertices into supernodes of size G=7g, so
    in-band edges (j-i <= g) make the Gauss-Newton system BLOCK
    TRIDIAGONAL over M=K/g supernodes — solved exactly by a block-Thomas
    `lax.scan` (M sequential (G,G) solves, O(K·G²) total). The few
    long-range edges enter as a PSD low-rank term U·Uᵀ (rank 7 per edge,
    U = √w·[Ji;Jj]ᵀ scattered to rows i,j) handled by the Woodbury
    identity — one extra multi-RHS Thomas pass + a small dense solve.

    Unlike the truncated-PCG path this takes EXACT Newton steps: on a
    K=1024 single-seam drift ring (the hardest case — condition ~K²)
    PCG stalls at any f32-feasible iteration budget while this converges
    in a few LM iterations (tests/test_graph.py).

    Caller contract: vertices are time-ordered (SLAM keyframe slots), K
    is a multiple of g; band edges satisfy 1 <= j-i <= g; long edges are
    everything else (padded with l_valid=False). Same vertex/measurement
    conventions as `optimize_sim3_graph`; `Optimizer::OptimizeEssentialGraph`
    semantics (/root/reference/src/Optimizer.cc:781-1044).
    """
    K = R.shape[0]
    dtype = R.dtype
    G = 7 * g
    M = K // g
    m_cols = 7 * l_i.shape[0]
    t, s, ungauge = gauge_normalize(R, t, s)

    def edge_res(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
        Ri2, ti2, si2 = sim3_update_left(Ri, ti, si, xi_i)
        Rj2, tj2, sj2 = sim3_update_left(Rj, tj, sj, xi_j)
        return residuals.sim3_relative(Ri2, ti2, si2, Rj2, tj2, sj2,
                                       Rm, tm, sm)

    zeros7 = jnp.zeros(7, dtype)

    def edge_terms(R, t, s, ei, ej, mR, mt, ms):
        def per_edge(i, j, Rm_e, tm_e, sm_e):
            args = (R[i], t[i], s[i], R[j], t[j], s[j], Rm_e, tm_e, sm_e)
            r = edge_res(zeros7, zeros7, *args)
            Ji = jax.jacrev(edge_res, argnums=0)(zeros7, zeros7, *args)
            Jj = jax.jacrev(edge_res, argnums=1)(zeros7, zeros7, *args)
            return r, Ji, Jj
        return jax.vmap(per_edge)(ei, ej, mR, mt, ms)

    free = (~fixed).astype(dtype)

    def cost_of(R, t, s):
        def res_group(ei, ej, mR, mt, ms, w, valid):
            def per_edge(i, j, Rm_e, tm_e, sm_e):
                return edge_res(zeros7, zeros7, R[i], t[i], s[i],
                                R[j], t[j], s[j], Rm_e, tm_e, sm_e)
            r = jax.vmap(per_edge)(ei, ej, mR, mt, ms)
            return jnp.sum(jnp.sum(r * r, -1) * (w * valid.astype(dtype)))
        return (res_group(b_i, b_j, b_mR, b_mt, b_ms, b_w, b_valid)
                + res_group(l_i, l_j, l_mR, l_mt, l_ms, l_w, l_valid))

    rows7 = jnp.arange(7)

    def scat_block(tgt, sn, ro, co, vals, mask):
        E = sn.shape[0]
        r = ro[:, None, None] + rows7[None, :, None]
        c = co[:, None, None] + rows7[None, None, :]
        snb = jnp.broadcast_to(sn[:, None, None], (E, 7, 7))
        return tgt.at[snb, r, c].add(
            jnp.where(mask[:, None, None], vals, 0.0))

    def body(carry, _):
        R, t, s, lam = carry
        rb, Jib, Jjb = edge_terms(R, t, s, b_i, b_j, b_mR, b_mt, b_ms)
        rl, Jil, Jjl = edge_terms(R, t, s, l_i, l_j, l_mR, l_mt, l_ms)
        wb = b_w * b_valid.astype(dtype)
        wl = l_w * l_valid.astype(dtype)
        cost0 = (jnp.sum(jnp.sum(rb * rb, -1) * wb)
                 + jnp.sum(jnp.sum(rl * rl, -1) * wl))
        # gauge-fix by zeroing fixed vertices' Jacobian columns
        Jib_f = Jib * free[b_i][:, None, None]
        Jjb_f = Jjb * free[b_j][:, None, None]
        Jil_f = Jil * free[l_i][:, None, None]
        Jjl_f = Jjl * free[l_j][:, None, None]

        # ---- rhs b = -Jᵀ W r over ALL edges ------------------------------
        bvec = jnp.zeros((K, 7), dtype)
        bvec = bvec.at[b_i].add(jnp.einsum(
            "eri,er->ei", Jib_f * wb[:, None, None], rb))
        bvec = bvec.at[b_j].add(jnp.einsum(
            "eri,er->ei", Jjb_f * wb[:, None, None], rb))
        bvec = bvec.at[l_i].add(jnp.einsum(
            "eri,er->ei", Jil_f * wl[:, None, None], rl))
        bvec = bvec.at[l_j].add(jnp.einsum(
            "eri,er->ei", Jjl_f * wl[:, None, None], rl))
        bvec = -bvec

        # ---- block-tridiagonal A from band edges -------------------------
        a_sn = b_i // g
        bsn = b_j // g
        oi = (b_i % g) * 7
        oj = (b_j % g) * 7
        same = (a_sn == bsn) & b_valid
        adj = (bsn == a_sn + 1) & b_valid
        JiW = Jib_f * wb[:, None, None]
        Bii = jnp.einsum("eri,erj->eij", JiW, Jib_f)
        Bjj = jnp.einsum("eri,erj->eij",
                         Jjb_f * wb[:, None, None], Jjb_f)
        Bij = jnp.einsum("eri,erj->eij", JiW, Jjb_f)
        Adiag = jnp.zeros((M, G, G), dtype)
        Aoff = jnp.zeros((M, G, G), dtype)   # Aoff[i] = block (i, i+1)
        Adiag = scat_block(Adiag, a_sn, oi, oi, Bii, b_valid)
        Adiag = scat_block(Adiag, bsn, oj, oj, Bjj, b_valid)
        Adiag = scat_block(Adiag, a_sn, oi, oj, Bij, same)
        Adiag = scat_block(Adiag, a_sn, oj, oi,
                           jnp.swapaxes(Bij, -1, -2), same)
        Aoff = scat_block(Aoff, jnp.minimum(a_sn, M - 1), oi, oj, Bij, adj)

        # damping + fixed/padding identity on the diagonal
        dd = jnp.diagonal(Adiag, axis1=-2, axis2=-1)     # (M, G)
        fixed_diag = jnp.repeat(fixed.reshape(M, g), 7,
                                axis=1).astype(dtype)
        damp = lam * dd + 1e-7 + fixed_diag
        Adiag = Adiag + jax.vmap(jnp.diag)(damp)

        # ---- low-rank U for long-range edges -----------------------------
        # ΔH = U·Uᵀ with per-edge columns √w·[Ji;Jj]ᵀ at rows i,j
        Ecap = l_i.shape[0]
        sqw = jnp.sqrt(jnp.maximum(wl, 0.0))
        colb = jnp.arange(Ecap) * 7
        U = jnp.zeros((M, G, m_cols), dtype)

        def scat_u(U, vid, Jmat):
            sn = vid // g
            off = (vid % g) * 7
            r = off[:, None, None] + rows7[None, :, None]       # (E,7,7)
            c = colb[:, None, None] + rows7[None, None, :]
            snb = jnp.broadcast_to(sn[:, None, None], (Ecap, 7, 7))
            vals = jnp.swapaxes(Jmat, -1, -2) * sqw[:, None, None]
            return U.at[snb, r, c].add(vals)

        U = scat_u(U, l_i, Jil_f)
        U = scat_u(U, l_j, Jjl_f)

        # ---- block-Thomas forward/backward with multi-RHS ----------------
        rhs = jnp.concatenate([bvec.reshape(M, G, 1), U], axis=2)
        Rn_cols = rhs.shape[2]
        Aoff_prev = jnp.concatenate(
            [jnp.zeros((1, G, G), dtype), Aoff[:-1]], axis=0)

        def fwd(carry, inp):
            Gp, Yp = carry
            Ad, Aop, Ao, rh = inp
            Ci = Ad - jnp.swapaxes(Aop, -1, -2) @ Gp
            rhs_eff = rh - jnp.swapaxes(Aop, -1, -2) @ Yp
            sol = jnp.linalg.solve(Ci, jnp.concatenate([Ao, rhs_eff], 1))
            Gi = sol[:, :G]
            Yi = sol[:, G:]
            return (Gi, Yi), (Gi, Yi)

        (_, _), (Gs, Ys) = jax.lax.scan(
            fwd, (jnp.zeros((G, G), dtype),
                  jnp.zeros((G, Rn_cols), dtype)),
            (Adiag, Aoff_prev, Aoff, rhs))

        def bwd(x_next, inp):
            Gi, Yi = inp
            x = Yi - Gi @ x_next
            return x, x

        _, Xs = jax.lax.scan(bwd, jnp.zeros((G, Rn_cols), dtype),
                             (Gs, Ys), reverse=True)
        Ainv_b = Xs[:, :, 0]                         # (M, G)
        Ainv_U = Xs[:, :, 1:]                        # (M, G, m)
        # Woodbury: dx = A⁻¹b − A⁻¹U (I + UᵀA⁻¹U)⁻¹ Uᵀ A⁻¹ b
        UtAinvU = jnp.einsum("mgc,mgd->cd", U, Ainv_U)
        UtAinvB = jnp.einsum("mgc,mg->c", U, Ainv_b)
        cap = jnp.eye(m_cols, dtype=dtype) + UtAinvU
        y = jnp.linalg.solve(cap, UtAinvB)
        dx = (Ainv_b - jnp.einsum("mgc,c->mg", Ainv_U, y)).reshape(K, 7)
        dx = dx * free[:, None]

        # multi-scale trial (exact steps can still overshoot the
        # linearization on large seams)
        def try_scale(sc):
            Rn2, tn2, sn2 = jax.vmap(sim3_update_left)(R, t, s, sc * dx)
            return cost_of(Rn2, tn2, sn2)

        scales = jnp.asarray([1.0, 0.5, 0.25], dtype)
        trial = jax.vmap(try_scale)(scales)
        trial = jnp.where(jnp.isfinite(trial), trial, jnp.inf)
        kb = jnp.argmin(trial)
        cost1 = trial[kb]
        Rn, tn, sn = jax.vmap(sim3_update_left)(R, t, s, scales[kb] * dx)
        ok = (cost1 < cost0) & jnp.isfinite(cost1)
        R = jnp.where(ok, Rn, R)
        t = jnp.where(ok, tn, t)
        s = jnp.where(ok, sn, s)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (R, t, s, lam), jnp.where(ok, cost1, cost0)

    (R, t, s, _), costs = jax.lax.scan(
        body, (R, t, s, jnp.asarray(1e-6, dtype)), None, length=n_iters)
    R, t, s = ungauge(R, t, s)
    return R, t, s, costs[-1]
