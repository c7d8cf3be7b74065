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

        def cg_step(carry, _):
            x, rcg, p, rz = carry
            Hp = Hmul(p)
            denom = jnp.sum(p * Hp)
            alpha = jnp.where(denom > 1e-20, rz / denom, 0.0)
            x = x + alpha * p
            rcg = rcg - alpha * Hp
            z = Dinv_mul(rcg) * free_v
            rz_new = jnp.sum(rcg * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, rcg, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(cg_step, (x, rcg, p, rz), None,
                                       length=cg_iters)
        dx = x
        Rn, tn, sn = jax.vmap(sim3_update_left)(R, t, s, dx)
        _, _, _, _, cost1 = assemble(Rn, tn, sn)
        ok = (cost1 < cost0) & jnp.isfinite(cost1)
        R = jnp.where(ok, Rn, R)
        t = jnp.where(ok, tn, t)
        s = jnp.where(ok, sn, s)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (R, t, s, lam), cost1

    (R, t, s, _), costs = jax.lax.scan(
        body, (R, t, s, jnp.asarray(1e-6, dtype)), None, length=n_iters)
    return R, t, s, costs[-1]
