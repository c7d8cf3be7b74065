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
