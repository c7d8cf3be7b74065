"""Distributed Sim3 essential-graph optimization over a device mesh.

Pod-scale loop closure (SURVEY §2.3/§5): the essential graph's EDGES
(spanning tree + strong covisibility + loop edges) are sharded across
devices; the K Sim3 vertices are replicated. Each device assembles the
normal-equation contributions of its edge shard; H and b are summed over
ICI with `psum`; the dense (7K,7K) solve runs replicated on every device —
identical by construction, so no broadcast is needed afterwards.

Single-device semantics: `graph/pose_graph.optimize_sim3_graph`
(re-design of `Optimizer::OptimizeEssentialGraph`,
`/root/reference/src/Optimizer.cc:781-1044`). The sharded result equals the
single-device result up to float reduction order (tested on the virtual
8-device CPU mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import linalg
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import residuals
from ..graph.pose_graph import sim3_update_left

AXIS = "map"


def _edge_terms(R, t, s, e_i, e_j, mR, mt, ms, dtype):
    zeros7 = jnp.zeros(7, dtype)

    def edge_res(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
        Ri2, ti2, si2 = sim3_update_left(Ri, ti, si, xi_i)
        Rj2, tj2, sj2 = sim3_update_left(Rj, tj, sj, xi_j)
        return residuals.sim3_relative(Ri2, ti2, si2, Rj2, tj2, sj2,
                                       Rm, tm, sm)

    def per_edge(i, j, Rm_e, tm_e, sm_e):
        args = (R[i], t[i], s[i], R[j], t[j], s[j], Rm_e, tm_e, sm_e)
        r = edge_res(zeros7, zeros7, *args)
        Ji = jax.jacrev(edge_res, argnums=0)(zeros7, zeros7, *args)
        Jj = jax.jacrev(edge_res, argnums=1)(zeros7, zeros7, *args)
        return r, Ji, Jj

    return jax.vmap(per_edge)(e_i, e_j, mR, mt, ms)


def sharded_optimize_sim3_graph(
    mesh: Mesh,
    R, t, s,            # (K,3,3), (K,3), (K,) vertex Sim3 world→kf, replicated
    fixed,              # (K,) bool
    e_i, e_j,           # (E,) int32, sharded over the mesh axis
    mR, mt, ms,         # (E,…) measured relative Sim3 S_ji
    e_w, e_valid,       # (E,) weight, validity
    n_iters: int = 20,
):
    """Gauss-Newton over the Sim3 graph with edge shards reduced via psum.

    Edge arrays must be padded to a multiple of the mesh size; padding rows
    carry e_valid=False (their contributions are zeroed by weight)."""
    axis = mesh.axis_names[0]
    K = R.shape[0]
    dtype = R.dtype

    def run(R, t, s, fixed, e_i, e_j, mR, mt, ms, e_w, e_valid):
        free = jnp.repeat(~fixed, 7)

        def assemble(R, t, s):
            r, Ji, Jj = _edge_terms(R, t, s, e_i, e_j, mR, mt, ms, dtype)
            w = e_w * e_valid.astype(dtype)
            cost = jax.lax.psum(jnp.sum(jnp.sum(r * r, -1) * w), axis)
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
            # ICI reduction: every device gets the full graph system
            H = jax.lax.psum(H.reshape(7 * K, 7 * K), axis)
            b = jax.lax.psum(b.reshape(-1), axis)
            return H, b, cost

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

    from jax import shard_map

    rep = P()
    sh = P(axis)
    f = shard_map(
        run, mesh=mesh,
        in_specs=(rep, rep, rep, rep, sh, sh, sh, sh, sh, sh, sh),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(linalg.f32_matmul(f))(R, t, s, fixed, e_i, e_j, mR, mt, ms, e_w, e_valid)


def sharded_optimize_sim3_graph_pcg(
    mesh: Mesh,
    R, t, s,            # (K,3,3), (K,3), (K,) vertex Sim3 world→kf, replicated
    fixed,              # (K,) bool
    e_i, e_j,           # (E,) int32, sharded over the mesh axis
    mR, mt, ms,         # (E,…) measured relative Sim3 S_ji
    e_w, e_valid,       # (E,) weight, validity
    n_iters: int = 20,
    cg_iters: int = 60,
):
    """Matrix-free sharded variant for LARGE essential graphs (K >= ~256).

    The dense sharded path psum-reduces a full (7K,7K) H every GN
    iteration — 205 MB of ICI traffic per reduction at K=1024 and a
    replicated dense solve that measured ~30 s host-side. Here the edges
    stay sharded and ONLY (K,7) vectors cross the ICI: the Gauss-Newton
    system is solved by preconditioned CG where each H·v matvec is
    computed edge-wise on the local shard (gather → per-edge products →
    scatter-add) and psum-reduced; the block-Jacobi preconditioner (K,7,7)
    is reduced once per GN iteration. O(E/n_dev · 49) compute + one small
    psum per CG step — the same recipe as the single-device
    `graph/pose_graph.optimize_sim3_graph_pcg`, which this matches up to
    float reduction order (tests/test_parallel.py)."""
    axis = mesh.axis_names[0]
    K = R.shape[0]
    dtype = R.dtype

    def run(R, t, s, fixed, e_i, e_j, mR, mt, ms, e_w, e_valid):
        # normalized gauge (graph/pose_graph.gauge_normalize): vertices are
        # replicated, so the same deterministic normalization runs on every
        # device — no reduction needed
        from ..graph.pose_graph import gauge_normalize

        t, s, ungauge = gauge_normalize(R, t, s)
        free_v = (~fixed).astype(dtype)[:, None]          # (K,1)

        def assemble(R, t, s):
            r, Ji, Jj = _edge_terms(R, t, s, e_i, e_j, mR, mt, ms, dtype)
            w = e_w * e_valid.astype(dtype)
            cost = jax.lax.psum(jnp.sum(jnp.sum(r * r, -1) * w), axis)
            return r, Ji, Jj, w, cost

        zeros7 = jnp.zeros(7, dtype)

        def cost_only(R, t, s):
            def edge_res(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
                return residuals.sim3_relative(Ri, ti, si, Rj, tj, sj,
                                               Rm, tm, sm)

            def per_edge(i, j, Rm_e, tm_e, sm_e):
                return edge_res(R[i], t[i], s[i], R[j], t[j], s[j],
                                Rm_e, tm_e, sm_e)
            r = jax.vmap(per_edge)(e_i, e_j, mR, mt, ms)
            w = e_w * e_valid.astype(dtype)
            return jax.lax.psum(jnp.sum(jnp.sum(r * r, -1) * w), axis)

        def body(carry, _):
            R, t, s, lam = carry
            r, Ji, Jj, w, cost0 = assemble(R, t, s)
            JiW = Ji * w[:, None, None]
            JjW = Jj * w[:, None, None]
            b = jnp.zeros((K, 7), dtype)
            b = b.at[e_i].add(jnp.einsum("eri,er->ei", JiW, r))
            b = b.at[e_j].add(jnp.einsum("eri,er->ei", JjW, r))
            b = -jax.lax.psum(b, axis) * free_v
            # block-Jacobi preconditioner (+ Marquardt damping), reduced
            # once per GN iteration
            D = jnp.zeros((K, 7, 7), dtype)
            D = D.at[e_i].add(jnp.einsum("eri,erj->eij", JiW, Ji))
            D = D.at[e_j].add(jnp.einsum("eri,erj->eij", JjW, Jj))
            D = jax.lax.psum(D, axis)
            dd = jnp.diagonal(D, axis1=-2, axis2=-1)
            D = D + jax.vmap(jnp.diag)(lam * dd + 1e-8)
            Dinv_mul = lambda v: linalg.solve_psd_small(D, v)

            def Hmul(v):
                u = (jnp.einsum("erc,ec->er", Ji, v[e_i])
                     + jnp.einsum("erc,ec->er", Jj, v[e_j]))
                y = jnp.zeros((K, 7), dtype)
                y = y.at[e_i].add(jnp.einsum("erc,er->ec", JiW, u))
                y = y.at[e_j].add(jnp.einsum("erc,er->ec", JjW, u))
                y = jax.lax.psum(y, axis)   # ONE (K,7) reduction per matvec
                return (y + lam * dd * v) * free_v

            x = jnp.zeros((K, 7), dtype)
            rcg = b
            z = Dinv_mul(rcg) * free_v
            p = z
            rz = jnp.sum(rcg * z)

            # keep the BEST-residual CG iterate (f32 CG loses conjugacy on
            # long chains; same safeguard as the single-device PCG)
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

            # multi-scale backtracking trial (replicated: every device
            # evaluates the same psum-reduced costs)
            def try_scale(sc):
                Rn2, tn2, sn2 = jax.vmap(sim3_update_left)(R, t, s,
                                                           sc * dx)
                return cost_only(Rn2, tn2, sn2)

            scales = jnp.asarray([1.0, 0.5, 0.25, 0.125], dtype)
            trial = jnp.stack([try_scale(sc) for sc in scales])
            trial = jnp.where(jnp.isfinite(trial), trial, jnp.inf)
            kb = jnp.argmin(trial)
            cost1 = trial[kb]
            Rn, tn, sn = jax.vmap(sim3_update_left)(R, t, s,
                                                    scales[kb] * dx)
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

    from jax import shard_map

    rep = P()
    sh = P(axis)
    f = shard_map(
        run, mesh=mesh,
        in_specs=(rep, rep, rep, rep, sh, sh, sh, sh, sh, sh, sh),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(linalg.f32_matmul(f), static_argnames=())(
        R, t, s, fixed, e_i, e_j, mR, mt, ms, e_w, e_valid)


def shard_edges(mesh: Mesh, e_i, e_j, mR, mt, ms, e_w, e_valid):
    """Pad edge arrays to a mesh multiple and place them on the mesh."""
    import numpy as np

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    E = len(e_i)
    pad = (-E) % n_dev
    def pd(x, fill=0):
        x = np.asarray(x)
        return np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                      constant_values=fill)
    sh = NamedSharding(mesh, P(axis))
    mR_p = pd(mR)
    if pad:
        mR_p[E:] = np.eye(3, dtype=mR_p.dtype)  # identity, not zeros: the
        # padded edges are weight-0 but still traverse sim3_log, and a zero
        # rotation there yields NaN, which 0-weighting cannot scrub
    out = (pd(e_i), pd(e_j), mR_p, pd(mt), pd(ms, 1.0), pd(e_w),
           pd(e_valid, False))
    return tuple(jax.device_put(jnp.asarray(x), sh) for x in out)
