"""Two-frame Sim3 refinement by bidirectional reprojection.

Re-designs `Optimizer::OptimizeSim3` (`/root/reference/src/Optimizer.cc:
1046-1243`): given matched camera-frame points of two keyframes, refine the
relative Sim3 S12 minimizing reprojection error in BOTH images (Huber,
chi2 gate 10, outlier removal round then re-optimization). The RANSAC Horn
estimate feeding this is far too loose for loop correction — scale errors
of a few percent smear around the whole loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from ..core.robust import huber_rho, huber_weight

CHI2_SIM3 = 10.0


def _project(p, fx, fy, cx, cy):
    z = jnp.maximum(p[..., 2], 1e-6)
    return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy",
                                             "fix_scale", "iters"))
@linalg.f32_matmul
def optimize_sim3_two_frame(
    R, t, s,              # initial S12 (cam2 -> cam1)
    p1_cam, p2_cam,       # (N,3) matched points in each camera frame
    uv1, uv2,             # (N,2) pixel observations in each image
    info1, info2,         # (N,) 1/sigma2
    valid,                # (N,)
    fx: float, fy: float, cx: float, cy: float,
    fix_scale: bool = False,
    iters: int = 10,
):
    """Returns (R, t, s, inliers, n_inliers)."""
    dtype = R.dtype

    def residuals_of(xi, R, t, s):
        dR, dt, ds = lie.sim3_exp(xi)
        R2, t2, s2 = lie.sim3_mul(dR, dt, ds, R, t, s)
        if fix_scale:
            s2 = jnp.asarray(1.0, dtype)
        p2_in1 = s2 * (p2_cam @ R2.T) + t2
        Ri, ti, si = lie.sim3_inv(R2, t2, s2)
        p1_in2 = si * (p1_cam @ Ri.T) + ti
        e1 = uv1 - _project(p2_in1, fx, fy, cx, cy)
        e2 = uv2 - _project(p1_in2, fx, fy, cx, cy)
        return e1, e2

    zero = jnp.zeros(7, dtype)

    def gn_round(R, t, s, active, n_steps):
        def body(carry, _):
            R, t, s, lam = carry
            e1, e2 = residuals_of(zero, R, t, s)
            J = jax.jacfwd(
                lambda xi: jnp.concatenate(residuals_of(xi, R, t, s), axis=0)
            )(zero)  # (2N,2,7)? -> concatenated (2N,2)… reshape below
            e = jnp.concatenate([e1, e2], axis=0)      # (2N,2)
            info = jnp.concatenate([info1, info2], 0)  # (2N,)
            act = jnp.concatenate([active, active], 0)
            chi2 = jnp.sum(e * e, -1) * info
            w = huber_weight(chi2, CHI2_SIM3) * info * act.astype(dtype)
            Jf = J.reshape(-1, 7)
            wf = jnp.repeat(w, 2)
            H = Jf.T @ (Jf * wf[:, None])
            g = Jf.T @ (e.reshape(-1) * wf)
            if fix_scale:
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            dx = -linalg.solve_psd_small(H + lam * jnp.eye(7, dtype=dtype), g)
            dR, dt, ds = lie.sim3_exp(dx)
            Rn, tn, sn = lie.sim3_mul(dR, dt, ds, R, t, s)
            if fix_scale:
                sn = jnp.asarray(1.0, dtype)
            e1n, e2n = residuals_of(zero, Rn, tn, sn)
            chin = (jnp.sum(e1n * e1n, -1) * info1
                    + jnp.sum(e2n * e2n, -1) * info2)
            chio = (jnp.sum(e1 * e1, -1) * info1 + jnp.sum(e2 * e2, -1) * info2)
            cost1 = jnp.sum(jnp.where(active, huber_rho(chin, CHI2_SIM3), 0.0))
            cost0 = jnp.sum(jnp.where(active, huber_rho(chio, CHI2_SIM3), 0.0))
            ok = (cost1 < cost0) & jnp.isfinite(cost1)
            R = jnp.where(ok, Rn, R)
            t = jnp.where(ok, tn, t)
            s = jnp.where(ok, sn, s)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e8)
            return (R, t, s, lam), None

        (R, t, s, _), _ = jax.lax.scan(
            body, (R, t, s, jnp.asarray(1e-5, dtype)), None, length=n_steps)
        return R, t, s

    def classify(R, t, s):
        e1, e2 = residuals_of(zero, R, t, s)
        chi1 = jnp.sum(e1 * e1, -1) * info1
        chi2_ = jnp.sum(e2 * e2, -1) * info2
        return valid & (chi1 < CHI2_SIM3) & (chi2_ < CHI2_SIM3)

    R, t, s = gn_round(R, t, s, valid, iters // 2)
    active = classify(R, t, s)
    R, t, s = gn_round(R, t, s, active, iters - iters // 2)
    inl = classify(R, t, s)
    return R, t, s, inl, jnp.sum(inl.astype(jnp.int32))
