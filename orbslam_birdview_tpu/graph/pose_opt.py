"""Motion-only pose optimization (front + birdview edges).

Re-designs `Optimizer::PoseOptimizationWithBirdview`
(`/root/reference/src/OptimizerBirdview.cc:299-702`): 4 rounds × 10 LM
iterations; Huber kernels in the first two rounds; between rounds every edge
is re-classified inlier/outlier by chi2 (5.991 mono / 7.815 bird) and
outliers are excluded from the next round. Returns the refined pose and the
final inlier masks — exactly the contract Tracking uses for its inlier
counting (`src/Tracking.cc:1090-1118`).

Everything is fixed-shape: edges are padded arrays with validity masks; the
round/iteration structure is lax.scan, so the whole optimizer is one XLA
program with no host round-trips.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie, robust
from . import residuals

CHI2_MONO = 5.991
CHI2_BIRD = 7.815


class PoseOptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers_mono: jnp.ndarray
    inliers_bird: jnp.ndarray
    n_inliers: jnp.ndarray   # front + bird, as the reference sums them
    chi2: jnp.ndarray


def _build_normal_eq(R, t, Xw, obs, info, active, fx, fy, cx, cy,
                     Xw_b, obs_b, info_b, active_b, use_huber):
    e, J, _, depth_ok = residuals.mono_reproj(R, t, Xw, obs, fx, fy, cx, cy)
    chi2 = jnp.sum(e * e, axis=-1) * info
    w = jnp.where(use_huber, robust.huber_weight(chi2, CHI2_MONO), 1.0)
    w = w * info * active.astype(R.dtype) * depth_ok.astype(R.dtype)
    H = jnp.einsum("nij,n,nik->jk", J, w, J)
    g = jnp.einsum("nij,n,ni->j", J, w, e)
    cost = jnp.sum(jnp.where(active & depth_ok,
                             jnp.where(use_huber, robust.huber_rho(chi2, CHI2_MONO), chi2),
                             0.0))

    eb, Jb, _ = residuals.bird_point(R, t, Xw_b, obs_b)
    chi2_b = jnp.sum(eb * eb, axis=-1) * info_b
    wb = jnp.where(use_huber, robust.huber_weight(chi2_b, CHI2_BIRD), 1.0)
    wb = wb * info_b * active_b.astype(R.dtype)
    H = H + jnp.einsum("nij,n,nik->jk", Jb, wb, Jb)
    g = g + jnp.einsum("nij,n,ni->j", Jb, wb, eb)
    cost = cost + jnp.sum(jnp.where(active_b,
                                    jnp.where(use_huber, robust.huber_rho(chi2_b, CHI2_BIRD), chi2_b),
                                    0.0))
    return H, g, cost, chi2, chi2_b


def _chi2_only(R, t, Xw, obs, info, fx, fy, cx, cy, Xw_b, obs_b, info_b):
    e, _, _, depth_ok = residuals.mono_reproj(R, t, Xw, obs, fx, fy, cx, cy)
    chi2 = jnp.sum(e * e, axis=-1) * info
    chi2 = jnp.where(depth_ok, chi2, jnp.inf)
    eb, _, _ = residuals.bird_point(R, t, Xw_b, obs_b)
    chi2_b = jnp.sum(eb * eb, axis=-1) * info_b
    return chi2, chi2_b


import functools


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "rounds", "iters_per_round"),
)
def optimize_pose(
    R0,
    t0,
    Xw,
    obs_uv,
    info,
    valid,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    Xw_bird=None,
    obs_pc_bird=None,
    info_bird=None,
    valid_bird=None,
    rounds: int = 4,
    iters_per_round: int = 10,
) -> PoseOptResult:
    """Xw (N,3) world points matched to observations obs_uv (N,2);
    info (N,) = 1/sigma² per edge; valid (N,) mask.
    Bird edges: world landmark Xw_bird vs observed camera-frame point
    obs_pc_bird (info scaled by the caller, reference ×3/×5)."""
    dtype = R0.dtype
    if Xw_bird is None:
        Xw_bird = jnp.zeros((1, 3), dtype)
        obs_pc_bird = jnp.zeros((1, 3), dtype)
        info_bird = jnp.zeros((1,), dtype)
        valid_bird = jnp.zeros((1,), bool)

    def lm_iters(R, t, active, active_b, use_huber):
        def body(carry, _):
            R, t, lam = carry
            H, g, cost0, _, _ = _build_normal_eq(
                R, t, Xw, obs_uv, info, active, fx, fy, cx, cy,
                Xw_bird, obs_pc_bird, info_bird, active_b, use_huber)
            Haug = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6, dtype=dtype)
            dx = -jnp.linalg.solve(Haug, g)
            Rn, tn = lie.se3_update_left(R, t, dx)
            _, _, cost1, _, _ = _build_normal_eq(
                Rn, tn, Xw, obs_uv, info, active, fx, fy, cx, cy,
                Xw_bird, obs_pc_bird, info_bird, active_b, use_huber)
            accept = (cost1 < cost0) & jnp.all(jnp.isfinite(dx))
            R = jnp.where(accept, Rn, R)
            t = jnp.where(accept, tn, t)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-9, 1e6)
            return (R, t, lam), cost1

        (R, t, _), costs = jax.lax.scan(
            body, (R, t, jnp.asarray(1e-4, dtype)), None, length=iters_per_round
        )
        return R, t, costs[-1]

    R, t = R0, t0
    active = valid
    active_b = valid_bird
    final_cost = jnp.asarray(0.0, dtype)
    for rnd in range(rounds):
        use_huber = rnd < 2
        R, t, final_cost = lm_iters(R, t, active, active_b, use_huber)
        chi2, chi2_b = _chi2_only(R, t, Xw, obs_uv, info, fx, fy, cx, cy,
                                  Xw_bird, obs_pc_bird, info_bird)
        active = valid & (chi2 <= CHI2_MONO)
        active_b = valid_bird & (chi2_b <= CHI2_BIRD)

    n_inl = jnp.sum(active.astype(jnp.int32)) + jnp.sum(active_b.astype(jnp.int32))
    return PoseOptResult(R, t, active, active_b, n_inl, final_cost)
