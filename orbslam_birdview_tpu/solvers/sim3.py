"""Sim3 absolute orientation (Horn) with batched RANSAC, for loop closing.

Re-designs `/root/reference/src/Sim3Solver.cc`: closed-form quaternion method
(`ComputeSim3`, `:226-338`) on matched 3D point sets, optional fixed scale
(stereo/RGBD, `include/Sim3Solver.h:39`), bidirectional reprojection chi2
gating (`CheckInliers`, `:340-365`). Transform maps frame-2 points into
frame 1: p1 ≈ s R p2 + t.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from . import ransac

CHI2_SIM3 = 9.210  # 99% 2-DoF, as in Sim3Solver::SetRansacParameters


@linalg.f32_matmul
def horn_sim3(p1, p2, w=None, fix_scale: bool = False):
    """Closed-form Sim3: returns (R, t, s) with p1 ≈ s R p2 + t."""
    if w is None:
        w = jnp.ones(p1.shape[0], p1.dtype)
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(p1 * w[:, None], axis=0) / sw
    c2 = jnp.sum(p2 * w[:, None], axis=0) / sw
    q1 = p1 - c1
    q2 = p2 - c2
    M = (q2 * w[:, None]).T @ q1  # 3x3, rows: from-frame-2, cols: frame-1
    # Horn's 4x4 N matrix (symmetric); largest-eigenvalue eigenvector is the
    # rotation quaternion taking frame-2 into frame-1.
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ],
        dtype=p1.dtype,
    )
    _, vecs = jnp.linalg.eigh(N)  # ascending; take last
    q = vecs[:, -1]  # (w,x,y,z)
    R = lie.quat_to_rot(q)
    rot_q2 = q2 @ R.T
    if fix_scale:
        s = jnp.asarray(1.0, p1.dtype)
    else:
        # asymmetric scale as in the reference (`Sim3Solver.cc:310-321`)
        num = jnp.sum(q1 * rot_q2 * w[:, None])
        den = jnp.maximum(jnp.sum(rot_q2 * rot_q2 * w[:, None]), 1e-12)
        s = num / den
    t = c1 - s * (R @ c2)
    return R, t, s


class Sim3Result(NamedTuple):
    ok: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _proj(p, fx, fy, cx, cy):
    z = jnp.maximum(p[..., 2], 1e-6)
    return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1)


@functools.partial(
    jax.jit,
    static_argnames=("fx1", "fy1", "cx1", "cy1", "fx2", "fy2", "cx2", "cy2",
                     "fix_scale", "n_hyp", "min_inliers"))
@linalg.f32_matmul
def sim3_ransac(
    key,
    p1_cam,
    p2_cam,
    valid,
    max_err1,
    max_err2,
    fx1: float, fy1: float, cx1: float, cy1: float,
    fx2: float, fy2: float, cx2: float, cy2: float,
    fix_scale: bool = False,
    n_hyp: int = 256,
    min_inliers: int = 20,
):
    """RANSAC Horn between camera-frame point sets of two keyframes.

    fx1..cy2: pinhole intrinsics of KF1/KF2 (static — the whole solve is
    one jitted program; a per-call projection closure would retrace every
    invocation, costing minutes of remote compile on the tunnel backend).
    max_err1/2: per-point squared-pixel gates (9.21 * sigma2 per octave,
    `Sim3Solver.cc:131-140`).
    """
    proj1 = lambda p: _proj(p, fx1, fy1, cx1, cy1)
    proj2 = lambda p: _proj(p, fx2, fy2, cx2, cy2)
    idx, hyp_ok = ransac.sample_minimal_sets(key, valid, n_hyp, 3)
    Rs, ts, ss = jax.vmap(lambda i: horn_sim3(p1_cam[i], p2_cam[i], fix_scale=fix_scale))(idx)

    uv1_obs = proj1(p1_cam)
    uv2_obs = proj2(p2_cam)

    def score(R, t, s):
        # project p2 into cam1 via Sim3 and p1 into cam2 via inverse
        p2_in1 = s * (p2_cam @ R.T) + t
        Ri, ti, si = lie.sim3_inv(R, t, s)
        p1_in2 = si * (p1_cam @ Ri.T) + ti
        e1 = jnp.sum((proj1(p2_in1) - uv1_obs) ** 2, axis=-1)
        e2 = jnp.sum((proj2(p1_in2) - uv2_obs) ** 2, axis=-1)
        inl = (e1 < max_err1) & (e2 < max_err2) & valid
        return inl

    inl = jax.vmap(score)(Rs, ts, ss)
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best, _ = ransac.best_hypothesis(counts.astype(jnp.float32), hyp_ok)
    # Least-squares 3D refit on the winner's inliers — but keep it ONLY if
    # it does not lose reprojection inliers. With correlated depth noise
    # (low-parallax monocular maps) the 3D LSQ drags the scale toward the
    # depth-error direction, which the reprojection gate then rejects; the
    # reference never 3D-refits (Sim3Solver returns the best raw hypothesis
    # and leaves refinement to reprojection-based OptimizeSim3).
    w = inl[best].astype(p1_cam.dtype)
    R1, t1, s1 = horn_sim3(p1_cam, p2_cam, w, fix_scale=fix_scale)
    inl1 = score(R1, t1, s1)
    n1 = jnp.sum(inl1.astype(jnp.int32))
    n0 = counts[best]
    take = n1 >= n0
    R = jnp.where(take, R1, Rs[best])
    t = jnp.where(take, t1, ts[best])
    s = jnp.where(take, s1, ss[best])
    inliers = jnp.where(take, inl1, inl[best])
    n = jnp.maximum(n0, n1)
    return Sim3Result(n >= min_inliers, R, t, s, inliers, n)
