"""Point-set registration (Kabsch/Umeyama) in 2D and 3D with batched RANSAC.

Re-designs the fork's `IcpSolver` (`/root/reference/src/IcpSolver.cc`):
3D registration via centroid + cross-covariance SVD with det guard
(`:11-91`, chi2 7.815 gate) and the 2D ground-plane variant used by the
birdview metric initializer (`:172-252`, chi2 5.991, minimum set 2). The
reference's serial RANSAC drivers (`:93-167,254-326`) become one vmapped
hypothesis sweep.

Transforms map set-2 points onto set-1: p1 ≈ R @ p2 + t (reference
convention `FindRtICP(vP1, vP2, R12, t12)`).
"""
from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

from ..core import linalg

from . import ransac

CHI2_2D = 5.991
CHI2_3D = 7.815


@linalg.f32_matmul
def kabsch(p1, p2, w=None):
    """Weighted LSQ rigid transform (R, t) with p1 ≈ R p2 + t.
    p1,p2 (N,D); w (N,) weights. D in {2,3}."""
    D = p1.shape[-1]
    if w is None:
        w = jnp.ones(p1.shape[0], p1.dtype)
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(p1 * w[:, None], axis=0) / sw
    c2 = jnp.sum(p2 * w[:, None], axis=0) / sw
    q1 = p1 - c1
    q2 = p2 - c2
    H = (q2 * w[:, None]).T @ q1  # (D,D): sum w * q2 q1^T
    U, _, Vh = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vh.T @ U.T)
    S = jnp.eye(D, dtype=p1.dtype).at[D - 1, D - 1].set(d)
    R = Vh.T @ S @ U.T
    t = c1 - R @ c2
    return R, t


def _residual_chi2(R, t, p1, p2, sigma2):
    r = p1 - (p2 @ R.T + t)
    return jnp.sum(r * r, axis=-1) / sigma2


class IcpResult(NamedTuple):
    ok: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _icp_ransac(key, p1, p2, valid, sigma, chi2_th, min_set, n_hyp, min_inliers):
    sigma2 = sigma * sigma
    idx, hyp_ok = ransac.sample_minimal_sets(key, valid, n_hyp, min_set)
    Rs, ts = jax.vmap(lambda i: kabsch(p1[i], p2[i]))(idx)
    chi2 = jax.vmap(lambda R, t: _residual_chi2(R, t, p1, p2, sigma2))(Rs, ts)
    inl = (chi2 < chi2_th) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best, n_best = ransac.best_hypothesis(counts.astype(jnp.float32), hyp_ok)
    # refine on the best hypothesis' inliers
    w = inl[best].astype(p1.dtype)
    R, t = kabsch(p1, p2, w)
    chi2_r = _residual_chi2(R, t, p1, p2, sigma2)
    inliers = (chi2_r < chi2_th) & valid
    n = jnp.sum(inliers.astype(jnp.int32))
    ok = n >= min_inliers
    return IcpResult(ok, R, t, inliers, n)


@functools.partial(jax.jit,
                   static_argnames=("sigma", "n_hyp", "min_inliers"))
@linalg.f32_matmul
def icp2d_ransac(key, p1, p2, valid, sigma: float, n_hyp: int = 256,
                 min_inliers: int = 10):
    """2D ground-plane registration (`IcpSolver::FindRtICP2D`)."""
    return _icp_ransac(key, p1, p2, valid, sigma, CHI2_2D, 2, n_hyp, min_inliers)


@functools.partial(jax.jit,
                   static_argnames=("sigma", "n_hyp", "min_inliers"))
@linalg.f32_matmul
def icp3d_ransac(key, p1, p2, valid, sigma: float, n_hyp: int = 256,
                 min_inliers: int = 10):
    """3D registration (`IcpSolver::FindRtICP`)."""
    return _icp_ransac(key, p1, p2, valid, sigma, CHI2_3D, 3, n_hyp, min_inliers)


def rt2d_to_se3(R2, t2):
    """Lift a 2D ground-plane (R,t) into an SE3 acting on (x,y,z): rotation
    about +z, zero z-translation (`Initializer.cc:556-568` builds T12b this
    way from the ICP result)."""
    R = jnp.eye(3, dtype=R2.dtype)
    R = R.at[:2, :2].set(R2)
    t = jnp.concatenate([t2, jnp.zeros((1,), t2.dtype)])
    return R, t
