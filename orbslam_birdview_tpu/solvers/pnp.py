"""Perspective-n-Point with batched RANSAC, for relocalization.

The reference uses EPnP inside a serial RANSAC (`/root/reference/src/
PnPsolver.cc`, `iterate` `:165-306`, min-set 4 per `Tracking.cc:1947`,
per-octave chi2 gates `:67-110`). The TPU design scores hundreds of
hypotheses at once: the default hypothesis generator is batched EPnP on
4-point minimal sets (`solvers/epnp.py` — control points, β cases,
Gauss-Newton polish, Procrustes — all under vmap), matching the
reference's minimal-set size and success probability per hypothesis. A
6-point DLT generator (`solver="dlt"`) is kept as an alternative; both are
followed by an iterative Gauss-Newton polish on all inliers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from . import ransac
from .epnp import epnp


@linalg.f32_matmul
def pnp_dlt(Xw, xy_norm):
    """Direct linear transform pose from k>=6 3D-2D pairs.

    Xw (k,3) world points; xy_norm (k,2) normalized image coords (K^-1 x).
    Returns (R, t) with x ~ [R|t] X.
    """
    k = Xw.shape[0]
    X = jnp.concatenate([Xw, jnp.ones((k, 1), Xw.dtype)], axis=1)  # (k,4)
    z = jnp.zeros((k, 4), Xw.dtype)
    u = xy_norm[:, 0:1]
    v = xy_norm[:, 1:2]
    r1 = jnp.concatenate([X, z, -u * X], axis=1)
    r2 = jnp.concatenate([z, X, -v * X], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2k,12)
    _, _, vh = jnp.linalg.svd(A, full_matrices=True)
    P = vh[-1].reshape(3, 4)
    M = P[:, :3]
    # scale: rows of R must be unit norm; orthogonalize via SVD
    U, s, Vh = jnp.linalg.svd(M)
    scale = jnp.mean(s)
    R = U @ Vh
    det = jnp.linalg.det(R)
    R = R * jnp.sign(det)
    t = P[:, 3] / jnp.maximum(scale, 1e-12) * jnp.sign(det)
    # cheirality: majority of points must be in front
    z_cam = (Xw @ R.T + t)[:, 2]
    flip = jnp.sum(jnp.sign(z_cam)) < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # re-fix determinant after flip (−R has det −1): rotate 180° instead
    detR = jnp.linalg.det(R)
    R = jnp.where(detR < 0, -R, R)
    return R, t


@linalg.f32_matmul
def gn_refine_pose(R, t, Xw, xy_norm, w, iters: int = 10):
    """Gauss-Newton on SE3 (left-multiplicative update) minimizing normalized
    reprojection error with per-point weights w."""

    def step(carry, _):
        R, t = carry
        Xc = Xw @ R.T + t
        x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
        zi = 1.0 / jnp.maximum(z, 1e-6)
        pred = jnp.stack([x * zi, y * zi], axis=-1)
        r = (pred - xy_norm) * w[:, None]
        # d(pred)/d(xi) for left-mult update xi=[rho,phi]
        zi2 = zi * zi
        # d u / d Xc
        Ju = jnp.stack([zi, jnp.zeros_like(zi), -x * zi2], axis=-1)
        Jv = jnp.stack([jnp.zeros_like(zi), zi, -y * zi2], axis=-1)
        Jp = jnp.stack([Ju, Jv], axis=1)  # (N,2,3)
        # d Xc / d xi = [I | -[Xc]x]
        I = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (Xc.shape[0], 3, 3))
        Jx = jnp.concatenate([I, -lie.hat(Xc)], axis=-1)  # (N,3,6)
        J = (Jp @ Jx) * w[:, None, None]  # (N,2,6)
        Jf = J.reshape(-1, 6)
        rf = r.reshape(-1)
        H = Jf.T @ Jf + 1e-8 * jnp.eye(6, dtype=R.dtype)
        g = Jf.T @ rf
        dx = -linalg.solve_psd_small(H + 1e-9 * jnp.eye(6, dtype=H.dtype), g)
        Rn, tn = lie.se3_update_left(R, t, dx)
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("n_hyp", "min_inliers",
                                             "refine_iters", "solver"))
@linalg.f32_matmul
def pnp_ransac(
    key,
    Xw,
    xy_norm,
    valid,
    chi2_per_point,
    n_hyp: int = 256,
    min_inliers: int = 10,
    refine_iters: int = 10,
    solver: str = "epnp",
):
    """RANSAC PnP. chi2_per_point: per-point squared-normalized-coord gate
    (the reference scales by octave sigma2, `PnPsolver.cc:67-110`).

    solver="epnp" (default): 4-point EPnP hypotheses, reference parity
    (`PnPsolver::iterate`, min-set 4). solver="dlt": 6-point DLT."""
    min_set = 4 if solver == "epnp" else 6
    idx, hyp_ok = ransac.sample_minimal_sets(key, valid, n_hyp, min_set)
    if solver == "epnp":
        Rs, ts = jax.vmap(lambda i: epnp(Xw[i], xy_norm[i]))(idx)
    else:
        Rs, ts = jax.vmap(lambda i: pnp_dlt(Xw[i], xy_norm[i]))(idx)

    def inl_of(R, t):
        Xc = Xw @ R.T + t
        z = jnp.maximum(Xc[:, 2], 1e-6)
        pred = Xc[:, :2] / z[:, None]
        e2 = jnp.sum((pred - xy_norm) ** 2, axis=-1)
        return (e2 < chi2_per_point) & valid & (Xc[:, 2] > 0)

    inl = jax.vmap(inl_of)(Rs, ts)
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best, _ = ransac.best_hypothesis(counts.astype(jnp.float32), hyp_ok)
    R, t = Rs[best], ts[best]
    w = inl[best].astype(Xw.dtype)
    R, t = gn_refine_pose(R, t, Xw, xy_norm, w, iters=refine_iters)
    inliers = inl_of(R, t)
    n = jnp.sum(inliers.astype(jnp.int32))
    return PnPResult(n >= min_inliers, R, t, inliers, n)
