"""Monocular two-view initialization with optional BEV metric scale.

Re-designs `/root/reference/src/Initializer.cc::Initialize` (`:58-230`):
fits H and F RANSAC (both fully batched — the reference uses two pthreads,
`:132-137`), selects by RH = SH/(SH+SF) > 0.40 (`:140-146`), recovers motion
and triangulates.

Fork-specific metric-scale path (`:513-591`): runs 2D ICP on matched BEV
ground points; rejects if the ICP translation is < 0.3 m (`:550-554`); adds
the ICP rotation (lifted to camera frame via Tcb · T12b · Tbc) as an extra
motion hypothesis (`:650-651,741-765`); and rescales the essential-matrix
unit translation by projecting it onto the metric ICP translation
t = (t̂ · t_icp) t̂ (`:579-591`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from . import icp, twoview


class InitResult(NamedTuple):
    ok: jnp.ndarray          # scalar bool
    used_homography: jnp.ndarray
    R21: jnp.ndarray         # (3,3) cam1→cam2
    t21: jnp.ndarray         # (3,)
    points3d: jnp.ndarray    # (N,3) in cam-1 frame
    good: jnp.ndarray        # (N,) triangulated-ok mask
    bird_inliers: jnp.ndarray  # (Nb,) BEV ICP inlier mask (all-False if unused)
    icp_ok: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "bird_sigma", "min_icp_translation", "n_hyp",
                     "min_parallax", "min_triangulated"))
@linalg.f32_matmul
def initialize_two_view(
    key,
    xy1,
    xy2,
    match_valid,
    K,
    sigma: float = 1.0,
    bird_xy1=None,
    bird_xy2=None,
    bird_valid=None,
    bird_sigma: float = 0.07,
    R_bc=None,
    t_bc=None,
    min_icp_translation: float = 0.3,
    n_hyp: int = 256,
    min_parallax: float = 1.0,
    min_triangulated: int = 50,
) -> InitResult:
    """xy1/xy2: (N,2) matched undistorted pixels of frames 1,2 (padded);
    bird_xy1/2: (Nb,2) matched BEV ground points in the vehicle base frame
    (meters). R_bc/t_bc: camera→base extrinsics."""
    kH, kF, kI = jax.random.split(key, 3)
    fitH = twoview.fit_homography_ransac(kH, xy1, xy2, match_valid, sigma, n_hyp)
    fitF = twoview.fit_fundamental_ransac(kF, xy1, xy2, match_valid, sigma, n_hyp)

    SH, SF = fitH.score, fitF.score
    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_H = rh > 0.40

    RsH, tsH = twoview.motion_hypotheses_from_H(fitH.model, K)
    RsF, tsF = twoview.motion_hypotheses_from_F(fitF.model, K)
    # pad F hypotheses (4) to match H count (8) so the selected branch is
    # fixed-shape; pad with degenerate identity/zero-baseline poses that can
    # never triangulate (duplicating real ones would break the uniqueness
    # check in select_motion).
    pad_R = jnp.broadcast_to(jnp.eye(3, dtype=RsF.dtype), (4, 3, 3))
    pad_t = jnp.zeros((4, 3), tsF.dtype)
    RsF = jnp.concatenate([RsF, pad_R], axis=0)
    tsF = jnp.concatenate([tsF, pad_t], axis=0)

    have_bird = bird_xy1 is not None
    icp_ok = jnp.asarray(False)
    bird_inl = (
        jnp.zeros(bird_xy1.shape[0], dtype=bool) if have_bird else jnp.zeros(0, bool)
    )
    t_icp_cam = jnp.zeros(3, xy1.dtype)
    if have_bird:
        res = icp.icp2d_ransac(kI, bird_xy1[:, :2], bird_xy2[:, :2], bird_valid,
                               bird_sigma, n_hyp=n_hyp, min_inliers=10)
        # ICP gives base-frame T12b (frame-2 ground points into frame 1);
        # camera-frame relative motion T21c = Tcb * T21b * Tbc with
        # T21b = inv(T12b).
        R12b, t12b = icp.rt2d_to_se3(res.R, res.t)
        R21b, t21b = lie.se3_inv(R12b, t12b)
        R_cb, t_cb = lie.se3_inv(R_bc, t_bc)
        Rtmp, ttmp = lie.se3_mul(R_cb, t_cb, R21b, t21b)
        R21c, t21c = lie.se3_mul(Rtmp, ttmp, R_bc, t_bc)
        trans_norm = jnp.linalg.norm(res.t)
        icp_ok = res.ok & (trans_norm >= min_icp_translation)
        bird_inl = res.inliers & icp_ok
        t_icp_cam = t21c
        # extra hypotheses: ICP rotation with ± unit ICP translation
        # (`Initializer.cc:650-651` adds R3 as hypotheses 5/6)
        t_unit = t21c / jnp.maximum(jnp.linalg.norm(t21c), 1e-9)
        RsF = jnp.concatenate([RsF[:6], jnp.stack([R21c, R21c])], axis=0)
        tsF = jnp.concatenate([tsF[:6], jnp.stack([t_unit, -t_unit])], axis=0)

    Rs = jnp.where(use_H, RsH, RsF)
    ts = jnp.where(use_H, tsH, tsF)
    model_inliers = jnp.where(use_H, fitH.inliers, fitF.inliers)

    ok, R, t, X, good = twoview.select_motion(
        Rs, ts, xy1, xy2, model_inliers, K, sigma,
        min_parallax=min_parallax, min_triangulated=min_triangulated,
    )

    if have_bird:
        # metric rescale: project unit translation onto the metric ICP
        # translation (`Initializer.cc:579-591`)
        t_hat = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
        scale = jnp.dot(t_hat, t_icp_cam)
        t_metric = t_hat * scale
        t = jnp.where(icp_ok, t_metric, t)
        X = jnp.where(icp_ok, X * jnp.abs(scale), X)
        ok = ok & icp_ok

        # ICP-pose fallback: the standard selection demands parallax and a
        # unique hypothesis, which fails for low-parallax ground-vehicle
        # motion (forward motion, far scene). The BEV ICP provides a full
        # METRIC relative pose (planar motion assumption) — the fork injects
        # it as extra hypotheses (`Initializer.cc:650-651,741-765`); we score
        # it directly and accept when the model selection is indecisive.
        R_icp = RsF[6]
        n_icp, par_icp, X_icp, good_icp = twoview.check_rt(
            R_icp, t_icp_cam, xy1, xy2, model_inliers, K, sigma)
        n_inl = jnp.sum(model_inliers.astype(jnp.int32))
        icp_accept = (
            icp_ok
            & (n_icp >= min_triangulated)
            & (n_icp >= (0.5 * n_inl).astype(jnp.int32))
        )
        use_fallback = icp_accept & ~ok
        R = jnp.where(use_fallback, R_icp, R)
        t = jnp.where(use_fallback, t_icp_cam, t)  # already metric
        X = jnp.where(use_fallback, X_icp, X)
        good = jnp.where(use_fallback, good_icp, good)
        ok = ok | icp_accept

    return InitResult(ok, use_H, R, t, X, good, bird_inl, icp_ok)
