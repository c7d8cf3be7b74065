"""Stereo depth from row-constrained descriptor matching.

Re-designs `Frame::ComputeStereoMatches` (`/root/reference/src/Frame.cc:
662-838`): the reference does per-row candidate lists + serial SAD sliding
windows; here both images' ORB features are matched with one dense masked
Hamming matrix (row-band + disparity-range mask), then ALL matches are
subpixel-refined at once — a batched SAD sliding window (11×11 patches,
±5 px sweep) with parabola interpolation, vmapped over keypoints on device
(`src/Frame.cc:748-818`), followed by the median-SAD outlier cut
(`src/Frame.cc:823-838`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import matcher, orb


def stereo_match(kp_l, kp_r, max_row_diff: float = 2.0,
                 min_disp: float = 0.1, max_disp: float = 128.0):
    """Match left keypoints to right keypoints on (approximately) the same
    image row with positive disparity. Returns (idx_r (Kl,), disparity (Kl,))
    with idx −1 / disparity −1 where unmatched."""
    dist = matcher.hamming_matrix(kp_l.desc_pm1, kp_r.desc_pm1,
                                  kp_l.valid, kp_r.valid)
    dv = jnp.abs(kp_l.xy[:, None, 1] - kp_r.xy[None, :, 1])
    disp = kp_l.xy[:, None, 0] - kp_r.xy[None, :, 0]
    lvl_ok = jnp.abs(kp_l.octave[:, None] - kp_r.octave[None, :]) <= 1
    ok = (dv <= max_row_diff) & (disp >= min_disp) & (disp <= max_disp) & lvl_ok
    dist = jnp.where(ok, dist, matcher.BIG_DIST)
    idx, best = matcher.match_mutual(dist, max_dist=matcher.TH_HIGH, ratio=1.0)
    m = idx >= 0
    i = jnp.where(m, idx, 0)
    d = kp_l.xy[:, 0] - kp_r.xy[i, 0]
    return jnp.where(m, idx, -1), jnp.where(m, d, -1.0)


@functools.partial(jax.jit, static_argnames=("w", "L"))
def subpixel_disparity(img_l, img_r, xy_l, ur0, valid, w: int = 5, L: int = 5):
    """Batched SAD sliding-window subpixel refinement.

    For every matched left keypoint, compare its (2w+1)² patch (center-value
    normalized) against 2L+1 horizontally shifted right-image patches around
    the integer match `ur0`, fit a parabola through the best SAD and its
    neighbors, and return (refined uR, SAD at best shift, refined-valid).
    """
    img_l = jnp.asarray(img_l, jnp.float32)
    img_r = jnp.asarray(img_r, jnp.float32)
    H, W = img_l.shape
    P = 2 * w + 1
    S = P + 2 * L  # right strip width

    ul = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    vl = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    ur = jnp.round(ur0).astype(jnp.int32)
    # in-bounds guards (reference `continue`s, src/Frame.cc:770-772)
    ok = (valid & (ul - w >= 0) & (ul + w < W) & (vl - w >= 0) & (vl + w < H)
          & (ur - w - L >= 0) & (ur + w + L < W))

    def per_kp(ul_i, vl_i, ur_i):
        patch_l = jax.lax.dynamic_slice(img_l, (vl_i - w, ul_i - w), (P, P))
        patch_l = patch_l - patch_l[w, w]
        strip = jax.lax.dynamic_slice(img_r, (vl_i - w, ur_i - w - L), (P, S))
        # 2L+1 shifted windows out of the strip
        wins = jnp.stack([strip[:, k:k + P] for k in range(2 * L + 1)])
        wins = wins - wins[:, w, w][:, None, None]
        return jnp.sum(jnp.abs(wins - patch_l[None]), axis=(1, 2))

    ul_c = jnp.clip(ul, w, W - w - 1)
    vl_c = jnp.clip(vl, w, H - w - 1)
    ur_c = jnp.clip(ur, w + L, W - w - L - 1)
    dists = jax.vmap(per_kp)(ul_c, vl_c, ur_c)       # (K, 2L+1)
    best = jnp.argmin(dists, axis=1)
    interior = (best > 0) & (best < 2 * L)           # reject endpoint minima
    b = jnp.clip(best, 1, 2 * L - 1)
    k = jnp.arange(dists.shape[0])
    d1 = dists[k, b - 1]
    d2 = dists[k, b]
    d3 = dists[k, b + 1]
    denom = d1 + d3 - 2.0 * d2
    delta = jnp.where(jnp.abs(denom) > 1e-6, (d1 - d3) / (2.0 * denom), 0.0)
    ok = ok & interior & (delta >= -1.0) & (delta <= 1.0)
    uR = ur_c.astype(jnp.float32) + (b - L).astype(jnp.float32) + delta
    return uR, d2, ok


def refine_stereo_subpixel(img_l, img_r, kp_l, kp_r, idx, disp,
                           min_disp: float = 0.01, max_disp: float = 128.0):
    """Apply subpixel refinement + the reference's median-SAD outlier cut
    to integer stereo matches. Returns refined (idx, disparity, uR)."""
    m = idx >= 0
    i = jnp.where(m, idx, 0)
    ur0 = kp_r.xy[i, 0]
    uR, sad, ok = subpixel_disparity(img_l, img_r, kp_l.xy, ur0, m)
    d = kp_l.xy[:, 0] - uR
    ok = ok & (d >= min_disp) & (d < max_disp)
    # median-SAD cut: drop matches with SAD > 1.5·1.4·median
    # (src/Frame.cc:823-838)
    sad_valid = jnp.where(ok, sad, jnp.nan)
    med = jnp.nanmedian(sad_valid)
    ok = ok & (sad <= 1.5 * 1.4 * med)
    # fall back to the integer-match disparity where refinement failed but
    # the descriptor match was fine
    keep = m & (ok | (disp > 0))
    d_out = jnp.where(ok, d, disp)
    return (jnp.where(keep, idx, -1),
            jnp.where(keep, d_out, -1.0),
            jnp.where(keep, kp_l.xy[:, 0] - d_out, -1.0))


def stereo_depth_for_frame(img_left, img_right, cfg):
    """Dense-splatted depth map sampled later at the left keypoints.

    Depth = bf / disparity (`Frame::ComputeStereoMatches` output contract:
    mvDepth / mvuRight)."""
    kl = orb.extract_orb(jnp.asarray(img_left, jnp.float32), cfg.orb)
    kr = orb.extract_orb(jnp.asarray(img_right, jnp.float32), cfg.orb)
    idx, disp = stereo_match(kl, kr)
    idx, disp, _ = refine_stereo_subpixel(
        jnp.asarray(img_left, jnp.float32), jnp.asarray(img_right, jnp.float32),
        kl, kr, idx, disp)
    disp = np.asarray(disp)
    xy = np.asarray(kl.xy)
    H, W = np.asarray(img_left).shape[:2]
    depth = np.zeros((H, W), np.float32)
    ok = (disp > 0) & np.asarray(kl.valid)
    xi = np.clip(xy[ok, 0].astype(int), 0, W - 1)
    yi = np.clip(xy[ok, 1].astype(int), 0, H - 1)
    depth[yi, xi] = cfg.camera.bf / np.maximum(disp[ok], 1e-6)
    return depth
