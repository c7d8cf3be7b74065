"""Jitted device kernels shared by the tracking/mapping pipeline stages.

Each op is fixed-shape (padded + masked) so it compiles once per
configuration and never re-traces during a run. These replace the per-object
serial loops of `Tracking.cc` / `LocalMapping.cc` with whole-frame tensor
ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from ..frontend import matcher
from ..frontend.keypoints import unpack_bits_to_pm1


@jax.jit
@linalg.f32_matmul
def project_points(R, t, pos, fx, fy, cx, cy, width, height):
    """World points -> (uv, depth, in_front_and_in_image)."""
    Xc = pos @ R.T + t
    z = Xc[:, 2]
    zi = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = fx * Xc[:, 0] * zi + cx
    v = fy * Xc[:, 1] * zi + cy
    uv = jnp.stack([u, v], -1)
    ok = (z > 0.05) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    return uv, z, ok


@jax.jit
@linalg.f32_matmul
def frustum_gate(R, t, pos, normal, min_dist, max_dist, valid,
                 fx, fy, cx, cy, width, height, n_levels, log_scale):
    """Full `Frame::isInFrustum` (src/Frame.cc:436-492): image bounds, scale
    band, viewing angle; predicts octave + search radius factor."""
    uv, z, in_img = project_points(R, t, pos, fx, fy, cx, cy, width, height)
    center = -R.T @ t
    po = pos - center[None]
    dist = jnp.linalg.norm(po, axis=-1)
    band = (dist >= min_dist * 0.8) & (dist <= max_dist * 1.2)
    view_cos = jnp.sum(po * normal, -1) / jnp.maximum(dist, 1e-9)
    angle_ok = view_cos > 0.5
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    pred_octave = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale).astype(jnp.int32),
        0, n_levels - 1,
    )
    radius_factor = jnp.where(view_cos > 0.998, 2.5, 4.0)
    ok = in_img & band & angle_ok & valid
    return uv, pred_octave, radius_factor, ok


@functools.partial(jax.jit, static_argnames=("max_dist_th",))
def match_projected(
    proj_uv, pt_ok, pt_desc_u8, kp_xy, kp_octave, kp_valid, kp_desc_pm1,
    radius, pred_octave, max_dist_th: int = matcher.TH_HIGH,
):
    pt_pm1 = unpack_bits_to_pm1(pt_desc_u8)
    idx, dist = matcher.search_by_projection(
        proj_uv, pt_ok, pt_pm1, kp_xy, kp_octave, kp_valid, kp_desc_pm1,
        radius, pred_octave, max_dist=max_dist_th,
    )
    idx = matcher.resolve_duplicate_targets(idx, dist)
    return idx, dist


@jax.jit
def match_frames_window(xy_a, desc_a_pm1, valid_a, xy_b, desc_b_pm1, valid_b,
                        radius):
    dist = matcher.hamming_matrix(desc_a_pm1, desc_b_pm1, valid_a, valid_b)
    idx, d = matcher.match_window(xy_a, xy_b, dist, radius,
                                  max_dist=matcher.TH_LOW, ratio=0.9)
    return idx, d


@functools.partial(jax.jit, static_argnames=("n_bins_keep",))
def match_frames_window_rot(xy_a, ang_a, desc_a_pm1, valid_a,
                            xy_b, ang_b, desc_b_pm1, valid_b, radius,
                            n_bins_keep: int = 3):
    idx, d = match_frames_window(xy_a, desc_a_pm1, valid_a, xy_b,
                                 desc_b_pm1, valid_b, radius)
    m = idx >= 0
    keep = matcher.rotation_consistency_mask(ang_a, ang_b,
                                             jnp.where(m, idx, 0), m)
    return jnp.where(keep, idx, -1), d


@jax.jit
@linalg.f32_matmul
def epipolar_triangulate(
    R1, t1, R2, t2, K,
    kp1_xy, kp1_octave, kp1_free, desc1_pm1,
    kp2_xy, kp2_octave, kp2_free, desc2_pm1,
    level_sigma2,
):
    """`LocalMapping::CreateNewMapPoints` inner loop
    (`src/LocalMapping.cc:217-462` + `ORBmatcher::SearchForTriangulation`
    `ORBmatcher.cc:657-823`) as one dense masked op.

    Matches unassociated keypoints of KF1 against KF2 under the epipolar
    constraint, triangulates, and applies the acceptance gates
    (cheirality, parallax, reprojection, scale consistency).
    Returns (idx2 (K1,), points (K1,3), ok (K1,)).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # fundamental from relative pose: F12 = K^-T [t]x R K^-1 with T12 = T1 T2^-1
    R12 = R1 @ R2.T
    t12 = t1 - R12 @ t2
    E = lie.hat(t12) @ R12
    Kinv = jnp.linalg.inv(K)
    F12 = Kinv.T @ E @ Kinv

    dist = matcher.hamming_matrix(desc1_pm1, desc2_pm1, kp1_free, kp2_free)
    # epipolar distance of kp2 to line F12^T x1
    ones1 = jnp.ones((kp1_xy.shape[0], 1), kp1_xy.dtype)
    x1h = jnp.concatenate([kp1_xy, ones1], -1)
    lines = x1h @ F12  # (K1,3): line in image 2
    num = (lines[:, None, 0] * kp2_xy[None, :, 0]
           + lines[:, None, 1] * kp2_xy[None, :, 1] + lines[:, None, 2])
    den = jnp.maximum(lines[:, 0] ** 2 + lines[:, 1] ** 2, 1e-12)[:, None]
    d2 = num * num / den
    sig2 = level_sigma2[kp2_octave][None, :]
    epi_ok = d2 < 3.84 * sig2
    dist = jnp.where(epi_ok, dist, matcher.BIG_DIST)
    idx2, best = matcher.match_mutual(dist, max_dist=matcher.TH_LOW, ratio=0.9)
    m = idx2 >= 0
    i2 = jnp.where(m, idx2, 0)

    # triangulate
    P1 = K @ jnp.concatenate([R1, t1[:, None]], 1)
    P2 = K @ jnp.concatenate([R2, t2[:, None]], 1)
    from ..solvers.twoview import triangulate_dlt

    X = triangulate_dlt(P1, P2, kp1_xy, kp2_xy[i2])
    finite = jnp.all(jnp.isfinite(X), -1)

    # gates
    c1 = -R1.T @ t1
    c2 = -R2.T @ t2
    r1 = X - c1[None]
    r2 = X - c2[None]
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12)
    z1 = (X @ R1.T + t1)[:, 2]
    z2 = (X @ R2.T + t2)[:, 2]

    def reproj2(R, t, X, xy, sig2):
        Xc = X @ R.T + t
        zi = 1.0 / jnp.maximum(Xc[:, 2], 1e-9)
        u = fx * Xc[:, 0] * zi + cx
        v = fy * Xc[:, 1] * zi + cy
        e2 = (u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2
        return e2 / jnp.maximum(sig2, 1e-12)

    e1 = reproj2(R1, t1, X, kp1_xy, level_sigma2[kp1_octave])
    e2 = reproj2(R2, t2, X, kp2_xy[i2], level_sigma2[kp2_octave[i2]])
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2n = jnp.linalg.norm(r2, axis=-1)
    ratio_dist = d1 / jnp.maximum(d2n, 1e-9)
    ratio_octave = jnp.sqrt(level_sigma2[kp1_octave] /
                            jnp.maximum(level_sigma2[kp2_octave[i2]], 1e-12))
    scale_ok = (ratio_dist < ratio_octave * 1.5) & (ratio_dist * 1.5 > ratio_octave)
    ok = (m & finite & (cos_par < 0.9998) & (cos_par > 0)
          & (z1 > 0) & (z2 > 0) & (e1 < 5.991) & (e2 < 5.991) & scale_ok)
    return idx2, X, ok


@jax.jit
@linalg.f32_matmul
def transform_points(R, t, pts):
    return pts @ R.T + t


TRI_COMPACT_CAP = 2048   # max accepted triangulations shipped per keyframe
FUSE_COMPACT_CAP = 6144  # max fuse matches shipped per keyframe (11 rows
                         # x several hundred matches each on a dense map —
                         # 2048 overflowed at KITTI-scale density and the
                         # silently dropped attachments cost 5x longrun ATE)


@jax.jit
def epipolar_triangulate_batch(
    R1, t1, R2s, t2s, nb_ok, K,
    kp1_xy, kp1_octave, kp1_free, desc1_u8,
    kp2s_xy, kp2s_octave, kp2s_free, desc2s_u8,
    level_sigma2,
):
    """All triangulation neighbors of one keyframe in ONE dispatch.

    `LocalMapping::CreateNewMapPoints` visits each covisible neighbor in a
    serial loop (`src/LocalMapping.cc:217-462`); on the TPU each visit was a
    separate dispatch + blocking readback (one tunnel RTT each). vmapping the
    per-neighbor kernel turns N neighbors into one device program and ONE
    readback. Neighbor axis is padded to a fixed bucket (`nb_ok` masks the
    padding) so the program compiles once. Descriptors come in packed u8
    and unpack on device (keeps the upload 8x smaller and avoids separate
    unpack dispatches)."""
    desc1_pm1 = unpack_bits_to_pm1(desc1_u8)
    desc2s_pm1 = unpack_bits_to_pm1(desc2s_u8)

    def one(R2, t2, ok, kp2_xy, kp2_oct, kp2_free, desc2_pm1):
        idx2, X, good = epipolar_triangulate(
            R1, t1, R2, t2, K, kp1_xy, kp1_octave, kp1_free, desc1_pm1,
            kp2_xy, kp2_oct, kp2_free & ok, desc2_pm1, level_sigma2)
        return idx2, X, good & ok

    idx2, X, good = jax.vmap(one)(R2s, t2s, nb_ok, kp2s_xy, kp2s_octave,
                                  kp2s_free, desc2s_pm1)
    # COMPACT the result on device: the dense (N,K1) arrays are ~350 KB —
    # a ~25-50 ms D2H on a latency-bound link, paid at a fixed landing
    # tick on the frame path. Only accepted candidates matter (~100-600
    # per keyframe); top_k on the flat accept mask selects them in
    # n-major order (ties break by ascending flat index, so the
    # best-covisible neighbor comes first — the consumer's
    # first-neighbor-wins rule is preserved) at a fixed small cap.
    N, K1 = good.shape
    flat_ok = good.reshape(-1)
    cap = min(TRI_COMPACT_CAP, N * K1)
    score = flat_ok.astype(jnp.int32) * (N * K1) - jnp.arange(
        N * K1, dtype=jnp.int32)
    _, sel = jax.lax.top_k(score, cap)
    sel_valid = flat_ok[sel]
    sel_n = (sel // K1).astype(jnp.int32)
    sel_k1 = (sel % K1).astype(jnp.int32)
    sel_idx2 = idx2.reshape(-1)[sel]
    sel_X = X.reshape(-1, 3)[sel]
    # total accept count rides along so the consumer can SEE an overflow
    # (silent truncation reads as "covered everything" when it didn't)
    n_acc = jnp.sum(flat_ok.astype(jnp.int32))
    return sel_n, sel_k1, sel_idx2, sel_X, sel_valid, n_acc


@jax.jit
def fuse_project_batch(
    R2s, t2s, nb_ok, mp_pos, mp_valid, mp_desc_u8,
    kp2s_xy, kp2s_octave, kp2s_valid, desc2s_u8,
    fx, fy, cx, cy, width, height, radius,
):
    """Project one keyframe's landmarks into ALL fuse neighbors in ONE
    dispatch (`LocalMapping::SearchInNeighbors`, src/LocalMapping.cc:464-544
    projects serially per neighbor). Returns (N, P) matched keypoint index
    per neighbor, -1 where unmatched. `mp_valid` masks padded landmark
    slots — without it a padded slot (sentinel position, real descriptor)
    can project in-bounds for some poses and outbid a genuine landmark in
    duplicate resolution."""
    desc2s_pm1 = unpack_bits_to_pm1(desc2s_u8)

    def one(R, t, ok, kxy, koct, kval, kdesc):
        uv, _, pok = project_points(R, t, mp_pos, fx, fy, cx, cy,
                                    width, height)
        idx, _ = match_projected(uv, pok & ok & mp_valid, mp_desc_u8,
                                 kxy, koct, kval & ok, kdesc, radius, None,
                                 max_dist_th=50)
        return idx

    return jax.vmap(one)(R2s, t2s, nb_ok, kp2s_xy, kp2s_octave,
                         kp2s_valid, desc2s_pm1)


@jax.jit
def fuse_project_batch2(
    R2s, t2s, nb_ok, mp_pos, mp_valid, mp_desc_u8,
    kp2s_xy, kp2s_octave, kp2s_valid, desc2s_u8,
    fx, fy, cx, cy, width, height, radius,
):
    """Like fuse_project_batch but with a PER-ROW landmark set
    ((N,P,3) positions / (N,P) validity / (N,P,32) descriptors) — used for
    the bidirectional SearchInNeighbors pass where the reverse row
    projects a different point set (the neighbor union) into the current
    keyframe."""
    desc2s_pm1 = unpack_bits_to_pm1(desc2s_u8)

    def one(R, t, ok, pos, pval, pdesc, kxy, koct, kval, kdesc):
        uv, _, pok = project_points(R, t, pos, fx, fy, cx, cy,
                                    width, height)
        idx, _ = match_projected(uv, pok & ok & pval, pdesc,
                                 kxy, koct, kval & ok, kdesc, radius, None,
                                 max_dist_th=50)
        return idx

    idx = jax.vmap(one)(R2s, t2s, nb_ok, mp_pos, mp_valid, mp_desc_u8,
                        kp2s_xy, kp2s_octave, kp2s_valid, desc2s_pm1)
    # compact matches on device (same rationale + ordering contract as
    # epipolar_triangulate_batch): only (row, landmark, target-keypoint)
    # triples where a match happened ship home, row-major order preserved
    N, P = idx.shape
    flat_ok = (idx >= 0).reshape(-1)
    cap = min(FUSE_COMPACT_CAP, N * P)
    score = flat_ok.astype(jnp.int32) * (N * P) - jnp.arange(
        N * P, dtype=jnp.int32)
    _, sel = jax.lax.top_k(score, cap)
    return ((sel // P).astype(jnp.int32), (sel % P).astype(jnp.int32),
            idx.reshape(-1)[sel], flat_ok[sel],
            jnp.sum(flat_ok.astype(jnp.int32)))


@jax.jit
def fuse_project_batch2_fr(
    R2s, t2s, nb_ok, fwd_pos, fwd_valid, fwd_desc_u8,
    rev_pos, rev_valid, rev_desc_u8,
    kp2s_xy, kp2s_octave, kp2s_valid, desc2s_u8,
    fx, fy, cx, cy, width, height, radius,
):
    """fuse_project_batch2 with the per-row landmark set built ON DEVICE:
    the first N-1 (forward) rows share one landmark set and the final row
    is the reverse pass — materializing the broadcast (N,P,3)/(N,P,32)
    arrays on the host cost ~3.9 MB of H2D per keyframe on the tunnel
    link; here only 2x(P,·) ships and the broadcast is free on device."""
    N = R2s.shape[0]

    def bc(fwd, rev):
        return jnp.concatenate(
            [jnp.broadcast_to(fwd[None], (N - 1,) + fwd.shape),
             rev[None]], 0)

    return fuse_project_batch2(
        R2s, t2s, nb_ok, bc(fwd_pos, rev_pos), bc(fwd_valid, rev_valid),
        bc(fwd_desc_u8, rev_desc_u8),
        kp2s_xy, kp2s_octave, kp2s_valid, desc2s_u8,
        fx, fy, cx, cy, width, height, radius)
