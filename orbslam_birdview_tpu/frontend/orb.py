"""TPU-native ORB extraction: pyramid, FAST, orientation, steered BRIEF.

Re-designs `/root/reference/src/ORBextractor.cc` (oriented-FAST + rBRIEF with
octree balancing) as fixed-shape, mask-based JAX:

- pyramid + 7x7 Gaussian blur: conv ops (MXU-friendly), reflect-101 borders
  matching cv::GaussianBlur (`ORBextractor.cc:1084-1090`).
- FAST-9/16: all 16 circle taps as static shifted views, arc test as 16-bit
  mask tricks — pure VPU elementwise, no scalar loops
  (`ORBextractor.cc:765-853` does per-cell serial FAST).
- octree balancing (`DistributeOctTree`, `ORBextractor.cc:539-763`) becomes
  per-cell top-k with rank-penalized global top-k: identical intent (spatially
  uniform best-response keypoints, exact feature budget), TPU-shaped.
- IC_Angle (`ORBextractor.cc:77-105`) and steered BRIEF
  (`computeOrbDescriptor`, `:108-148`) as batched gathers over the level
  image; the 256-pair pattern is the canonical OpenCV table (data, in
  orb_pattern.npy).

Everything is static-shape; invalid slots are masked, never dropped.
"""
from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .keypoints import Keypoints, unpack_bits_to_pm1

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

HALF_PATCH = 15  # orientation patch radius
EDGE_MARGIN = 19  # min distance of a keypoint from the level border

# FAST-16 Bresenham circle (x=col, y=row), OpenCV tap order.
FAST_OFFSETS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

_PATTERN = np.load(Path(__file__).parent / "orb_pattern.npy")  # (256,4) x1,y1,x2,y2


def _umax_table() -> np.ndarray:
    """OpenCV's circular-patch row extents for IC_Angle (ORBextractor.cc:454-469)."""
    umax = np.zeros(HALF_PATCH + 2, dtype=np.int64)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[: HALF_PATCH + 1]


def _ic_angle_offsets():
    """(P,2) int32 (dv, du) offsets inside the circular orientation patch."""
    umax = _umax_table()
    offs = []
    for dv in range(-HALF_PATCH, HALF_PATCH + 1):
        u = int(umax[abs(dv)])
        for du in range(-u, u + 1):
            offs.append((dv, du))
    return np.array(offs, dtype=np.int32)


_IC_OFFSETS = _ic_angle_offsets()  # (~707, 2)


class ORBConfig(NamedTuple):
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold: float = 20.0   # main threshold (iniThFAST)
    min_threshold: float = 7.0     # fallback threshold (minThFAST)
    cell: int = 16                 # spatial-uniformity cell size (px)
    per_cell: int = 4              # candidates kept per cell before global top-k

    def level_scales(self) -> list[float]:
        return [self.scale_factor ** l for l in range(self.n_levels)]

    def level_budgets(self) -> list[int]:
        """Geometric per-level feature budget (ORBextractor.cc:435-446)."""
        f = 1.0 / self.scale_factor
        n0 = self.n_features * (1 - f) / (1 - f ** self.n_levels)
        budgets = [int(round(n0 * f ** l)) for l in range(self.n_levels - 1)]
        budgets.append(max(self.n_features - sum(budgets), 0))
        return budgets

    def padded_capacity(self) -> int:
        """Length of the Keypoints arrays `extract_orb` returns for this
        config: per-level budgets (each ≥1) summed, rounded up to a multiple
        of 128 (TPU lane alignment — see `_extract_impl`). Every per-KF
        feature array (MapStore kp_cap/bird_cap) must be sized from this, or
        raw keypoint indices overflow it at high feature budgets."""
        total = sum(max(b, 1) for b in self.level_budgets())
        return -(-total // 128) * 128


# ---------------------------------------------------------------------------
# Pyramid + blur
# ---------------------------------------------------------------------------

def gaussian_blur7(img):
    """7x7 Gaussian, sigma=2, reflect-101 border — cv::GaussianBlur parity."""
    k1 = np.array([np.exp(-(i * i) / (2 * 2.0 ** 2)) for i in range(-3, 4)])
    k1 = (k1 / k1.sum()).astype(np.float32)
    k = jnp.asarray(k1)
    pad = jnp.pad(img, ((3, 3), (3, 3)), mode="reflect")
    # separable: rows then cols via conv
    x = pad[None, None]  # NCHW
    kr = k.reshape(1, 1, 1, 7)
    kc = k.reshape(1, 1, 7, 1)
    y = jax.lax.conv_general_dilated(x, kr, (1, 1), "VALID")
    y = jax.lax.conv_general_dilated(y, kc, (1, 1), "VALID")
    return y[0, 0]


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Bilinear interpolation as a dense (n_out, n_in) matrix
    (half-pixel centers, matching cv::resize INTER_LINEAR)."""
    A = np.zeros((n_out, n_in), np.float32)
    src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(src).astype(int)
    a = (src - i0).astype(np.float32)
    i0c = np.clip(i0, 0, n_in - 1)
    i1c = np.clip(i0 + 1, 0, n_in - 1)
    np.add.at(A, (np.arange(n_out), i0c), 1.0 - a)
    np.add.at(A, (np.arange(n_out), i1c), a)
    return A


def resize_bilinear(img, h: int, w: int):
    """cv::resize INTER_LINEAR equivalent (half-pixel centers).

    Implemented as two constant-matrix matmuls (A_h @ img @ A_wᵀ): the
    gather-based `jax.image.resize` costs ~125µs per pyramid level on TPU
    while the MXU does the same interpolation in single-digit µs."""
    H, W = img.shape
    Ah = jnp.asarray(_resize_matrix(h, H))
    Aw = jnp.asarray(_resize_matrix(w, W))
    return Ah @ img @ Aw.T


def level_sizes(h: int, w: int, cfg: ORBConfig) -> list[tuple[int, int]]:
    return [
        (int(round(h / s)), int(round(w / s))) for s in cfg.level_scales()
    ]


# ---------------------------------------------------------------------------
# FAST
# ---------------------------------------------------------------------------

def _circle_views(img):
    """Return (16, H, W) stack of the 16 circle-tap images."""
    pad = jnp.pad(img, ((3, 3), (3, 3)), mode="edge")
    H, W = img.shape
    views = [
        jax.lax.dynamic_slice(pad, (3 + int(dy), 3 + int(dx)), (H, W))
        for dx, dy in FAST_OFFSETS
    ]
    return jnp.stack(views, axis=0)


_ARC_PATTERNS = np.array(
    [(((0x1FF << k) | (0x1FF >> (16 - k))) & 0xFFFF) for k in range(16)],
    dtype=np.int32,
)


def fast_response(img, threshold):
    """FAST-9/16 corner mask + response.

    Returns (response (H,W) float32, corner (H,W) bool). Response is the
    bright/dark excess sum (original FAST score), 0 where not a corner.
    """
    taps = _circle_views(img)  # (16,H,W)
    c = img[None]
    bright = taps > c + threshold
    dark = taps < c - threshold
    weights = (1 << np.arange(16)).astype(np.int32)
    wb = jnp.asarray(weights)[:, None, None]
    bbits = jnp.sum(bright.astype(jnp.int32) * wb, axis=0)
    dbits = jnp.sum(dark.astype(jnp.int32) * wb, axis=0)
    patt = jnp.asarray(_ARC_PATTERNS)
    is_b = jnp.zeros(img.shape, dtype=bool)
    is_d = jnp.zeros(img.shape, dtype=bool)
    for p in range(16):
        pk = patt[p]
        is_b = is_b | ((bbits & pk) == pk)
        is_d = is_d | ((dbits & pk) == pk)
    corner = is_b | is_d
    sb = jnp.sum(jnp.where(bright, taps - c - threshold, 0.0), axis=0)
    sd = jnp.sum(jnp.where(dark, c - taps - threshold, 0.0), axis=0)
    resp = jnp.where(is_b, sb, 0.0) + jnp.where(is_d, sd, 0.0)
    return resp, corner


def nms3(resp):
    """3x3 non-max suppression; keeps ties."""
    m = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(resp >= m, resp, 0.0)


# ---------------------------------------------------------------------------
# Spatially-uniform top-k selection (octree replacement)
# ---------------------------------------------------------------------------

def _resp_to_cells(resp, cell: int):
    """(H,W) response -> ((ncells, cell²) rows, ncy, ncx)."""
    H, W = resp.shape
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    r = jnp.pad(resp, ((0, Hp - H), (0, Wp - W)), constant_values=0.0)
    ncy, ncx = Hp // cell, Wp // cell
    cells = r.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(
        ncy * ncx, cell * cell
    )
    return cells, ncy, ncx


def _cells_topk(cells, per_cell: int):
    """Per-cell top-k by iterated max: per_cell is tiny (4), so 4 masked
    max/argmax sweeps on the VPU beat lax.top_k's full 256-lane sort.
    Returns (vals (ncells,per_cell), idx (ncells,per_cell))."""
    lanes = jnp.arange(cells.shape[1], dtype=jnp.int32)
    rem = cells
    vals_l, idx_l = [], []
    for _ in range(per_cell):
        i = jnp.argmax(rem, axis=1)
        vals_l.append(jnp.take_along_axis(rem, i[:, None], axis=1)[:, 0])
        idx_l.append(i)
        rem = jnp.where(lanes[None, :] == i[:, None], -jnp.inf, rem)
    return jnp.stack(vals_l, axis=1), jnp.stack(idx_l, axis=1)


def _pick_topk(vals, idx, k_out: int, cell: int, ncx: int):
    """Global rank-penalized top-k over one level's per-cell candidates.

    Rank by (rank-in-cell asc, response desc) so every cell's best is
    preferred over any cell's second-best — the same uniformity contract as
    the reference's quad-tree (`DistributeOctTree`)."""
    per_cell = vals.shape[1]
    valid_cand = vals > 0.0
    rank_pen = jnp.arange(per_cell, dtype=vals.dtype) * jnp.asarray(1e7, vals.dtype)
    comp = jnp.where(valid_cand, vals - rank_pen[None, :], -jnp.inf)
    flat_comp = comp.reshape(-1)
    # approx_max_k: TPU-optimized partial reduction (exact top_k pays a
    # full sort of every candidate). Recall 0.97 only ever swaps near-tie
    # keypoints at the budget boundary — the same class of arbitrariness
    # the reference's octree tie-breaking has (DistributeOctTree,
    # ORBextractor.cc:539-763). Falls back to exact top-k off-TPU.
    top_comp, top_idx = jax.lax.approx_max_k(
        flat_comp, k_out, recall_target=0.97)
    cell_id = top_idx // per_cell
    pix = jnp.take(idx.reshape(-1), top_idx)
    cy, cx = cell_id // ncx, cell_id % ncx
    dy, dx = pix // cell, pix % cell
    ys = cy * cell + dy
    xs = cx * cell + dx
    valid = top_comp > -jnp.inf / 2
    resp_out = jnp.take(vals.reshape(-1), top_idx)
    return ys, xs, jnp.where(valid, resp_out, 0.0), valid


def select_uniform_topk(resp, k_out: int, cell: int, per_cell: int):
    """Pick k_out keypoints, spatially balanced (see _pick_topk).
    Returns (ys, xs, resp_out, valid)."""
    cells, _, ncx = _resp_to_cells(resp, cell)
    vals, idx = _cells_topk(cells, per_cell)
    return _pick_topk(vals, idx, k_out, cell, ncx)


# ---------------------------------------------------------------------------
# Orientation + BRIEF — patch-based, gather-free
#
# TPU pixel gathers are scalar-unit bound (~11 ms for 2048x512 samples); the
# patch formulation replaces them with (a) vmapped contiguous dynamic-slice
# patch extraction (~1.6 ms for 2048x64x64) and (b) one-hot row/column
# selection expressed as batched matmuls on the MXU (~1.8 ms), preserving the
# reference's exact nearest-pixel rotated-sampling semantics
# (`computeOrbDescriptor`, ORBextractor.cc:108-148).
# ---------------------------------------------------------------------------

PATCH = 48          # patch side; center pixel at (24, 24)
PATCH_C = 24        # covers BRIEF's rotated reach (±18) + blur margin (±3)
BLUR_PATCH = PATCH - 6   # after VALID 7x7 blur; center at 29
BLUR_C = PATCH_C - 3


def extract_patches(img, ys, xs, size: int = PATCH):
    """(K,) int coords -> (K,size,size) patches centered at (y,x).

    On TPU: per-keypoint HBM→VMEM DMAs (Pallas, see patch_kernel.py) —
    the XLA gather this replaces ran at ~17 GB/s effective (1.9 ms/frame).
    Elsewhere: contiguous dynamic slices on an edge-padded image."""
    from . import patch_kernel

    pad = size // 2
    padded = jnp.pad(img, pad, mode="edge")
    if patch_kernel.pallas_patches_enabled():
        return patch_kernel.gather_patches(padded, ys, xs, size)

    def sl(y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (size, size))
    return jax.vmap(sl)(ys, xs)


@functools.lru_cache(maxsize=None)
def _blur_matrix(n_in: int) -> np.ndarray:
    """Banded (n_in−6, n_in) matrix applying the 7-tap Gaussian (sigma=2)
    as a VALID 1D convolution."""
    k1 = np.array([np.exp(-(i * i) / (2 * 2.0 ** 2)) for i in range(-3, 4)])
    k1 = (k1 / k1.sum()).astype(np.float32)
    n_out = n_in - 6
    B = np.zeros((n_out, n_in), np.float32)
    for j in range(7):
        B[np.arange(n_out), np.arange(n_out) + j] = k1[j]
    return B


def blur_patches(patches):
    """7x7 Gaussian (sigma=2) per patch, VALID — identical to blurring the
    whole image then slicing (away from image borders).

    Implemented as two banded constant matmuls (B @ patch @ Bᵀ) instead of
    1-channel convolutions: XLA lowers C=1 convs at ~1/128 MXU utilization
    (~2.5 ms/frame measured); the matmul form runs in the MXU's sweet spot."""
    S = patches.shape[-1]
    B = jnp.asarray(_blur_matrix(S))
    y = jnp.einsum("oi,kij->koj", B, patches)
    return jnp.einsum("koj,pj->kop", y, B)


def _ic_weights():
    """Dense (31,31) du/dv weight masks for the circular IC patch."""
    du = np.zeros((31, 31), np.float32)
    dv = np.zeros((31, 31), np.float32)
    for v, u in _IC_OFFSETS:
        du[v + 15, u + 15] = u
        dv[v + 15, u + 15] = v
    return du, dv


_IC_DU, _IC_DV = _ic_weights()


def ic_angle_from_patches(patches):
    """(K,S,S) raw patches -> orientation (K,) radians [0,2π)."""
    c = PATCH_C
    sub = patches[:, c - 15 : c + 16, c - 15 : c + 16]
    m10 = jnp.einsum("kij,ij->k", sub, jnp.asarray(_IC_DU))
    m01 = jnp.einsum("kij,ij->k", sub, jnp.asarray(_IC_DV))
    ang = jnp.arctan2(m01, m10)
    return jnp.where(ang < 0, ang + 2 * jnp.pi, ang)


def brief_from_patches(patches_blur, angle):
    """Steered BRIEF-256 from blurred patches (K,Sb,Sb) centered at BLUR_C.

    Rotated integer offsets select samples via one-hot row/col matmuls —
    exact nearest-pixel parity with the reference, zero gathers."""
    S = patches_blur.shape[-1]
    px = jnp.asarray(_PATTERN[:, [0, 2]].T.reshape(-1).astype(np.float32))
    py = jnp.asarray(_PATTERN[:, [1, 3]].T.reshape(-1).astype(np.float32))
    a = jnp.cos(angle)[:, None]
    b = jnp.sin(angle)[:, None]
    rx = jnp.round(px[None, :] * a - py[None, :] * b).astype(jnp.int32)
    ry = jnp.round(px[None, :] * b + py[None, :] * a).astype(jnp.int32)
    row = jnp.clip(BLUR_C + ry, 0, S - 1)  # (K,512)
    col = jnp.clip(BLUR_C + rx, 0, S - 1)
    iota = jnp.arange(S, dtype=jnp.int32)
    # blurred samples are compared as integers, exactly like the reference
    # (cv2 blurs the uint8 image in place, ORBextractor.cc:1084-1090);
    # integers ≤ 256 are exact in bf16, so the one-hot selection chain runs
    # entirely in bf16 — halving the HBM traffic of the (K,512,S) tensors,
    # the dominant BRIEF cost — while staying bit-exact
    pb = jnp.round(patches_blur).astype(jnp.bfloat16)
    rowsel = (row[:, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
    colsel = (col[:, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        rowsel, pb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.bfloat16,
    )  # (K,512,S)
    samp = jnp.sum(rows * colsel, axis=-1)  # (K,512); one nonzero per lane
    bits = (samp[:, :256] < samp[:, 256:]).astype(jnp.uint8)
    return jnp.packbits(bits, axis=-1, bitorder="little")


def ic_angle(img, ys, xs):
    """Intensity-centroid orientation at integer coords (API kept for tests;
    uses the patch path)."""
    return ic_angle_from_patches(extract_patches(img, ys, xs))


def brief_descriptors(img_blur, ys, xs, angle):
    """Steered BRIEF-256 at integer coords on an already-blurred image."""
    pad = BLUR_PATCH // 2
    padded = jnp.pad(img_blur, pad, mode="edge")
    def sl(y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (BLUR_PATCH, BLUR_PATCH))
    patches = jax.vmap(sl)(ys, xs)
    # patches centered at (pad,pad) = (29,29) == BLUR_C
    return brief_from_patches(patches, angle)


def _subpixel_offsets(resp, ys, xs):
    """1D parabola fits on the detector response around each corner.
    Returns (dx, dy) in (−0.5, 0.5)."""
    H, W = resp.shape
    yc = jnp.clip(ys, 1, H - 2)
    xc = jnp.clip(xs, 1, W - 2)

    def fit(m, c, p):
        denom = 2.0 * (2.0 * c - m - p)
        off = (p - m) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1e-6)
        return jnp.clip(off, -0.5, 0.5)

    c = resp[yc, xc]
    dx = fit(resp[yc, xc - 1], c, resp[yc, xc + 1])
    dy = fit(resp[yc - 1, xc], c, resp[yc + 1, xc])
    # NMS zeroes the neighbors of isolated maxima; only refine when both
    # neighbors carry response
    okx = (resp[yc, xc - 1] > 0) & (resp[yc, xc + 1] > 0)
    oky = (resp[yc - 1, xc] > 0) & (resp[yc + 1, xc] > 0)
    return jnp.where(okx, dx, 0.0), jnp.where(oky, dy, 0.0)


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------

def _border_mask(h: int, w: int, margin: int):
    m = np.zeros((h, w), dtype=bool)
    if h > 2 * margin and w > 2 * margin:
        m[margin : h - margin, margin : w - margin] = True
    return jnp.asarray(m)


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def _extract_impl(img, mask, cfg: ORBConfig, height: int, width: int):
    sizes = level_sizes(height, width, cfg)
    budgets = cfg.level_budgets()
    scales = cfg.level_scales()

    out_xy, out_resp, out_patch, out_oct, out_val = [], [], [], [], []
    # integer-valued pyramid: cv::ORB keeps every level in uint8
    # (ComputePyramid, ORBextractor.cc:1107-1132), so rounding the bilinear
    # resize output matches the reference AND makes the bf16 patch-gather
    # DMA path bit-exact (integers ≤ 256 are exact in bf16)
    # (NOTE: selection stays per-level — concatenating all levels' cells
    # for one batched sweep was tried and measured neutral-to-worse: the
    # concat forces materialization that blocks XLA's per-level fusion)
    lvl_img = jnp.round(img)
    for l in range(cfg.n_levels):
        h, w = sizes[l]
        if l > 0:
            lvl_img = jnp.round(resize_bilinear(lvl_img, h, w))
        resp, corner = fast_response(lvl_img, cfg.min_threshold)
        resp = jnp.where(corner, resp, 0.0)
        resp = resp * _border_mask(h, w, EDGE_MARGIN)
        if mask is not None:
            lvl_mask = resize_bilinear(mask.astype(jnp.float32), h, w) > 0.5
            resp = jnp.where(lvl_mask, resp, 0.0)
        resp_raw = resp
        resp = nms3(resp)
        k_l = max(budgets[l], 1)
        ys, xs, r, valid = select_uniform_topk(resp, k_l, cfg.cell, cfg.per_cell)
        patches = extract_patches(lvl_img, ys, xs)
        # subpixel refinement: quadratic fit on the response surface — the
        # reference runs cv::cornerSubPix on the BEV stream
        # (`src/Frame.cc:334-340`); we refine both streams
        dx, dy = _subpixel_offsets(resp_raw, ys, xs)
        s = scales[l]
        xy0 = jnp.stack([(xs.astype(jnp.float32) + dx) * s,
                         (ys.astype(jnp.float32) + dy) * s], -1)
        out_xy.append(xy0)
        out_resp.append(r)
        out_patch.append(patches)
        out_oct.append(jnp.full((k_l,), l, dtype=jnp.int32))
        out_val.append(valid)

    xy = jnp.concatenate(out_xy, 0)
    response = jnp.concatenate(out_resp, 0)
    octave = jnp.concatenate(out_oct, 0)
    valid = jnp.concatenate(out_val, 0)
    # orientation + BRIEF once over ALL levels' patches: one big batched
    # einsum/matmul set instead of 8 small ones (per-op overheads and tile
    # padding waste shrink with batch size)
    patches_all = jnp.concatenate(out_patch, 0)
    angle = ic_angle_from_patches(patches_all)
    desc_u8 = brief_from_patches(blur_patches(patches_all), angle)

    # pad total capacity to a multiple of 128 (TPU lane alignment)
    total = xy.shape[0]
    cap = -(-total // 128) * 128
    pad = cap - total
    if pad:
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        response = jnp.pad(response, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        octave = jnp.pad(octave, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        desc_u8 = jnp.pad(desc_u8, ((0, pad), (0, 0)))

    desc_u8 = jnp.where(valid[:, None], desc_u8, 0)
    desc_pm1 = jnp.where(valid[:, None], unpack_bits_to_pm1(desc_u8), 0)
    return Keypoints(
        xy=xy,
        response=jnp.where(valid, response, -jnp.inf),
        angle=angle,
        octave=octave,
        valid=valid,
        desc_u8=desc_u8,
        desc_pm1=desc_pm1,
    )


def extract_orb(img, cfg: ORBConfig = ORBConfig(), mask=None) -> Keypoints:
    """Extract ORB features from a grayscale image (H,W) float32 in [0,255].

    `mask`, if given, restricts detection (nonzero = allowed) — used by the
    BEV stream (`/root/reference/src/Frame.cc:328-342`).
    """
    img = jnp.asarray(img, dtype=jnp.float32)
    h, w = img.shape
    return _extract_impl(img, mask, cfg, h, w)
