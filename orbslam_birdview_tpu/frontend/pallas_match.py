"""Pallas TPU kernel: fused descriptor matching.

`matcher.search_by_projection` is the per-frame hot loop: an (M,256)x(N,256)
int8 Hamming matmul followed by window/octave masking and a row argmin. In
pure XLA the (M,N) distance matrix round-trips through HBM (16 MB at
2048x2048 int32). This kernel fuses the whole thing: each grid step loads a
tile of map-point descriptors into VMEM, runs the ±1 dot on the MXU, applies
the geometric masks and reduces to (best index, best distance) per row
without ever materializing the matrix.

Mosaic constraint: sub-32-bit 1D vectors can't get minor dims inserted, so
all per-row scalars travel as (·,1) float32.

Falls back to interpret mode off-TPU (tests run on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = float(1 << 14)


def _match_kernel(pt_desc_ref, pt_meta_ref, kp_desc_ref, kp_meta_ref,
                  idx_ref, dist_ref):
    """pt_desc (Tm,256) bf16 ±1; kp_desc (256,N) bf16 ±1 (pre-transposed).
    pt_meta (Tm,8) f32: [u, v, radius, octave, valid, 0,0,0]
    kp_meta (N,8) f32: [x, y, octave, valid, 0,0,0,0]
    out: idx (Tm,1) i32, dist (Tm,1) f32.

    ±1 entries and the 256-term accumulation are exact in f32, so the
    Hamming distances are bit-exact."""
    dots = jax.lax.dot_general(
        pt_desc_ref[:], kp_desc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tm, N)
    dist = (256.0 - dots) * 0.5
    pt_u = pt_meta_ref[:, 0:1]
    pt_v = pt_meta_ref[:, 1:2]
    pt_rad = pt_meta_ref[:, 2:3]
    pt_oct = pt_meta_ref[:, 3:4]
    pt_ok = pt_meta_ref[:, 4:5]
    kp_x = kp_meta_ref[:, 0:1].reshape(1, -1)
    kp_y = kp_meta_ref[:, 1:2].reshape(1, -1)
    kp_oct = kp_meta_ref[:, 2:3].reshape(1, -1)
    kp_ok = kp_meta_ref[:, 3:4].reshape(1, -1)
    du = pt_u - kp_x
    dv = pt_v - kp_y
    d2 = du * du + dv * dv
    ok = (
        (d2 <= pt_rad * pt_rad)
        & (jnp.abs(kp_oct - pt_oct) <= 1.0)
        & (pt_ok > 0.5)
        & (kp_ok > 0.5)
    )
    distf = jnp.where(ok, dist, BIG)
    best = jnp.min(distf, axis=1, keepdims=True)
    # argmin via min-of-iota-where-minimal (cheaper Mosaic lowering than argmin)
    n = distf.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, distf.shape, 1)
    cand = jnp.where(distf <= best, col, n)
    bidx = jnp.min(cand, axis=1, keepdims=True)
    dist_ref[:] = best
    idx_ref[:] = jnp.where(best < BIG, bidx, -1)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def fused_search_by_projection(
    pt_desc_pm1, pt_uv, pt_radius, pt_octave, pt_valid,
    kp_desc_pm1, kp_xy, kp_octave, kp_valid,
    tile_m: int = 256,
    interpret: bool = False,
):
    """Returns (idx (M,) int32 into keypoints or −1, dist (M,) float32).

    Equivalent to matcher.search_by_projection with an octave window of ±1
    (before duplicate-target resolution and distance thresholding, which the
    caller applies)."""
    M = pt_desc_pm1.shape[0]
    N = kp_desc_pm1.shape[0]
    f32 = jnp.float32
    pt_meta = jnp.zeros((M, 8), f32)
    pt_meta = pt_meta.at[:, 0].set(pt_uv[:, 0]).at[:, 1].set(pt_uv[:, 1])
    pt_meta = pt_meta.at[:, 2].set(pt_radius.astype(f32))
    pt_meta = pt_meta.at[:, 3].set(pt_octave.astype(f32))
    pt_meta = pt_meta.at[:, 4].set(pt_valid.astype(f32))
    kp_meta = jnp.zeros((N, 8), f32)
    kp_meta = kp_meta.at[:, 0].set(kp_xy[:, 0]).at[:, 1].set(kp_xy[:, 1])
    kp_meta = kp_meta.at[:, 2].set(kp_octave.astype(f32))
    kp_meta = kp_meta.at[:, 3].set(kp_valid.astype(f32))

    grid = (M // tile_m,)
    idx, dist = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        interpret=interpret,
    )(pt_desc_pm1.astype(jnp.float32), pt_meta,
      kp_desc_pm1.T.astype(jnp.float32), kp_meta)
    return idx[:, 0], dist[:, 0]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
