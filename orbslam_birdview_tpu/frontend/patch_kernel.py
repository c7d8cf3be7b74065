"""Pallas patch-gather kernel: per-keypoint square windows out of an image.

`extract_patches` is the front-end's hottest memory op (2000 windows/frame).
XLA lowers the vmapped `dynamic_slice` to a gather that runs at ~17 GB/s
effective on TPU (~1.9 ms/frame measured). Here each keypoint's window is
DMA'd HBM→VMEM and shifted into place on the MXU:

- Mosaic requires DMA starts aligned to the (8, 128) f32 tile, so the copy
  fetches the aligned (56, 256) window containing the patch;
- the residual (dy, dx) shift becomes two one-hot shift matrices built from
  iota comparisons in VMEM — out = R(48×56) @ W @ C(256×48) on the MXU —
  so the unaligned gather never exists anywhere;
- 8 keypoints per grid step with per-slot semaphores keep several DMAs in
  flight (per-DMA issue latency would otherwise dominate).

Offsets arrive via scalar prefetch (`PrefetchScalarGridSpec`), available
before the body runs. Re-designs the patch accesses implicit in the
reference's `IC_Angle` / `computeOrbDescriptor`
(`/root/reference/src/ORBextractor.cc:77-148`), which walk `cv::Mat` row
pointers on the CPU.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 8          # keypoints per grid step
WIN_R = 56      # aligned window rows: 48 + (ys % 8), rounded to 8
WIN_C = 256     # aligned window cols: 48 + (xs % 128), rounded to 128


def _patch_kernel(ys_ref, xs_ref, img_ref, out_ref, win, sems, *, size):
    b = pl.program_id(0)

    def dma(j):
        y = ys_ref[b * BK + j]
        x = xs_ref[b * BK + j]
        return pltpu.make_async_copy(
            img_ref.at[pl.ds((y // 8) * 8, WIN_R),
                       pl.ds((x // 128) * 128, WIN_C)],
            win.at[j],
            sems.at[j],
        )

    for j in range(BK):
        dma(j).start()

    ir = jax.lax.broadcasted_iota(jnp.int32, (size, WIN_R), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (size, WIN_R), 1)
    ic = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, size), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, size), 1)
    for j in range(BK):
        dma(j).wait()
        dy = ys_ref[b * BK + j] % 8
        dx = xs_ref[b * BK + j] % 128
        R = (jr == ir + dy).astype(jnp.float32)           # (size, WIN_R)
        C = (ic == jc + dx).astype(jnp.float32)           # (WIN_C, size)
        rows = jax.lax.dot_general(
            R, win[j], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (size, WIN_C)
        out_ref[j] = jax.lax.dot_general(
            rows, C, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (size, size)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def gather_patches(padded_img, ys, xs, size: int, interpret: bool = False):
    """(Hp,Wp) f32, (K,) int32 top-left coords -> (K,size,size) f32."""
    assert size <= WIN_R - 7 and size <= WIN_C - 127
    k = ys.shape[0]
    kb = -(-k // BK)
    kpad = kb * BK - k
    # dynamic_slice clamps out-of-range starts; match that (padded keypoint
    # slots may carry arbitrary coords)
    ys = jnp.clip(ys.astype(jnp.int32), 0, padded_img.shape[0] - size)
    xs = jnp.clip(xs.astype(jnp.int32), 0, padded_img.shape[1] - size)
    if kpad:
        ys = jnp.pad(ys, (0, kpad))
        xs = jnp.pad(xs, (0, kpad))
    # grow the image so every aligned window is in-bounds (content of the
    # overhang never reaches the output: the shift matrices zero it)
    hp = padded_img.shape[0] + WIN_R
    wp = padded_img.shape[1] + WIN_C
    img = jnp.pad(padded_img,
                  ((0, hp - padded_img.shape[0]), (0, wp - padded_img.shape[1])))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (BK, size, size), lambda b, ys, xs: (b, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BK, WIN_R, WIN_C), jnp.float32),
            pltpu.SemaphoreType.DMA((BK,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_patch_kernel, size=size),
        out_shape=jax.ShapeDtypeStruct((kb * BK, size, size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ys, xs, img.astype(jnp.float32))
    return out[:k]


@functools.lru_cache(maxsize=1)
def pallas_patches_enabled() -> bool:
    """Use the DMA kernel on real TPU backends unless explicitly disabled;
    the XLA gather path remains the fallback everywhere else."""
    env = os.environ.get("OSB_PALLAS_PATCHES", "").lower()
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "true"):
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
