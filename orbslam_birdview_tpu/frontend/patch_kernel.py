"""Pallas patch-gather kernel: per-keypoint square windows out of an image.

`extract_patches` is the front-end's hottest memory op (2000 windows/frame).
XLA lowers the vmapped `dynamic_slice` to a gather that runs at ~17 GB/s
effective on TPU (~1.9 ms/frame measured). Here each keypoint's window is
DMA'd HBM→VMEM and shifted into place on the MXU:

- Mosaic requires DMA starts aligned to the dtype tile — (16, 128) for
  bf16 — so the copy fetches the aligned (64, 128) window containing the
  patch. A single 128-lane tile suffices because the kernel reads from a
  stacked pair [image; image shifted left by 64 px]: picking the copy by
  `x % 128 >= 64` bounds the residual column shift to 0..63, and
  63 + 48 ≤ 128. (The f32 single-copy predecessor fetched (56, 256) = 57 KB
  per patch; this fetches 16 KB.)
- the image is bf16: pyramid levels are integer-valued (see
  `orb._extract_impl`, matching cv::ORB's uint8 pyramid), and bf16 holds
  integers ≤ 256 exactly, so the gather is bit-exact while halving DMA bytes;
- the residual (dy, dx) shift becomes two one-hot shift matrices built from
  iota comparisons in VMEM — out = R(48×64) @ W @ C(128×48) on the MXU —
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

BK = 16         # keypoints per grid step
WIN_R = 64      # aligned window rows: 48 + (ys % 16), rounded to 16 (bf16 tile)
WIN_C = 128     # one lane tile (shifted-copy trick bounds dx to 0..63)


def _window_kernel(ys_ref, xs_ref, img_ref, out_ref, sems, *, h2):
    """Pure DMA pump: per keypoint, copy its aligned (64,128) bf16 window
    HBM→VMEM output block. The residual (dy,dx) shift happens OUTSIDE the
    kernel as two big batched one-hot matmuls over all K windows at once —
    XLA runs those at full MXU batch efficiency, where per-window matmuls
    unrolled inside the kernel paid ~16 small-op issue latencies per grid
    step (measured 0.64 → ~0.35 ms/frame for 2112 patches)."""
    b = pl.program_id(0)

    def dma(j):
        y = ys_ref[b * BK + j]
        x = xs_ref[b * BK + j]
        sel = (x % 128 >= 64).astype(jnp.int32)   # use the −64-shifted copy
        xs_ = x - 64 * sel
        return pltpu.make_async_copy(
            img_ref.at[pl.ds((y // 16) * 16 + sel * h2, WIN_R),
                       pl.ds((xs_ // 128) * 128, WIN_C)],
            out_ref.at[j],
            sems.at[j],
        )

    for j in range(BK):
        dma(j).start()
    for j in range(BK):
        dma(j).wait()


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def gather_patches(padded_img, ys, xs, size: int, interpret: bool = False):
    """(Hp,Wp) f32, (K,) int32 top-left coords -> (K,size,size) f32.

    Exact for integer-valued images (the ORB pyramid is; see module doc);
    non-integer inputs are rounded to bf16."""
    assert size <= WIN_R - 15 and size <= WIN_C - 63
    k = ys.shape[0]
    kb = -(-k // BK)
    kpad = kb * BK - k
    Hp, Wp = padded_img.shape
    # dynamic_slice clamps out-of-range starts; match that (padded keypoint
    # slots may carry arbitrary coords)
    ys = jnp.clip(ys.astype(jnp.int32), 0, Hp - size)
    xs = jnp.clip(xs.astype(jnp.int32), 0, Wp - size)
    if kpad:
        ys = jnp.pad(ys, (0, kpad))
        xs = jnp.pad(xs, (0, kpad))
    # stacked pair [image; image << 64 px], each padded so every aligned
    # (64,128) window is in-bounds (overhang content never reaches the
    # output: the shift matrices zero it)
    h2 = -(-(Hp + 16) // 16) * 16
    w2 = (-(-Wp // 128) + 1) * 128
    imgq = padded_img.astype(jnp.bfloat16)
    a = jnp.pad(imgq, ((0, h2 - Hp), (0, w2 - Wp)))
    bsh = jnp.pad(imgq[:, 64:], ((0, h2 - Hp), (0, w2 - (Wp - 64))))
    stacked = jnp.concatenate([a, bsh], axis=0)           # (2*h2, w2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (BK, WIN_R, WIN_C), lambda b, ys, xs: (b, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((BK,)),
        ],
    )
    win = pl.pallas_call(
        functools.partial(_window_kernel, h2=h2),
        out_shape=jax.ShapeDtypeStruct((kb * BK, WIN_R, WIN_C), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ys, xs, stacked)

    # residual (dy,dx) shift: batched one-hot matmuls over all K windows.
    # bf16 one-hot selects of integer pixels ≤ 256 are exact; the final
    # f32 accumulate makes the output bit-equal to the dynamic-slice path.
    sel = (xs % 128 >= 64).astype(jnp.int32)
    dy = ys % 16
    dx = (xs - 64 * sel) % 128
    i_sz = jnp.arange(size, dtype=jnp.int32)
    i_r = jnp.arange(WIN_R, dtype=jnp.int32)
    i_c = jnp.arange(WIN_C, dtype=jnp.int32)
    R = (i_r[None, None, :] == i_sz[None, :, None]
         + dy[:, None, None]).astype(jnp.bfloat16)         # (K,size,WIN_R)
    C = (i_c[None, None, :] == i_sz[None, :, None]
         + dx[:, None, None]).astype(jnp.bfloat16)         # (K,size,WIN_C)
    rows = jax.lax.dot_general(
        R, win, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.bfloat16)               # (K,size,WIN_C)
    out = jax.lax.dot_general(
        rows, C, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (K,size,size)
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
