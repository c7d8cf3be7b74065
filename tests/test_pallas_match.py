"""Fused Pallas matcher vs the XLA reference path (interpret mode on CPU;
the same kernel compiles for TPU via Mosaic)."""
import jax.numpy as jnp
import numpy as np

from orbslam_birdview_tpu.frontend import matcher, pallas_match


def test_fused_matcher_agrees_with_xla(rng):
    M = N = 512
    pt_desc = jnp.asarray((rng.integers(0, 2, (M, 256)) * 2 - 1).astype(np.int8))
    kp_desc = jnp.asarray((rng.integers(0, 2, (N, 256)) * 2 - 1).astype(np.int8))
    pt_uv = jnp.asarray(rng.uniform(0, 600, (M, 2)).astype(np.float32))
    kp_xy = jnp.asarray(rng.uniform(0, 600, (N, 2)).astype(np.float32))
    pt_rad = jnp.full(M, 80.0, jnp.float32)
    pt_oct = jnp.asarray(rng.integers(0, 8, M).astype(np.int32))
    kp_oct = jnp.asarray(rng.integers(0, 8, N).astype(np.int32))
    pt_ok = jnp.asarray(rng.uniform(size=M) > 0.1)
    kp_ok = jnp.asarray(rng.uniform(size=N) > 0.1)
    ridx, rdist = matcher.search_by_projection(
        pt_uv, pt_ok, pt_desc, kp_xy, kp_oct, kp_ok, kp_desc,
        pt_rad, pt_oct, max_dist=1 << 13)
    pidx, pdist = pallas_match.fused_search_by_projection(
        pt_desc, pt_uv, pt_rad, pt_oct, pt_ok,
        kp_desc, kp_xy, kp_oct, kp_ok, interpret=True)
    ridx, pidx = np.asarray(ridx), np.asarray(pidx)
    assert (ridx == pidx).mean() == 1.0
    m = ridx >= 0
    np.testing.assert_array_equal(np.asarray(rdist)[m],
                                  np.asarray(pdist)[m].astype(np.int32))


def test_patch_gather_kernel_interpret(rng):
    """DMA patch gather (interpret mode) matches the XLA dynamic-slice path,
    including clamped out-of-range offsets."""
    import jax
    import jax.numpy as jnp

    from orbslam_birdview_tpu.frontend import patch_kernel

    # integer-valued image: the kernel's bf16 DMA is exact for integers
    # ≤ 256 (the ORB pyramid is integer-valued; see orb._extract_impl)
    img = jnp.asarray(rng.integers(0, 256, (120, 160)).astype("float32"))
    padded = jnp.pad(img, 24, mode="edge")
    ys = jnp.asarray(rng.integers(-5, 140, 53).astype("int32"))
    xs = jnp.asarray(rng.integers(-5, 180, 53).astype("int32"))
    out = patch_kernel.gather_patches(padded, ys, xs, 48, interpret=True)
    yc = jnp.clip(ys, 0, padded.shape[0] - 48)
    xc = jnp.clip(xs, 0, padded.shape[1] - 48)
    ref = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(padded, (y, x), (48, 48))
    )(yc, xc)
    assert bool(jnp.all(out == ref))
