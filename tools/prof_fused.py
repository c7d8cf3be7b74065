"""Decompose the fused-tracking per-frame wall-clock on the TPU tunnel:
upload (host->device image), dispatch+compute (block_until_ready on the
summary), and readback (device->host fetch). Identifies which leg bounds
pipeline fps."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from orbslam_birdview_tpu.frontend import orb
    from orbslam_birdview_tpu.pipeline import fused_track

    H, W = 480, 640
    P = 6144
    cfg = orb.ORBConfig(n_features=2000)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img_u8 = img.astype(np.uint8)

    lm = fused_track.LocalMapDevice(
        pos=jnp.asarray(rng.uniform(-3, 3, (P, 3)).astype(np.float32)
                        + np.array([0, 0, 8], np.float32)),
        normal=jnp.asarray(np.tile(np.array([0, 0, -1], np.float32), (P, 1))),
        min_dist=jnp.full((P,), 0.1, jnp.float32),
        max_dist=jnp.full((P,), 100.0, jnp.float32),
        valid=jnp.ones((P,), bool),
        desc_u8=jnp.asarray(rng.integers(0, 256, (P, 32)).astype(np.uint8)),
    )
    sf = jnp.asarray([1.2 ** l for l in range(8)], dtype=jnp.float32)
    isig = 1.0 / sf ** 2
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)

    def step(img_dev):
        return fused_track.track_step_mono(
            img_dev, R, t, lm, sf, isig, cfg,
            500.0, 500.0, 320.0, 240.0, W, H)

    # warm up / compile
    img_dev = jnp.asarray(img)
    out = step(img_dev)
    _ = np.asarray(out.summary)

    def med(f, n=7):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    up_f32 = med(lambda: jax.block_until_ready(jnp.asarray(img)))
    up_u8 = med(lambda: jax.block_until_ready(jnp.asarray(img_u8)))

    def dispatch_only():
        step(img_dev)

    disp = med(dispatch_only)

    def dispatch_block():
        jax.block_until_ready(step(img_dev).summary)

    dblock = med(dispatch_block)

    out = step(img_dev)
    jax.block_until_ready(out.summary)
    fetch = med(lambda: np.asarray(out.summary))

    def full_sync():
        o = step(jnp.asarray(img))
        np.asarray(o.summary)

    full = med(full_sync)

    # pipelined: dispatch next before fetching previous
    def pipelined(n=16):
        prev = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = step(jnp.asarray(img))
            if prev is not None:
                np.asarray(prev.summary)
            prev = o
        np.asarray(prev.summary)
        return (time.perf_counter() - t0) / n * 1e3

    pipe = pipelined()

    print(f"upload f32 image:        {up_f32:7.1f} ms")
    print(f"upload u8 image:         {up_u8:7.1f} ms")
    print(f"dispatch (async):        {disp:7.1f} ms")
    print(f"dispatch+block summary:  {dblock:7.1f} ms")
    print(f"fetch summary (ready):   {fetch:7.1f} ms")
    print(f"full sync frame:         {full:7.1f} ms")
    print(f"pipelined (lag-1 fetch): {pipe:7.1f} ms/frame")


if __name__ == "__main__":
    main()
