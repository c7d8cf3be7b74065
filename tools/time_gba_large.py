"""Time matrix-free GBA (`bundle_adjust_large`) on TPU at KITTI-like scale.

At C=512 keyframes, P=65536 landmarks the dense-W path would need a 2.4 GB
coupling tensor per LM iteration; the implicit path is O(E).

Usage: env PYTHONPATH="$PYTHONPATH:/root/repo" python tools/time_gba_large.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orbslam_birdview_tpu.graph import ba, ba_large

    rng = np.random.default_rng(0)
    C, P, E = 512, 65536, 262144
    FX = FY = 500.0
    CX, CY = 320.0, 240.0

    cam_t = rng.normal(0, 0.5, (C, 3)).astype(np.float32)
    cam_R = np.broadcast_to(np.eye(3, dtype=np.float32), (C, 3, 3)).copy()
    pts = rng.uniform(-8, 8, (P, 3)).astype(np.float32)
    pts[:, 2] += 12.0
    e_cam = rng.integers(0, C, E)
    e_pt = rng.integers(0, P, E)
    Xc = pts[e_pt] + cam_t[e_cam]
    obs = np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX,
                    FY * Xc[:, 1] / Xc[:, 2] + CY], -1)
    obs += rng.normal(0, 1.0, obs.shape)
    mono = ba.EdgeSet(
        cam=jnp.asarray(e_cam, jnp.int32), pt=jnp.asarray(e_pt, jnp.int32),
        obs=jnp.asarray(obs.astype(np.float32)),
        info=jnp.ones(E, jnp.float32), valid=jnp.ones(E, bool))
    cam_fixed = jnp.zeros(C, bool).at[0].set(True)
    pts_in = jnp.asarray(pts + rng.normal(0, 0.05, pts.shape)
                         .astype(np.float32))

    def run():
        return ba_large.bundle_adjust_large(
            jnp.asarray(cam_R), jnp.asarray(cam_t), cam_fixed,
            jnp.ones(C, bool), pts_in, jnp.ones(P, bool),
            mono, None, None, fx=FX, fy=FY, cx=CX, cy=CY)

    res = jax.block_until_ready(run())
    print("compiled; cost =", float(res.cost),
          "inliers =", int(res.inl_mono.sum()), "/", E)
    REP = 3
    t0 = time.perf_counter()
    for _ in range(REP):
        res = jax.block_until_ready(run())
    dt = (time.perf_counter() - t0) / REP
    print(f"GBA-large C={C} P={P} E={E} (5+10 LM, 48 CG): {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
