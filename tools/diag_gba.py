"""Diagnose GBA-large LM trajectory: per-iteration cost + accept pattern.

Run on TPU (default env) and CPU (JAX_PLATFORMS=cpu) and compare.
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orbslam_birdview_tpu.core import lie
    from orbslam_birdview_tpu.graph import ba, ba_large

    rng = np.random.default_rng(0)
    C, P, E = 512, 65536, 262144
    FX = FY = 500.0
    CX, CY = 320.0, 240.0
    intr = (FX, FY, CX, CY, 0.0)

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
    cam_free = ~cam_fixed
    pt_free = jnp.ones(P, bool)
    pin = jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32))
    msets = [("mono", mono)]

    @jax.jit
    def lm15(cam_R, cam_t, points):
        def body(carry, _):
            cam_R, cam_t, points, lam = carry
            dxc, dxp, cost0 = ba_large._implicit_schur_step(
                cam_R, cam_t, points, msets, intr, True, lam,
                cam_free, pt_free, C, P, 48)
            Rn, tn = lie.se3_update_left(cam_R, cam_t, dxc)
            pn = points + dxp
            cost1 = ba._cost_only(Rn, tn, pn, msets, intr, True)
            ok = (cost1 < cost0) & jnp.isfinite(cost1)
            cam_R = jnp.where(ok, Rn, cam_R)
            cam_t = jnp.where(ok, tn, cam_t)
            points = jnp.where(ok, pn, points)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-9, 1e8)
            return (cam_R, cam_t, points, lam), jnp.stack(
                [cost0, cost1, ok.astype(cost0.dtype), lam,
                 jnp.max(jnp.abs(dxc)), jnp.max(jnp.abs(dxp))])

        (cam_R, cam_t, points, _), tr = jax.lax.scan(
            body, (cam_R, cam_t, points, jnp.asarray(1e-4, jnp.float32)),
            None, length=15)
        return cam_R, cam_t, points, tr

    R, t, X, tr = jax.block_until_ready(lm15(jnp.asarray(cam_R),
                                             jnp.asarray(cam_t), pin))
    tr = np.asarray(tr)
    print("platform:", jax.devices()[0].platform)
    for i, row in enumerate(tr):
        print(f"it{i:02d} cost0={row[0]:12.1f} cost1={row[1]:12.1f} "
              f"ok={int(row[2])} lam={row[3]:.2e} |dxc|={row[4]:.3e} "
              f"|dxp|={row[5]:.3e}")
    # final state quality
    Rn, tn, Xn = np.asarray(R), np.asarray(t), np.asarray(X)
    Xc = np.einsum('nij,nj->ni', Rn[e_cam], Xn[e_pt]) + tn[e_cam]
    uv = np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX,
                   FY * Xc[:, 1] / Xc[:, 2] + CY], -1)
    chi2 = ((obs - uv) ** 2).sum(-1)
    print("state: mean chi2", chi2.mean(), "inlier frac",
          (chi2 <= 5.991).mean())


if __name__ == "__main__":
    main()
