"""Strong-scaling report for distributed BA over a device mesh.

BASELINE.json asks for "tracked frames/s scaling efficiency reported at
1 chip, 1 host, and N >= 2 hosts". Only one real TPU chip is reachable in
this container, so this tool measures the sharded Schur-BA path (the
component that actually scales with devices — SURVEY §2.3) on a virtual
device mesh: a FIXED global problem (P landmarks, E edges, C cameras) is
partitioned over n ∈ {1,2,4,8} mesh devices and the per-LM-iteration
wall time is measured. The identical `shard_map` code runs unchanged on a
real pod slice; re-run there for ICI numbers.

Run:
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_report.py
"""
import argparse
import json
import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from orbslam_birdview_tpu.core import lie
from orbslam_birdview_tpu.graph.ba import EdgeSet
from orbslam_birdview_tpu.parallel import sharded_ba

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def build_global_problem(rng, P_total, n_cams, obs_per_pt):
    """Fixed global BA problem; edge pt indices are GLOBAL (regrouped per
    shard count by `shard_edges`). Points are block-contiguous so any
    power-of-two shard count owns contiguous blocks."""
    X = np.stack([
        rng.uniform(-6, 6, P_total), rng.uniform(-4, 4, P_total),
        rng.uniform(6, 16, P_total)], 1).astype(np.float32)
    xi = np.stack([
        np.array([0.35 * c, 0.0, 0.02 * c, 0.0, -0.01 * c, 0.005 * c],
                 np.float32) for c in range(n_cams)])
    Rs, ts = jax.vmap(lie.se3_exp)(jnp.asarray(xi))
    Rs_np, ts_np = np.asarray(Rs), np.asarray(ts)
    # each point observed by `obs_per_pt` cameras (wrap-around window)
    pt = np.repeat(np.arange(P_total, dtype=np.int32), obs_per_pt)
    base = np.arange(P_total) % n_cams
    cam = ((base[:, None] + np.arange(obs_per_pt)[None, :]) % n_cams
           ).reshape(-1).astype(np.int32)
    Xc = np.einsum("eij,ej->ei", Rs_np[cam], X[pt]) + ts_np[cam]
    uv = np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX,
                   FY * Xc[:, 1] / Xc[:, 2] + CY], 1)
    uv += rng.normal(0, 0.3, uv.shape)
    E = pt.shape[0]
    edges = EdgeSet(jnp.asarray(cam), jnp.asarray(pt),
                    jnp.asarray(uv.astype(np.float32)),
                    jnp.ones(E, jnp.float32), jnp.ones(E, bool))
    return Rs, ts, jnp.asarray(X), edges


def regroup_local(edges, P_total, n_dev):
    """Sort edges by owning shard and rewrite pt indices to be local."""
    assert P_total % n_dev == 0, (
        f"--points ({P_total}) must be divisible by the device count "
        f"({n_dev}); tail points would be silently dropped otherwise")
    per = P_total // n_dev
    shard = np.asarray(edges.pt) // per
    order = np.argsort(shard, kind="stable")
    # pad each shard's edge list to the max so the sharded axis is even
    counts = np.bincount(shard, minlength=n_dev)
    cap = int(counts.max())
    E_cap = cap * n_dev
    idx = np.zeros(E_cap, np.int64)
    val = np.zeros(E_cap, bool)
    off = 0
    pos = 0
    srt = order
    for s in range(n_dev):
        k = counts[s]
        idx[pos:pos + k] = srt[off:off + k]
        val[pos:pos + k] = True
        off += k
        pos += cap
    cam = np.asarray(edges.cam)[idx]
    pt_local = (np.asarray(edges.pt)[idx] % per).astype(np.int32)
    obs = np.asarray(edges.obs)[idx]
    info = np.asarray(edges.info)[idx] * val
    return EdgeSet(jnp.asarray(cam), jnp.asarray(pt_local),
                   jnp.asarray(obs), jnp.asarray(info),
                   jnp.asarray(val))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--obs-per-pt", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    devs = jax.devices()
    print(f"platform={devs[0].platform} devices={len(devs)}")
    Rs, ts, X, edges = build_global_problem(
        rng, args.points, args.cams, args.obs_per_pt)
    C = Rs.shape[0]
    pert = jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))
    pert = pert.at[:2].set(0.0)
    Rp, tp = jax.vmap(lie.se3_update_left)(Rs, ts, pert)
    Xp = X + jnp.asarray(rng.normal(0, 0.05, X.shape).astype(np.float32))
    fixed = jnp.zeros(C, bool).at[0].set(True).at[1].set(True)

    rows = []
    base_ms = None
    n = 1
    while n <= len(devs):
        mesh = sharded_ba.make_mesh(devs[:n])
        e_loc = regroup_local(edges, args.points, n)
        prob = sharded_ba.shard_problem(
            mesh, Rp, tp, fixed, Xp, jnp.ones(args.points, bool), e_loc)
        run = lambda: sharded_ba.sharded_bundle_adjust(
            mesh, prob, FX, FY, CX, CY, n_iters=args.iters)
        out = run()
        jax.block_until_ready(out)
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            samples.append(time.perf_counter() - t0)
        ms_iter = np.median(samples) / args.iters * 1e3
        if base_ms is None:
            base_ms = ms_iter
        speedup = base_ms / ms_iter
        eff = speedup / n
        rows.append({"devices": n, "ms_per_lm_iter": round(ms_iter, 3),
                     "speedup": round(speedup, 3),
                     "efficiency": round(eff, 3),
                     "final_cost": float(out[3])})
        print(f"n={n:2d}  {ms_iter:8.2f} ms/LM-iter  speedup {speedup:5.2f}"
              f"  efficiency {eff:5.2f}  cost {float(out[3]):.1f}")
        n *= 2

    # costs must agree across shard counts (same math, different partition)
    costs = [r["final_cost"] for r in rows]
    assert max(costs) - min(costs) < 1e-2 * max(abs(c) for c in costs) + 1e-3, \
        costs
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"problem": {"P": args.points, "C": args.cams,
                                   "E": int(edges.cam.shape[0])},
                       "platform": devs[0].platform, "rows": rows}, f,
                      indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
