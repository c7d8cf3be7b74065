"""Isolate the bench one_step cost: stagewise cumulative timings.

Runs the exact bench.py chain but truncated after each stage, so the
difference between consecutive rows is that stage's true in-context cost
(including any layout/transpose glue XLA inserts between stages).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from orbslam_birdview_tpu.frontend import matcher, orb
from orbslam_birdview_tpu.graph import pose_opt

cfg = orb.ORBConfig(n_features=2000)
H, W = 480, 640
FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
cap = 2048
N = 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 255, (4, H, W)).astype(np.float32))
map_desc = jnp.asarray((rng.integers(0, 2, (cap, 256)) * 2 - 1).astype(np.int8))
map_uv = jnp.asarray(rng.uniform(0, 600, (cap, 2)).astype(np.float32))
map_valid = jnp.ones(cap, bool)
Xw = jnp.asarray(rng.uniform(-3, 3, (cap, 3)).astype(np.float32)
                 + np.array([0, 0, 8], np.float32))
R0 = jnp.eye(3)
t0 = jnp.zeros(3)


def time_scan(fn, name):
    @jax.jit
    def run():
        def step(c, i):
            out = fn(i)
            return c + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32), out,
                jnp.float32(0)), 0
        tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(N))
        return tot
    float(run())
    ts = []
    for _ in range(5):
        t0_ = time.perf_counter()
        float(run())
        ts.append(time.perf_counter() - t0_)
    triv = jax.jit(lambda: jnp.float32(1.0))
    float(triv())
    rt = []
    for _ in range(5):
        t0_ = time.perf_counter()
        float(triv())
        rt.append(time.perf_counter() - t0_)
    ms = (min(ts) - min(rt)) / N * 1e3
    print(f"{name}: {ms:.3f} ms/step", flush=True)
    return ms


def upto_extract(i):
    kp = orb.extract_orb(imgs[i % 4], cfg)
    return (kp.xy, kp.desc_pm1.astype(jnp.float32))


def upto_match(i):
    kp = orb.extract_orb(imgs[i % 4], cfg)
    idx, dist = matcher.search_by_projection(
        map_uv, map_valid, map_desc,
        kp.xy, kp.octave, kp.valid, kp.desc_pm1,
        jnp.full(cap, 15.0, jnp.float32))
    return (idx, dist)


def upto_pose(i):
    kp = orb.extract_orb(imgs[i % 4], cfg)
    idx, dist = matcher.search_by_projection(
        map_uv, map_valid, map_desc,
        kp.xy, kp.octave, kp.valid, kp.desc_pm1,
        jnp.full(cap, 15.0, jnp.float32))
    matched = idx >= 0
    obs = kp.xy[jnp.where(matched, idx, 0)]
    res = pose_opt.optimize_pose(
        R0, t0, Xw, obs, jnp.ones(cap, jnp.float32), matched,
        FX, FY, CX, CY)
    return (res.R, res.t, res.n_inliers.astype(jnp.float32))


time_scan(upto_extract, "extract")
time_scan(upto_match, "extract+match")
time_scan(upto_pose, "extract+match+pose (= bench step)")
