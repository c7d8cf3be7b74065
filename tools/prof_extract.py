"""Cumulative breakdown of extract_orb on TPU.

Each row adds one stage of the per-level pipeline; the delta between
consecutive rows is that stage's true in-context cost. All variants force
materialization of their outputs through the scan carry so XLA cannot DCE
the stage under test.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from orbslam_birdview_tpu.frontend import orb

cfg = orb.ORBConfig(n_features=2000)
H, W = 480, 640
N = 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 255, (4, H, W)).astype(np.float32))


def time_scan(fn, name):
    @jax.jit
    def run():
        def step(c, i):
            out = fn(imgs[i % 4])
            return c + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32), out,
                jnp.float32(0)), 0
        tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(N))
        return tot
    float(run())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run())
        ts.append(time.perf_counter() - t0)
    triv = jax.jit(lambda: jnp.float32(1.0))
    float(triv())
    rt = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(triv())
        rt.append(time.perf_counter() - t0)
    print(f"{name}: {(min(ts) - min(rt)) / N * 1e3:.3f} ms/step", flush=True)


def staged(img, upto: str):
    sizes = orb.level_sizes(H, W, cfg)
    budgets = cfg.level_budgets()
    scales = cfg.level_scales()
    outs = []
    lvl_img = img
    for l in range(cfg.n_levels):
        h, w = sizes[l]
        if l > 0:
            lvl_img = orb.resize_bilinear(lvl_img, h, w)
        if upto == "pyramid":
            outs.append(lvl_img[::8, ::8])
            continue
        resp, corner = orb.fast_response(lvl_img, cfg.min_threshold)
        resp = jnp.where(corner, resp, 0.0)
        resp = resp * orb._border_mask(h, w, orb.EDGE_MARGIN)
        if upto == "fast":
            outs.append(resp[::8, ::8])
            continue
        resp_nms = orb.nms3(resp)
        k_l = max(budgets[l], 1)
        ys, xs, r, valid = orb.select_uniform_topk(
            resp_nms, k_l, cfg.cell, cfg.per_cell)
        if upto == "select":
            outs.append((ys, xs, r))
            continue
        patches = orb.extract_patches(lvl_img, ys, xs)
        if upto == "patches":
            outs.append(patches[:, ::8, ::8])
            continue
        ang = orb.ic_angle_from_patches(patches)
        if upto == "angle":
            outs.append((patches[:, ::8, ::8], ang))
            continue
        pb = orb.blur_patches(patches)
        if upto == "blur":
            outs.append((pb[:, ::8, ::8], ang))
            continue
        desc = orb.brief_from_patches(pb, ang)
        outs.append((desc.astype(jnp.float32), ang))
    return outs


for stage in ["pyramid", "fast", "select", "patches", "angle", "blur", "brief"]:
    time_scan(lambda im, s=stage: staged(im, s), stage)
