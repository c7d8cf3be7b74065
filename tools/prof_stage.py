import time, numpy as np, jax, jax.numpy as jnp
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
Xw = jnp.asarray(rng.uniform(-3, 3, (cap, 3)).astype(np.float32) + np.array([0,0,8], np.float32))

def time_scan(fn, name):
    @jax.jit
    def run():
        def step(c, i):
            return c, fn(i)
        _, out = jax.lax.scan(step, 0, jnp.arange(N))
        return jax.tree_util.tree_reduce(lambda a,b: a + jnp.sum(b).astype(jnp.float32), out, jnp.float32(0))
    r = float(run())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(run()); ts.append(time.perf_counter()-t0)
    triv = jax.jit(lambda: jnp.float32(1.0)); float(triv())
    rt = []
    for _ in range(5):
        t0 = time.perf_counter(); float(triv()); rt.append(time.perf_counter()-t0)
    ms = (np.median(ts) - np.median(rt)) / N * 1e3
    print(f"{name}: {ms:.3f} ms/step")
    return ms

# stage 1: extraction only
kp0 = orb.extract_orb(imgs[0], cfg)
time_scan(lambda i: orb.extract_orb(imgs[i % 4], cfg).xy, "extract_orb")

# stage 2: matcher only (fixed keypoints)
kpxy, kpoct, kpval, kpdesc = kp0.xy, kp0.octave, kp0.valid, kp0.desc_pm1
def m(i):
    idx, dist = matcher.search_by_projection(map_uv, map_valid, map_desc, kpxy, kpoct, kpval, kpdesc, jnp.full(cap, 15.0, jnp.float32))
    return idx
time_scan(m, "search_by_projection")

# stage 3: pose opt only
obs = kp0.xy[:cap] if kp0.xy.shape[0] >= cap else jnp.pad(kp0.xy, ((0, cap-kp0.xy.shape[0]), (0,0)))
matched = jnp.ones(cap, bool)
def p(i):
    res = pose_opt.optimize_pose(jnp.eye(3,dtype=jnp.float32), jnp.zeros(3,jnp.float32)+i.astype(jnp.float32)*0, Xw, obs, jnp.ones(cap,jnp.float32), matched, FX, FY, CX, CY)
    return res.t
time_scan(p, "pose_opt(4x10)")
