import time, numpy as np, jax, jax.numpy as jnp
from orbslam_birdview_tpu.frontend import matcher, orb

cap = 2048
N = 32
rng = np.random.default_rng(0)
map_desc = jnp.asarray((rng.integers(0, 2, (cap, 256)) * 2 - 1).astype(np.int8))
map_uv0 = jnp.asarray(rng.uniform(0, 600, (cap, 2)).astype(np.float32))
map_valid = jnp.ones(cap, bool)
kp_desc = jnp.asarray((rng.integers(0, 2, (cap, 256)) * 2 - 1).astype(np.int8))
kp_xy = jnp.asarray(rng.uniform(0, 600, (cap, 2)).astype(np.float32))
kp_oct = jnp.zeros(cap, jnp.int32)
kp_valid = jnp.ones(cap, bool)

def time_scan(fn, name):
    @jax.jit
    def run():
        def step(c, i):
            out = fn(i)
            return c + jnp.sum(out).astype(jnp.float32), 0
        tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(N))
        return tot
    float(run())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(run()); ts.append(time.perf_counter()-t0)
    triv = jax.jit(lambda: jnp.float32(1.0)); float(triv())
    rt = []
    for _ in range(5):
        t0 = time.perf_counter(); float(triv()); rt.append(time.perf_counter()-t0)
    print(f"{name}: {(np.median(ts)-np.median(rt))/N*1e3:.3f} ms/step")

def m(i):
    uv = map_uv0 + i.astype(jnp.float32)  # loop-dependent, defeats hoisting
    idx, dist = matcher.search_by_projection(uv, map_valid, map_desc, kp_xy, kp_oct, kp_valid, kp_desc, jnp.full(cap, 15.0, jnp.float32))
    return idx
time_scan(m, "search_by_projection(varying)")

def h(i):
    d = matcher.hamming_matrix(map_desc, jnp.roll(kp_desc, i, axis=0), map_valid, kp_valid)
    return jnp.min(d, axis=1)
time_scan(h, "hamming_matrix+min(varying)")
