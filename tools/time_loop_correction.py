"""Loop-correction scaling: CorrectLoop + essential graph vs keyframe count.

VERDICT r3 item 8 asked for timing evidence that the vectorized loop
correction (`pipeline/loop_closing.py:_correct_loop` — group Sim3
propagation, SearchAndFuse, essential-graph solve, landmark transport)
scales sublinearly-ish to 500+ keyframes. Reference anchor:
`/root/reference/src/LoopClosing.cc:402-585` (serial per-KF loops under
the map mutex).

Builds synthetic circular maps at K in {128, 256, 512, 1024} keyframes
(~40 new landmarks per KF, 4-KF observation overlap, spanning-tree chain,
reference-style covisibility band) and times `_correct_loop` with the
async global-BA dispatch stubbed (it is overlapped with tracking in
production and measured separately). First call per K includes the pose-
graph compile for that bucket; the second call is the warm cost.

Usage: python tools/time_loop_correction.py   (CPU or TPU env)
"""
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_map(K: int, new_per_kf: int = 40, share: int = 4):
    from orbslam_birdview_tpu.mapping.mapstore import MapStore

    obs_per_kf = new_per_kf * share
    store = MapStore(max_kf=K + 8, max_mp=K * new_per_kf + 16,
                     max_bmp=16, kp_cap=max(256, obs_per_kf), bird_cap=16)
    rng = np.random.default_rng(0)
    yaw = np.linspace(0, 4 * np.pi, K, endpoint=False)  # two revolutions
    r = 10.0
    for i in range(K):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        R_wc = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t_wc = np.array([r * np.cos(yaw[i]), r * np.sin(yaw[i]), 0],
                        np.float32)
        store.kf_R[i] = R_wc.T
        store.kf_t[i] = -R_wc.T @ t_wc
        store.kf_valid[i] = True
        store.kf_frame_id[i] = i
        store.kf_parent[i] = i - 1 if i > 0 else -1
    store.n_kf = K
    # landmarks: new_per_kf minted per KF, each observed by `share`
    # consecutive KFs
    M = K * new_per_kf
    store.mp_pos[:M] = rng.uniform(-12, 12, (M, 3)).astype(np.float32)
    store.mp_valid[:M] = True
    store.mp_desc[:M] = rng.integers(0, 256, (M, 32), dtype=np.uint8)
    store.mp_n_obs[:M] = share
    store.n_mp = M
    for i in range(K):
        lo = max(0, (i - share + 1)) * new_per_kf
        hi = (i + 1) * new_per_kf
        ids = np.arange(lo, hi)
        n = len(ids)
        store.kf_kp_mp[i, :n] = ids
        store.kf_kp_valid[i, :n] = True
        store.kf_kp_xy[i, :n] = rng.uniform(0, 600, (n, 2))
        store.kf_desc[i, :n] = store.mp_desc[ids]
    # covisibility band: |i-j| < share share (share-|i-j|)*new_per_kf pts
    d = np.abs(np.arange(K)[:, None] - np.arange(K)[None, :])
    band = np.maximum(share - d, 0) * new_per_kf
    np.fill_diagonal(band, 0)
    store.covis[:K, :K] = band.astype(np.int32)
    return store


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tpu")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from orbslam_birdview_tpu.api.config import SlamConfig
    from orbslam_birdview_tpu.pipeline.local_mapping import LocalMapper
    from orbslam_birdview_tpu.pipeline.loop_closing import LoopCloser

    cfg = SlamConfig(sensor="mono")
    print(f"{'K':>6} {'edges':>7} {'cold_s':>8} {'warm_s':>8}")
    for K in (128, 256, 512, 1024):
        times = []
        for trial in range(2):
            store = build_map(K)
            mapper = LocalMapper(cfg, store)
            lc = LoopCloser(cfg, store, mapper, vocabulary=None)
            lc._global_ba = lambda kf: None   # async in production
            S = (np.eye(3, dtype=np.float32),
                 np.array([0.05, -0.03, 0.0], np.float32), 1.02)
            loop_points = np.arange(200, dtype=np.int64)
            t0 = time.perf_counter()
            lc._correct_loop(K - 1, 0, S, loop_points)
            times.append(time.perf_counter() - t0)
        n_edges = int((store.covis[:K, :K] >= 100).sum() // 2 + K)
        print(f"{K:>6} {n_edges:>7} {times[0]:>8.2f} {times[1]:>8.2f}",
              flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
