"""Benchmark: TRUE end-to-end SLAM pipeline fps on one chip.

Headline metric: wall-clock per frame of `System.track_monocular` over a
300-frame synthetic sequence — INCLUDING all host orchestration, keyframe
creation, local mapping (triangulation/fuse/culling), overlapped local BA,
and loop-closing checks. This is the reference's acceptance measurement
(`Examples/Monocular/mono_fisheye.cc:152-161`: per-frame ttrack, median +
mean at exit). Compile frames (first occurrence of each program) are
excluded the same way a warmed deployment would be.

Baseline: the reference's real-time pacing target is ~30 fps on desktop
CPU (BASELINE.md; TUM=30fps, fisheye=25fps). vs_baseline = fps / 30.

Prints ONE JSON line — and is engineered to ALWAYS print it inside the
driver's budget:
  - the persistent compile cache ships with the repo (`.jax_cache_tpu/`),
    so a cold driver run reuses the committed executables instead of
    paying minutes-per-program remote compiles (round-2's bench timed out
    exactly there — rc=124, no number recorded);
  - the frame loop has an internal deadline (BENCH_BUDGET_S, default
    1200 s): if compiles still blow the budget, the run stops early and
    reports the frames it did process;
  - the headline JSON line prints and flushes BEFORE any secondary bench
    (birdview pipeline, device microbench) starts; secondaries run only
    when the remaining budget allows, and on success the headline line is
    re-printed enriched with their fields (both lines are complete,
    parseable records with the same headline metric — a parser may take
    either the first or the last JSON line).
"""
import json
import os
import time

import numpy as np

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))


def _remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def pipeline_fps(n_frames: int = 300):
    from orbslam_birdview_tpu.api.config import SlamConfig
    from orbslam_birdview_tpu.api.system import System
    from orbslam_birdview_tpu.core.camera import PinholeCamera
    from orbslam_birdview_tpu.utils import synth

    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    cfg = SlamConfig(sensor="mono")
    cfg.camera = cam
    seq = synth.WallSequence(cam, n_frames=n_frames, step=0.015, push=0.002)
    frames = []
    gt = []
    for i in range(n_frames):
        img, pose = seq.frame(i)
        # 8-bit, like a real camera (and 4x less host->device traffic)
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
        gt.append(pose)

    sys_ = System(cfg)
    times = []
    done = 0
    for i, img in enumerate(frames):
        t0 = time.perf_counter()
        sys_.track_monocular(img, i / 30.0)
        times.append(time.perf_counter() - t0)
        done = i + 1
        # deadline guard: keep enough budget to flush the pipeline and
        # print the headline even if cold compiles ate the run
        if _remaining() < 60 and done >= 50:
            break
    sys_._flush()
    times = np.array(times)
    med = float(np.median(times))
    # drop COMPILE frames only: warmup window + multi-second outliers.
    # (A 5×median cut would also hide genuine keyframe-path frames —
    # p90/mean must include the mapping tail, like the reference's
    # at-exit ttrack stats do.)
    steady = times[10:]
    steady = steady[steady < 0.5]
    # trajectory sanity: a perf number from a diverged run is meaningless
    est, gtp = [], []
    for (ts, Tcw), (R_cw, t_cw) in zip(sys_._frame_poses(), gt):
        if Tcw is None:
            continue
        est.append(-Tcw[:3, :3].T @ Tcw[:3, 3])
        gtp.append(-R_cw.T @ t_cw)
    ate = synth.ate_rmse(np.array(est), np.array(gtp), with_scale=True) \
        if len(est) > 10 else float("nan")
    return {
        "fps": 1.0 / med,
        "median_ms": med * 1e3,
        "mean_ms": float(steady.mean()) * 1e3,
        "p90_ms": float(np.percentile(steady, 90)) * 1e3,
        # sustained throughput including every keyframe/mapping stall
        # (compile frames excluded) — the harshest honest aggregate
        "steady_fps": len(steady) / float(steady.sum()),
        "tracked_frames": len(est),
        "n_frames": done,
        "keyframes": sys_.n_keyframes(),
        "ate_rmse_m": float(ate),
    }


def bird_pipeline_fps(n_frames: int = 120):
    """Secondary: the fork's signature mono+birdview mode end-to-end.

    Round-2 review asked that the fused birdview path land within 2x of
    mono pipeline fps; this measures it the same way (median per-frame
    wall time of `track_monocular_with_birdview`, compile frames
    excluded)."""
    import jax.numpy as jnp

    from orbslam_birdview_tpu.api.config import SlamConfig
    from orbslam_birdview_tpu.api.system import System
    from orbslam_birdview_tpu.core import lie
    from orbslam_birdview_tpu.core.camera import BirdviewCamera, PinholeCamera
    from orbslam_birdview_tpu.frontend.orb import ORBConfig
    from orbslam_birdview_tpu.utils.synth import BirdSequence

    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    bv = BirdviewCamera(width=384, height=384)
    seq = BirdSequence(cam, bv, n_frames=n_frames, speed=0.05,
                       yaw_rate=0.002)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=2000),
                     sensor="mono_bird", birdview=bv)
    q = np.asarray(lie.rot_to_quat(jnp.asarray(seq.R_bc)))
    cfg.tbc_quat = tuple(q.tolist())
    cfg.tbc_t = tuple(seq.t_bc.tolist())
    sys_ = System(cfg)
    times = []
    for i in range(n_frames):
        img, bev, _ = seq.frame(i)
        t0 = time.perf_counter()
        sys_.track_monocular_with_birdview(
            np.clip(img, 0, 255).astype(np.uint8),
            np.clip(bev, 0, 255).astype(np.uint8), None, i / 25.0)
        times.append(time.perf_counter() - t0)
        if _remaining() < 120 and i >= 40:
            break
    sys_._flush()
    times = np.array(times)
    steady = times[10:]
    steady = steady[steady < 0.5]
    return {
        "bird_fps": 1.0 / float(np.median(times)),
        "bird_steady_fps": len(steady) / float(steady.sum()),
        "bird_n_frames": len(times),
    }


def device_step_fps():
    """Pure device tracking-step scan (no host orchestration): the ceiling."""
    import jax
    import jax.numpy as jnp

    from orbslam_birdview_tpu.core import lie
    from orbslam_birdview_tpu.frontend import matcher, orb
    from orbslam_birdview_tpu.graph import pose_opt

    cfg = orb.ORBConfig(n_features=2000)
    H, W = 480, 640
    FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
    cap = 2048
    N_STEPS = 32
    N_IMGS = 4

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (N_IMGS, H, W)).astype(np.float32))
    map_desc = jnp.asarray(
        (rng.integers(0, 2, (cap, 256)) * 2 - 1).astype(np.int8))
    map_uv = jnp.asarray(rng.uniform(0, 600, (cap, 2)).astype(np.float32))
    map_valid = jnp.ones(cap, bool)
    Xw = jnp.asarray(rng.uniform(-3, 3, (cap, 3)).astype(np.float32)
                     + np.array([0, 0, 8], np.float32))
    # realistic pose-LM workload: observations are the map points projected
    # under a ground-truth pose with pixel noise and 20% gross outliers
    Xw_np = np.asarray(Xw)
    obs_np = np.stack([FX * Xw_np[:, 0] / Xw_np[:, 2] + CX,
                       FY * Xw_np[:, 1] / Xw_np[:, 2] + CY], -1)
    obs_np += rng.normal(0.0, 1.0, obs_np.shape)
    out_mask = rng.uniform(size=cap) < 0.2
    obs_np[out_mask] += rng.uniform(-80, 80, (int(out_mask.sum()), 2))
    obs_gt = jnp.asarray(obs_np.astype(np.float32))
    pred_err = jnp.asarray([0.03, 0.02, -0.03, 0.012, -0.018, 0.022],
                           jnp.float32)

    def one_step(carry, i):
        R, t = carry
        R, t = lie.se3_update_left(R, t, pred_err)
        img = imgs[i % N_IMGS]
        kp = orb.extract_orb(img, cfg)
        idx, dist = matcher.search_by_projection(
            map_uv, map_valid, map_desc,
            kp.xy, kp.octave, kp.valid, kp.desc_pm1,
            jnp.full(cap, 15.0, jnp.float32))
        res = pose_opt.optimize_pose(
            R, t, Xw, obs_gt, jnp.ones(cap, jnp.float32), map_valid,
            FX, FY, CX, CY)
        tshift = res.t + 1e-12 * (jnp.sum(dist) + jnp.sum(idx).astype(
            jnp.float32))
        return (res.R, tshift), res.n_inliers

    @jax.jit
    def run_steps():
        (R, t), ninl = jax.lax.scan(
            one_step, (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)),
            jnp.arange(N_STEPS))
        return jnp.sum(ninl)

    _ = float(np.asarray(run_steps()))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(np.asarray(run_steps()))
        times.append(time.perf_counter() - t0)
    # subtract one dispatch RTT measured with a trivial kernel
    triv = jax.jit(lambda: jnp.float32(1.0))
    _ = float(np.asarray(triv()))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(np.asarray(triv()))
        rtts.append(time.perf_counter() - t0)
    step_s = max(np.median(times) - np.median(rtts), 1e-6) / N_STEPS
    return 1.0 / step_s


def main():
    import sys

    try:
        import jax

        # repo-local persistent compile cache: committed with the repo so
        # the driver's cold run reuses warmed executables (see module doc)
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # persist EVERYTHING: on the tunnel backend even a scalar-add
        # compiles in ~0.35 s remotely; dozens of such eager ops on the
        # cold path cost ~30 s/run unless cached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    pipe = pipeline_fps()
    line = {
        "metric": "pipeline_fps_1chip",
        "value": round(pipe["fps"], 2),
        "unit": "frames/s",
        "vs_baseline": round(pipe["fps"] / 30.0, 3),
        "median_ms": round(pipe["median_ms"], 2),
        "mean_ms": round(pipe["mean_ms"], 2),
        "p90_ms": round(pipe["p90_ms"], 2),
        "steady_fps": round(pipe["steady_fps"], 2),
        "n_frames": pipe["n_frames"],
        "tracked_frames": pipe["tracked_frames"],
        "keyframes": pipe["keyframes"],
        "ate_rmse_m": round(pipe["ate_rmse_m"], 4),
    }
    # secondary benches only if the budget comfortably allows; their
    # absence or failure never suppresses the headline. Print-and-flush
    # the headline FIRST: the record must exist even if a secondary hangs.
    print(json.dumps(line))
    sys.stdout.flush()
    extras = {}
    if _remaining() > 300:
        try:
            extras.update(bird_pipeline_fps())
        except Exception as e:  # pragma: no cover
            print(f"bird bench skipped: {e}", file=sys.stderr)
    if _remaining() > 180:
        try:
            extras["device_step_fps"] = round(device_step_fps(), 1)
        except Exception as e:  # pragma: no cover
            print(f"device_step_fps skipped: {e}", file=sys.stderr)
    if extras:
        line.update({k: (round(v, 2) if isinstance(v, float) else v)
                     for k, v in extras.items()})
        print(json.dumps(line))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # the tunnel backend can hang interpreter teardown
