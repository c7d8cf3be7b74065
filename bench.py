"""Benchmark: TRUE end-to-end SLAM pipeline throughput on one chip.

Headline metric (`value`): SUSTAINED WALL-CLOCK frames/s — total frames
processed divided by total wall time from the first post-warmup frame to
the final pipeline flush. Nothing is filtered: every keyframe stall,
mapping drain, and loop-closing check is inside the denominator, and the
terminal `_flush()` (which retires every in-flight lag-N frame) is too.
The only exclusion is the reported compile warm-up window (first
`WARMUP` frames), the same frames a warmed deployment never pays.

This matches the reference's acceptance measurement
(`Examples/Monocular/mono_fisheye.cc:152-161`: per-frame ttrack of
*completed* tracking work): in this engine `track_monocular` can return
before the frame's pose lands (lag-N retirement), so per-call dispatch
time is NOT comparable — the record therefore also carries
`pose_latency_ms` (dispatch -> pose available, median/p90) and per-call
dispatch stats as secondary latency info, never as the headline.

Baseline: the reference's real-time pacing target is ~30 fps on desktop
CPU (BASELINE.md; TUM=30fps, fisheye=25fps). vs_baseline = sustained/30.

Prints ONE JSON line — engineered to ALWAYS print inside the driver's
budget: a repo-local persistent compile cache (gitignored, rebuilt on
first run), an internal deadline (BENCH_BUDGET_S, default 1200 s) that
stops the frame loop early and reports what ran, and the headline line
printed+flushed BEFORE any secondary (birdview, device microbench)
starts. On secondary success the line is re-printed enriched (both lines
are complete records with the same headline metric).
"""
import json
import os
import time

import numpy as np

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
WARMUP = 10  # compile-window frames excluded from sustained fps (reported)


def _remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def _run_stats(times, dispatch_t0, fds, wall_total, warmup_s, done):
    """Honest aggregates for one pipeline run.

    times: per-call dispatch durations (s). dispatch_t0: per-frame call
    timestamps. fds: FrameData returned per frame (carry _finalized_wall
    once retired). wall_total: first-call -> post-flush wall. warmup_s:
    wall of the first WARMUP frames."""
    times = np.asarray(times)
    steady = times[WARMUP:]
    lat = np.array([fd._finalized_wall - t0
                    for t0, fd in zip(dispatch_t0[WARMUP:], fds[WARMUP:])
                    if getattr(fd, "_finalized_wall", None) is not None])
    sustained = ((done - min(WARMUP, done))
                 / max(wall_total - warmup_s, 1e-9))
    out = {
        "sustained_fps": sustained,
        "wall_total_s": wall_total,
        "warmup_s": warmup_s,
        "warmup_frames": min(WARMUP, done),
        "dispatch_median_ms": float(np.median(steady)) * 1e3
        if len(steady) else float("nan"),
        "dispatch_p90_ms": float(np.percentile(steady, 90)) * 1e3
        if len(steady) else float("nan"),
        "dispatch_mean_ms": float(steady.mean()) * 1e3
        if len(steady) else float("nan"),
    }
    if len(lat):
        out["pose_latency_ms"] = float(np.median(lat)) * 1e3
        out["pose_latency_p90_ms"] = float(np.percentile(lat, 90)) * 1e3
    return out


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
    t_pw = time.perf_counter()
    sys_.prewarm()
    prewarm_s = time.perf_counter() - t_pw
    times, t0s, fds = [], [], []
    done = 0
    wall0 = time.perf_counter()
    warmup_end = wall0
    for i, img in enumerate(frames):
        t0 = time.perf_counter()
        fds.append(sys_.track_monocular(img, i / 30.0))
        times.append(time.perf_counter() - t0)
        t0s.append(t0)
        done = i + 1
        if done == WARMUP:
            warmup_end = time.perf_counter()
        # deadline guard: keep enough budget to flush the pipeline and
        # print the headline even if cold compiles ate the run
        if _remaining() < 60 and done >= 50:
            break
    sys_._flush()
    wall_total = time.perf_counter() - wall0
    stats = _run_stats(times, t0s, fds, wall_total, warmup_end - wall0, done)
    stats["prewarm_s"] = prewarm_s
    # trajectory sanity: a perf number from a diverged run is meaningless
    est, gtp = [], []
    for (ts, Tcw), (R_cw, t_cw) in zip(sys_._frame_poses(), gt):
        if Tcw is None:
            continue
        est.append(-Tcw[:3, :3].T @ Tcw[:3, 3])
        gtp.append(-R_cw.T @ t_cw)
    ate = synth.ate_rmse(np.array(est), np.array(gtp), with_scale=True) \
        if len(est) > 10 else float("nan")
    stats.update({
        "tracked_frames": len(est),
        "n_frames": done,
        "keyframes": sys_.n_keyframes(),
        "ate_rmse_m": float(ate),
    })
    bs = getattr(sys_.tracker, "batch_stats", None)
    if bs:
        stats["summary_batch_mean"] = float(np.mean(bs))
        stats["forced_block_s"] = float(sys_.tracker.forced_block_s)
    if os.environ.get("BENCH_STAGES"):
        import sys as _s

        from orbslam_birdview_tpu.utils.profiling import GLOBAL_TIMER

        print("--- tracker stages ---\n" + sys_.tracker.timer.summary(),
              file=_s.stderr)
        print("--- mapping stages ---\n" + GLOBAL_TIMER.summary(),
              file=_s.stderr)
    return stats


def bird_pipeline_fps(n_frames: int = 120):
    """Secondary: the fork's signature mono+birdview mode end-to-end at the
    reference's 2000-feature budget on BOTH streams
    (`Examples/Monocular/fisheye.yaml:28-41`, `src/Frame.cc:329`).

    Round-2 review asked that the fused birdview path land within 2x of
    mono pipeline fps; measured the same honest way (sustained wall-clock
    fps, warm-up excluded and reported)."""
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
    frames = []
    for i in range(n_frames):
        img, bev, _ = seq.frame(i)
        # pre-render: the synthetic renderer costs ~50-150 ms/frame on a
        # small host and must not serialize into the measured loop (the
        # mono bench pre-renders too; a real deployment reads a camera)
        frames.append((np.clip(img, 0, 255).astype(np.uint8),
                       np.clip(bev, 0, 255).astype(np.uint8)))
    sys_ = System(cfg)
    sys_.prewarm()
    times, t0s, fds = [], [], []
    done = 0
    wall0 = time.perf_counter()
    warmup_end = wall0
    for i, (img, bev) in enumerate(frames):
        t0 = time.perf_counter()
        fds.append(sys_.track_monocular_with_birdview(
            img, bev, None, i / 25.0))
        times.append(time.perf_counter() - t0)
        t0s.append(t0)
        done = i + 1
        if done == WARMUP:
            warmup_end = time.perf_counter()
        if _remaining() < 120 and done >= 40:
            break
    sys_._flush()
    wall_total = time.perf_counter() - wall0
    s = _run_stats(times, t0s, fds, wall_total, warmup_end - wall0, done)
    return {
        "bird_fps": round(s["sustained_fps"], 2),
        "bird_dispatch_median_ms": round(s["dispatch_median_ms"], 2),
        "bird_n_frames": done,
        "bird_keyframes": sys_.n_keyframes(),
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

        # repo-local persistent compile cache (gitignored): a cold run
        # pays the compiles once, every later run on this box reuses them
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
        "metric": "pipeline_sustained_fps_1chip",
        "value": round(pipe["sustained_fps"], 2),
        "unit": "frames/s",
        "vs_baseline": round(pipe["sustained_fps"] / 30.0, 3),
        "wall_total_s": round(pipe["wall_total_s"], 2),
        "warmup_s": round(pipe["warmup_s"], 2),
        "warmup_frames": pipe["warmup_frames"],
        "dispatch_median_ms": round(pipe["dispatch_median_ms"], 2),
        "dispatch_p90_ms": round(pipe["dispatch_p90_ms"], 2),
        "dispatch_mean_ms": round(pipe["dispatch_mean_ms"], 2),
        "n_frames": pipe["n_frames"],
        "tracked_frames": pipe["tracked_frames"],
        "keyframes": pipe["keyframes"],
        "ate_rmse_m": round(pipe["ate_rmse_m"], 4),
    }
    for k in ("pose_latency_ms", "pose_latency_p90_ms",
              "summary_batch_mean", "forced_block_s", "prewarm_s"):
        if k in pipe:
            line[k] = round(pipe[k], 2)
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
