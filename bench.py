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
`pose_latency_ms` (dispatch -> pose available, median/p90), a
synchronous-mode fps (`sync_fps`: every frame's pose returned before the
call returns, the reference's API contract `src/System.cc:284-335`), and
per-call dispatch stats as secondary latency info, never as the headline.

Baseline: the reference's real-time pacing target is ~30 fps on desktop
CPU (BASELINE.md; TUM=30fps, fisheye=25fps). vs_baseline = sustained/30.

INDESTRUCTIBLE RECORD ARCHITECTURE (round-5): two rounds out of four
produced no perf record because the tunnel backend either died at init
(rc=1, r4) or stalled inside a remote call past every between-frame
deadline check (r2 rc=124). This file is now a SUPERVISOR + CHILD pair:

- parent (default entry): imports NO jax. Spawns this same file as a
  child process in its own process group, captures its stdout, and
  enforces the budget with a hard watchdog — a child blocked inside a
  remote call for 20 minutes gets SIGKILLed and the parent still prints
  the last complete JSON record the child produced (the child prints the
  headline BEFORE any secondary starts). If the child never produced a
  record, the parent prints an rc=0 diagnostic record
  (value=0, "error": ...) so the driver ALWAYS captures a parseable
  line with rc=0.
- child (BENCH_CHILD=1): retries backend init with exponential backoff
  (the r4 failure was a transient 'axon UNAVAILABLE' that recovered in
  minutes), then runs the workload in budget slices: the mono headline
  first, then each secondary (birdview, sync-mode, device ceiling,
  roofline/MFU) inside its own slice so one slow secondary cannot eat
  the others.

Self-tests (tests/test_bench_robustness.py) force each failure mode via
BENCH_SELFTEST={dead_backend,stall,stall_after_headline} and assert a
parseable rc=0 JSON line lands inside the budget.
"""
import json
import os
import signal
import subprocess
import sys
import threading
import time

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
WARMUP = 10  # compile-window frames excluded from sustained fps (reported)
SELFTEST = os.environ.get("BENCH_SELFTEST", "")

HEADLINE_METRIC = "pipeline_sustained_fps_1chip"


def _remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


# ---------------------------------------------------------------------------
# parent: watchdog supervisor (no jax anywhere on this path)
# ---------------------------------------------------------------------------

def parent_main():
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    # child gets a slightly smaller internal budget so it can finish its
    # own flush + final print before the parent's hard kill fires
    env["BENCH_BUDGET_S"] = str(max(BUDGET_S - 75.0, 30.0))
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, stderr=sys.stderr,
        env=env, start_new_session=True, text=True)
    records = []          # every parseable JSON record line, in order
    lock = threading.Lock()

    def reader():
        for raw in child.stdout:
            raw = raw.strip()
            if not raw:
                continue
            try:
                rec = json.loads(raw)
            except ValueError:
                print(raw, file=sys.stderr)
                continue
            if isinstance(rec, dict) and rec.get("metric"):
                with lock:
                    records.append(rec)
            else:
                print(raw, file=sys.stderr)

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    # hard deadline: the child checks its own budget between frames, but a
    # single blocked remote call defeats that (observed r4: 21 min past a
    # 900 s deadline) — the parent's kill does not care what the child is
    # blocked on
    deadline = max(BUDGET_S - 35.0, 20.0)
    killed = False
    while True:
        rc = child.poll()
        if rc is not None:
            break
        if time.perf_counter() - T_START > deadline:
            killed = True
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except OSError:
                pass
            child.wait()
            break
        time.sleep(0.5)
    th.join(timeout=10.0)
    with lock:
        last = records[-1] if records else None
    if last is None:
        last = {
            "metric": HEADLINE_METRIC,
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": ("watchdog_timeout" if killed
                      else f"child_exit_no_record_rc{child.returncode}"),
            "elapsed_s": round(time.perf_counter() - T_START, 1),
        }
    elif killed:
        last = dict(last)
        last["watchdog_killed_secondary"] = True
    print(json.dumps(last))
    sys.stdout.flush()
    return 0


# ---------------------------------------------------------------------------
# child: backend init with retry, then the workload in budget slices
# ---------------------------------------------------------------------------

def _init_backend_with_retry():
    """First device touch with exponential-backoff retry.

    The r4 driver run died with `Unable to initialize backend 'axon':
    UNAVAILABLE` on the FIRST jnp op and never printed a record; the same
    tunnel recovered within minutes when re-probed. Retry budget is the
    smaller of BENCH_INIT_RETRY_S and half the remaining bench budget.
    Returns (ok, n_attempts, last_error)."""
    retry_s = float(os.environ.get("BENCH_INIT_RETRY_S", "480"))
    t0 = time.perf_counter()
    attempt = 0
    last_err = ""
    delay = 5.0
    while True:
        attempt += 1
        try:
            if SELFTEST == "dead_backend":
                raise RuntimeError(
                    "Unable to initialize backend 'axon': UNAVAILABLE "
                    "(selftest)")
            import jax

            n = len(jax.devices())
            import jax.numpy as jnp

            float(jnp.zeros(()) + 1.0)  # force a real compile+execute
            return True, attempt, ""
        except Exception as e:  # noqa: BLE001 — any backend error retries
            last_err = f"{type(e).__name__}: {e}"
            print(f"[bench] backend init attempt {attempt} failed: "
                  f"{last_err[:300]}", file=sys.stderr)
        used = time.perf_counter() - t0
        if used + delay > retry_s or _remaining() < delay + 120.0:
            return False, attempt, last_err
        time.sleep(delay)
        delay = min(delay * 2.0, 120.0)


def _run_stats(times, dispatch_t0, fds, wall_total, warmup_s, done):
    """Honest aggregates for one pipeline run.

    times: per-call dispatch durations (s). dispatch_t0: per-frame call
    timestamps. fds: FrameData returned per frame (carry _finalized_wall
    once retired). wall_total: first-call -> post-flush wall. warmup_s:
    wall of the first WARMUP frames."""
    import numpy as np

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


def pipeline_fps(n_frames: int = 300, reserve_s: float = 0.0,
                 synchronous: bool = False, min_frames: int = 50):
    """Mono pipeline sustained fps. `reserve_s`: bail out of the frame loop
    early if the remaining global budget would dip below this (keeps later
    budget slices alive on a pathological tunnel)."""
    import numpy as np

    from orbslam_birdview_tpu.api.config import SlamConfig
    from orbslam_birdview_tpu.api.system import System
    from orbslam_birdview_tpu.core.camera import PinholeCamera
    from orbslam_birdview_tpu.utils import synth

    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    cfg = SlamConfig(sensor="mono")
    cfg.camera = cam
    if synchronous:
        cfg.tracking.synchronous = True
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
        if _remaining() < max(60.0, reserve_s) and done >= min_frames:
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
        from orbslam_birdview_tpu.utils.profiling import GLOBAL_TIMER

        print("--- tracker stages ---\n" + sys_.tracker.timer.summary(),
              file=sys.stderr)
        print("--- mapping stages ---\n" + GLOBAL_TIMER.summary(),
              file=sys.stderr)
    return stats


def bird_pipeline_fps(n_frames: int = 240, slice_s: float = 480.0):
    """Secondary: the fork's signature mono+birdview mode end-to-end at the
    reference's 2000-feature budget on BOTH streams
    (`Examples/Monocular/fisheye.yaml:28-41`, `src/Frame.cc:329`).

    Measured the same honest way as the headline (sustained wall-clock
    fps, warm-up excluded and reported) over >=200 frames — the r4 record
    sampled only 40 frames / 6 keyframes, far from steady state."""
    import numpy as np

    import jax.numpy as jnp

    from orbslam_birdview_tpu.api.config import SlamConfig
    from orbslam_birdview_tpu.api.system import System
    from orbslam_birdview_tpu.core import lie
    from orbslam_birdview_tpu.core.camera import BirdviewCamera, PinholeCamera
    from orbslam_birdview_tpu.frontend.orb import ORBConfig
    from orbslam_birdview_tpu.utils.synth import BirdSequence

    t_slice0 = time.perf_counter()

    def slice_left():
        return slice_s - (time.perf_counter() - t_slice0)

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
        if ((slice_left() < 30 or _remaining() < 90) and done >= 40):
            break
    sys_._flush()
    wall_total = time.perf_counter() - wall0
    s = _run_stats(times, t0s, fds, wall_total, warmup_end - wall0, done)
    out = {
        "bird_fps": round(s["sustained_fps"], 2),
        "bird_dispatch_median_ms": round(s["dispatch_median_ms"], 2),
        "bird_n_frames": done,
        "bird_keyframes": sys_.n_keyframes(),
    }
    if "pose_latency_ms" in s:
        out["bird_pose_latency_ms"] = round(s["pose_latency_ms"], 1)
    return out


def device_step_fps():
    """Pure device tracking-step scan (no host orchestration): the ceiling."""
    import numpy as np

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


def roofline():
    """MFU / utilization accounting (BASELINE.json north star is
    'speed-of-light per chip' — this makes it measurable, not rhetorical).

    Measures the chip's ACHIEVED matmul peak (large bf16 and int8
    matmuls, f32/i32 accumulation), then the achieved throughput of the
    two hot MXU stages with known analytic flop counts:

    - the Hamming distance matrix (frontend.matcher): an int8
      (P,256)x(256,K) matmul, 2*P*K*256 ops per frame — the engine
      computes it once per frame and reuses it for all matching stages;
    - the dense-W Schur local BA (graph.ba at the prewarm ladder shape):
      dominated by the W*(Hpp^-1 W^T) coupling products,
      ~2 * (6C)*(3P)*(6C) + 2*(E*per-edge) flops per LM iteration.

    mfu_* = achieved / measured same-precision peak. All timings use a
    jit-scanned loop so the tunnel dispatch RTT amortizes out."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    # every blocking call pays the tunnel round trip (~25-30 ms measured);
    # subtract it and size each kernel's repeat count so the device work
    # dominates — without this the "peak" was mostly RTT (measured 34.5
    # "TFLOP/s" for an 8-rep matmul chain whose program time was 6 ms
    # against a 29 ms round trip)
    triv = jax.jit(lambda: jnp.float32(1.0))
    float(np.asarray(triv()))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(triv()))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def timed(fn, n_calls=3):
        fn()  # compile
        ts = []
        for _ in range(n_calls):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return max(float(np.median(ts)) - rtt, 1e-5)

    out = {"roofline_rtt_ms": round(rtt * 1e3, 1)}
    N, REP = 4096, 64
    a16 = jnp.ones((N, N), jnp.bfloat16)
    b16 = jnp.ones((N, N), jnp.bfloat16)

    @jax.jit
    def peak_bf16():
        def body(c, _):
            c = jnp.dot(c, b16, preferred_element_type=jnp.float32)
            return c.astype(jnp.bfloat16), None
        o, _ = lax.scan(body, a16, None, length=REP)
        return jnp.sum(o.astype(jnp.float32))

    t = timed(lambda: float(np.asarray(peak_bf16())))
    out["tflops_peak_bf16"] = REP * 2 * N**3 / t / 1e12

    a8 = jnp.ones((N, N), jnp.int8)
    b8 = jnp.ones((N, N), jnp.int8)

    @jax.jit
    def peak_int8():
        def body(c, i):
            o = jnp.dot(a8 + (c % 2).astype(jnp.int8), b8,
                        preferred_element_type=jnp.int32)
            # NONLINEAR full reduction: consuming one element lets XLA
            # dead-code the matmul down to a single inner product
            # (measured 880,000 "TOPS"), and a plain sum is algebraically
            # rewritable to O(N^2)
            return jnp.sum(jnp.minimum(o, 7)).astype(jnp.int32), None
        o, _ = lax.scan(body, jnp.int32(0), None, length=REP)
        return o

    t = timed(lambda: int(np.asarray(peak_int8())))
    out["tops_peak_int8"] = REP * 2 * N**3 / t / 1e12

    # Hamming matrix at the production shape: P=2048 frame kps x K=2048
    # map/KF kps, 256-bit descriptors in +-1 int8 form
    P = K = 2048
    rng = np.random.default_rng(0)
    dp = jnp.asarray((rng.integers(0, 2, (P, 256)) * 2 - 1).astype(np.int8))
    dk = jnp.asarray((rng.integers(0, 2, (K, 256)) * 2 - 1).astype(np.int8))
    HREP = 4096

    @jax.jit
    def hamming_rep():
        def body(c, _):
            # carry-dependent input so XLA cannot hoist the matmul out
            # of the scan as loop-invariant
            dpx = dp.at[0, 0].add((c % 2).astype(jnp.int8))
            dot = jnp.dot(dpx, dk.T, preferred_element_type=jnp.int32)
            ham = (256 - dot) // 2
            return c + ham[0, 0], None
        o, _ = lax.scan(body, jnp.int32(0), None, length=HREP)
        return o

    t = timed(lambda: int(np.asarray(hamming_rep())))
    ham_tops = HREP * 2 * P * K * 256 / t / 1e12
    out["tops_hamming_int8"] = ham_tops
    out["mfu_hamming"] = ham_tops / max(out["tops_peak_int8"], 1e-9)

    # dense-W Schur local BA at the production prewarm shape
    from orbslam_birdview_tpu.graph import ba

    C, Pn, E = 48, 8192, 16384
    it1, it2 = 5, 10
    Rc = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3))
    tc = jnp.zeros((C, 3), jnp.float32)
    fixed = jnp.zeros(C, bool).at[0].set(True)
    pts = jnp.concatenate([jnp.asarray(
        rng.uniform(-3, 3, (Pn, 2)).astype(np.float32)),
        jnp.full((Pn, 1), 8.0, jnp.float32)], 1)
    ecam = jnp.asarray(rng.integers(0, C, E).astype(np.int32))
    ept = jnp.asarray(rng.integers(0, Pn, E).astype(np.int32))
    X = np.asarray(pts)[np.asarray(ept)]
    obs = np.stack([500.0 * X[:, 0] / X[:, 2] + 320.0,
                    500.0 * X[:, 1] / X[:, 2] + 240.0], -1)
    es = ba.EdgeSet(ecam, ept, jnp.asarray(obs.astype(np.float32)),
                    jnp.ones(E, jnp.float32), jnp.ones(E, bool))
    aux = ba.EdgeSet(jnp.zeros(E // 4, jnp.int32),
                     jnp.zeros(E // 4, jnp.int32),
                     jnp.full((E // 4, 3), 1.0, jnp.float32),
                     jnp.zeros(E // 4, jnp.float32),
                     jnp.zeros(E // 4, bool))

    def run_ba():
        r = ba.bundle_adjust(
            Rc, tc, fixed, jnp.ones(C, bool), pts, jnp.ones(Pn, bool),
            es, aux, aux, 500.0, 500.0, 320.0, 240.0, bf=0.0,
            iters_phase1=it1, iters_phase2=it2)
        jax.block_until_ready(r.cam_R)

    t = timed(run_ba)
    iters = it1 + it2
    # per iteration: S = Hcc - W Hpp^-1 W^T with W (6C,3P) materialized;
    # the two coupling matmuls dominate: 2 * [ (6C)(3P)(6C) ] * 2 flops,
    # plus edge assembly ~E * 2 * (6*3*2 reproj jacobian products) ~ small
    w_flops = 2 * 2 * (6 * C) * (3 * Pn) * (6 * C)
    out["tflops_schur"] = iters * w_flops / t / 1e12
    out["mfu_schur"] = (out["tflops_schur"]
                        / max(out["tflops_peak_bf16"], 1e-9))
    return {k: round(v, 3) for k, v in out.items()}


def child_main():
    if SELFTEST == "stall":
        time.sleep(10 ** 6)
    ok, attempts, err = _init_backend_with_retry()
    if not ok:
        print(json.dumps({
            "metric": HEADLINE_METRIC,
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": "backend_unavailable",
            "init_attempts": attempts,
            "last_error": err[:300],
        }))
        sys.stdout.flush()
        return
    if SELFTEST == "stall_after_headline":
        print(json.dumps({
            "metric": HEADLINE_METRIC, "value": 1.0, "unit": "frames/s",
            "vs_baseline": 0.033, "selftest": "stall_after_headline"}))
        sys.stdout.flush()
        time.sleep(10 ** 6)
    import jax

    def tunnel_health():
        """Measured link state, recorded with every result: the tunnel is
        bimodal (r4: two back-to-back runs differ up to 5x; today's
        probes measured D2H from 14 MB/s down to ~0.1 MB/s) — a perf
        number without the link state it ran under is not interpretable."""
        import numpy as np

        import jax.numpy as jnp

        triv = jax.jit(lambda: jnp.float32(1.0))
        float(np.asarray(triv()))
        rtts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(triv()))
            rtts.append(time.perf_counter() - t0)
        mk = jax.jit(lambda i: jnp.full((512, 512), i, jnp.float32))
        jax.block_until_ready(mk(0))
        bws = []
        for i in range(3):
            # a FRESH device array per fetch: jax.Array caches its host
            # copy after the first conversion, so re-fetching the same
            # array measures nothing (observed 0.1 ms for 1 MB)
            big = mk(i + 1)
            jax.block_until_ready(big)
            t0 = time.perf_counter()
            np.asarray(big)
            bws.append(time.perf_counter() - t0)
        rtt = float(np.median(rtts))
        # report the raw 1 MB fetch wall (unambiguous): deriving MB/s by
        # subtracting the RTT explodes when the transfer rides inside the
        # round trip (a fast link measured a nonsense 10 GB/s)
        return {"tunnel_rtt_ms": round(rtt * 1e3, 1),
                "tunnel_d2h_1mb_ms": round(float(np.median(bws)) * 1e3,
                                           1)}

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

    try:
        health = tunnel_health()
    except Exception:  # pragma: no cover
        health = {}
    pipe = pipeline_fps(reserve_s=420.0)
    line = {
        "metric": HEADLINE_METRIC,
        "value": round(pipe["sustained_fps"], 2),
        "unit": "frames/s",
        "vs_baseline": round(pipe["sustained_fps"] / 30.0, 3),
        "wall_total_s": round(pipe["wall_total_s"], 2),
        "warmup_s": round(pipe["warmup_s"], 2),
        "warmup_frames": pipe["warmup_frames"],
        "dispatch_median_ms": round(pipe["dispatch_median_ms"], 2),
        "dispatch_p90_ms": round(pipe["dispatch_p90_ms"], 2),
        "dispatch_mean_ms": round(pipe["dispatch_mean_ms"], 2),
        "init_attempts": attempts,
        **health,
        "n_frames": pipe["n_frames"],
        "tracked_frames": pipe["tracked_frames"],
        "keyframes": pipe["keyframes"],
        "ate_rmse_m": round(pipe["ate_rmse_m"], 4),
    }
    for k in ("pose_latency_ms", "pose_latency_p90_ms",
              "summary_batch_mean", "forced_block_s", "prewarm_s"):
        if k in pipe:
            line[k] = round(pipe[k], 2)
    # the headline record exists from this point on, whatever happens to
    # the secondaries — print-and-flush FIRST (the parent keeps the last
    # complete line it saw)
    print(json.dumps(line))
    sys.stdout.flush()

    def add(extras):
        line.update({k: (round(v, 2) if isinstance(v, float) else v)
                     for k, v in extras.items()})
        print(json.dumps(line))
        sys.stdout.flush()

    # each secondary gets its own bounded budget slice; one slow
    # secondary can no longer consume the rest (r4: the bird bench ate
    # the device_step slice and the field silently vanished)
    secondaries = [
        ("bird", lambda: bird_pipeline_fps(
            slice_s=min(max(_remaining() - 220.0, 120.0), 480.0)), 160.0),
        ("sync", lambda: {
            "sync_fps": round(pipeline_fps(
                n_frames=150, reserve_s=_remaining() - 150.0,
                synchronous=True, min_frames=40)["sustained_fps"], 2)},
         140.0),
        ("device_step", lambda: {
            "device_step_fps": round(device_step_fps(), 1)}, 70.0),
        ("roofline", roofline, 50.0),
    ]
    for name, fn, min_budget in secondaries:
        if _remaining() < min_budget:
            print(f"[bench] skipping {name}: {_remaining():.0f}s left "
                  f"< {min_budget:.0f}s slice", file=sys.stderr)
            continue
        try:
            add(fn())
        except Exception as e:  # pragma: no cover
            print(f"[bench] {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        try:
            child_main()
        finally:
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)  # the tunnel backend can hang interpreter teardown
    else:
        rc = parent_main()
        sys.stdout.flush()
        os._exit(rc)
