"""Forced-failure self-tests for the bench supervisor (VERDICT r4 item 1).

Two of four rounds produced NO perf record because the tunnel backend
either died at init (r4: rc=1 with a traceback) or stalled inside a
remote call past every between-frame deadline check (r2: rc=124). The
bench is now a watchdog parent + worker child; these tests force each
observed failure mode via BENCH_SELFTEST and assert the contract the
driver depends on: **rc=0 and exactly one parseable JSON record line on
stdout, inside the budget, no matter what the backend does.**
"""
import json
import os
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def run_bench(selftest: str, budget_s: float, extra_env=None,
              timeout_s: float = 90.0):
    env = dict(os.environ)
    env.pop("BENCH_CHILD", None)
    env["BENCH_SELFTEST"] = selftest
    env["BENCH_BUDGET_S"] = str(budget_s)
    # the self-tests must not touch the real tunnel backend
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env or {})
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        env=env, timeout=timeout_s)
    wall = time.perf_counter() - t0
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    return proc, lines, wall


def parse_single_record(lines):
    assert len(lines) == 1, f"expected ONE json line, got: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "pipeline_sustained_fps_1chip"
    assert "value" in rec and "vs_baseline" in rec
    return rec


def test_dead_backend_yields_rc0_diagnostic_record():
    """r4 failure mode: backend UNAVAILABLE at first device touch. The
    child must retry, give up inside its retry budget, and print an rc=0
    diagnostic record instead of raising out of main (BENCH_r04.json was
    rc=1 with a traceback and parsed:null)."""
    proc, lines, wall = run_bench(
        "dead_backend", budget_s=60.0,
        extra_env={"BENCH_INIT_RETRY_S": "2"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = parse_single_record(lines)
    assert rec["value"] == 0.0
    assert rec["error"] == "backend_unavailable"
    assert rec["init_attempts"] >= 1
    assert wall < 60.0


def test_stalled_call_is_killed_and_record_still_prints():
    """r2 failure mode: one blocked remote call defeats every
    between-frame deadline (observed 21+ min past a 900 s budget). The
    parent watchdog must SIGKILL the child process group at the hard
    deadline and still print a parseable rc=0 record."""
    proc, lines, wall = run_bench("stall", budget_s=45.0)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = parse_single_record(lines)
    assert rec["value"] == 0.0
    assert rec["error"] == "watchdog_timeout"
    # parent deadline is budget-35 => ~10 s; generous slack for CI load
    assert wall < 44.0, f"watchdog fired too late: {wall:.1f}s"


def test_stall_after_headline_preserves_headline():
    """A secondary bench hanging after the headline printed (r4: the bird
    bench overran its budget) must not cost the record: the parent keeps
    the last complete line and marks the kill."""
    proc, lines, wall = run_bench("stall_after_headline", budget_s=55.0)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = parse_single_record(lines)
    assert rec["value"] == 1.0  # the selftest headline, not a diagnostic
    assert rec.get("watchdog_killed_secondary") is True
    assert wall < 54.0
