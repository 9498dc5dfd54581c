"""Behavior tests for the tools/tpu_stage.sh stall watchdog.

The watchdog guards every long TPU battery stage, so its state machine is
load-bearing infrastructure: a deterministic crash must surface quickly
(CRASH_RETRIES, not the stall budget), a silent hang must be killed and
retried (MAX_RETRIES stall-kills), and a clean exit must pass rc=0
through. All paths are exercised hermetically with HEALTH_CMD=true and
second-scale timeouts - no TPU, no tunnel.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAGE = os.path.join(REPO, "tools", "tpu_stage.sh")

pytestmark = pytest.mark.skipif(sys.platform != "linux", reason="uses /proc")


def run_stage(tmp_path, cmd, timeout=60, **env_over):
    env = dict(os.environ)
    env.update(
        POLL_SECS="1", STALL_SECS="2", SETTLE_SECS="0",
        MAX_RETRIES="1", CRASH_RETRIES="1", HEALTH_CMD="true",
    )
    env.update({k: str(v) for k, v in env_over.items()})
    log = tmp_path / "stage.log"
    proc = subprocess.run(
        ["bash", STAGE, str(log), "--"] + cmd,
        env=env, timeout=timeout, capture_output=True,
    )
    return proc.returncode, log.read_text() if log.exists() else ""


def test_clean_exit_passes_through(tmp_path):
    rc, log = run_stage(tmp_path, ["sh", "-c", "echo hi"])
    assert rc == 0
    assert "done (attempt 1)" in log


def test_deterministic_crash_fails_fast_with_zero_crash_retries(tmp_path):
    rc, log = run_stage(tmp_path, ["sh", "-c", "exit 7"], CRASH_RETRIES="0")
    assert rc == 7
    assert "not a stall" in log
    assert log.count("attempt") == 1


def test_crash_retries_once_then_surfaces_exit_code(tmp_path):
    rc, log = run_stage(tmp_path, ["sh", "-c", "exit 7"], CRASH_RETRIES="1")
    assert rc == 7
    assert log.count("[tpu_stage] attempt") == 2
    assert "crash 1/1" in log


def test_transient_crash_recovers_on_retry(tmp_path):
    marker = tmp_path / "ran_once"
    rc, log = run_stage(
        tmp_path,
        ["sh", "-c", f"if [ -f {marker} ]; then echo ok; else touch {marker}; exit 1; fi"],
    )
    assert rc == 0
    assert "done (attempt 2)" in log


def test_silent_hang_is_stall_killed_and_bounded(tmp_path):
    # a command that produces no output and no IO growth: the watchdog must
    # kill it after ~STALL_SECS and, with MAX_RETRIES=0, give up with rc=2
    rc, log = run_stage(tmp_path, ["sleep", "600"], MAX_RETRIES="0")
    assert rc == 2
    assert "killing pgid" in log
    assert "giving up after 1 stall-kills" in log


def test_io_counters_beyond_2gb_do_not_break_the_watchdog(tmp_path):
    """Regression: awk's default print renders io sums beyond ~2^31 in
    scientific notation ("3.56946e+09"), which was a fatal bash arithmetic
    error — the watchdog aborted straight to 'giving up' WITHOUT killing
    the healthy stage (hit by the whale battery once chunked checkpoint
    fetches pushed the trainer's counters past 2 GB)."""
    stage = tmp_path / "big_io_stage.sh"
    stage.write_text(
        "#!/bin/bash\n"
        # >2^31 of rchar fast (reads of /dev/zero count), then idle long
        # enough for several watchdog polls to parse the huge counter
        "dd if=/dev/zero of=/dev/null bs=1M count=2200 2>/dev/null\n"
        'echo "io done"\n'
        "for i in $(seq 6); do echo tick $i; sleep 1; done\n"
        "exit 0\n"
    )
    log = tmp_path / "stage.log"
    env = dict(
        os.environ, STALL_SECS="30", POLL_SECS="1", SETTLE_SECS="0",
        HEALTH_CMD="true",
    )
    proc = subprocess.run(
        ["bash", STAGE, str(log), "--", "bash", str(stage)],
        env=env, timeout=120, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert "syntax error" not in proc.stderr
    assert "done" in log.read_text()


def test_stall_retry_then_success(tmp_path):
    # first attempt hangs silently and is stall-killed; the retry (same
    # command, but the marker now exists) exits cleanly - the resumable-
    # stage contract every battery stage relies on
    marker = tmp_path / "first_attempt"
    rc, log = run_stage(
        tmp_path,
        ["sh", "-c", f"if [ -f {marker} ]; then echo resumed; else touch {marker}; sleep 600; fi"],
        timeout=90,
    )
    assert rc == 0
    assert "killing pgid" in log
    assert "done (attempt 2)" in log
