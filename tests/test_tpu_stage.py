"""tools/tpu_stage.sh — stall watchdog for TPU stages on the flaky
single-tenant tunnel (kills a stage whose log stops growing, health-probes,
retries the resumable command)."""
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stall_kill_and_retry(tmp_path):
    stage = tmp_path / "flaky_stage.sh"
    marker = tmp_path / "marker"
    stage.write_text(
        "#!/bin/bash\n"
        f'M="{marker}"\n'
        'if [ ! -f "$M" ]; then\n'
        '  touch "$M"\n'
        '  echo "starting (will stall)"\n'
        "  sleep 600\n"
        "else\n"
        '  echo "resumed fine"\n'
        "  exit 0\n"
        "fi\n"
    )
    log = tmp_path / "stage.log"
    env = dict(
        os.environ, STALL_SECS="4", POLL_SECS="2", SETTLE_SECS="1", HEALTH_CMD="true"
    )
    rc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "tpu_stage.sh"), str(log), "--",
         "bash", str(stage)],
        env=env, timeout=90,
    ).returncode
    assert rc == 0
    text = log.read_text()
    assert "no log/io activity" in text and "killing pgid" in text
    assert "attempt 2" in text and "resumed fine" in text and "done" in text


def test_failing_command_retries_then_gives_up(tmp_path):
    log = tmp_path / "stage.log"
    env = dict(
        os.environ, STALL_SECS="4", POLL_SECS="1", SETTLE_SECS="0",
        MAX_RETRIES="1", HEALTH_CMD="true",
    )
    rc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "tpu_stage.sh"), str(log), "--",
         "false"],
        env=env, timeout=60,
    ).returncode
    assert rc == 2
    assert "giving up" in log.read_text()


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
        ["bash", os.path.join(REPO, "tools", "tpu_stage.sh"), str(log), "--",
         "bash", str(stage)],
        env=env, timeout=120, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert "syntax error" not in proc.stderr
    assert "done" in log.read_text()
