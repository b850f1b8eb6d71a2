"""Failure-detection subsystem: core.diagnostics.Watchdog + tools/supervise.py.

The reference has no failure detection (SURVEY §5 — recovery is a human
re-running the script).  Here a stalled train loop hard-exits with a
distinct code and the supervisor restarts it onto checkpoint auto-resume.
"""

import os
import subprocess
import sys
import textwrap
import time

from msra_practice_project_tpu.core.diagnostics import (Watchdog,
                                                        watchdog_from_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, timeout=180):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)


def test_watchdog_fires_and_exits_17(tmp_path):
    script = tmp_path / "stall.py"
    script.write_text(textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {REPO!r})
        from msra_practice_project_tpu.core.diagnostics import Watchdog
        w = Watchdog(0.3, log_path={str(tmp_path)!r})
        time.sleep(30)   # never beats -> watchdog must kill us
        sys.exit(0)
    """))
    r = _run([sys.executable, str(script)])
    assert r.returncode == Watchdog.EXIT_CODE, (r.returncode, r.stderr)
    assert "no heartbeat" in r.stderr
    # diagnostic also lands in <log_path>/watchdog.log
    assert "no heartbeat" in (tmp_path / "watchdog.log").read_text()


def test_watchdog_beats_prevent_firing():
    w = Watchdog(0.6)
    assert w.enabled
    for _ in range(15):          # 1.5 s of regular beats > timeout
        w.beat("step n")
        time.sleep(0.1)
    w.stop()                     # if it had fired, the process would be gone
    assert not w.enabled


def test_watchdog_disabled_is_noop():
    w = watchdog_from_config({"watchdog_timeout": 0})
    assert not w.enabled
    w.beat()                     # all methods callable with no thread
    w.stop()
    with watchdog_from_config({}) as w2:
        assert not w2.enabled


def test_supervise_restarts_on_watchdog_exit(tmp_path):
    marker = tmp_path / "marker"
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent("""
        import os, sys
        m = sys.argv[1]
        if not os.path.exists(m):
            open(m, "w").close()
            sys.exit(17)         # simulated watchdog stall on first attempt
        sys.exit(0)
    """))
    r = _run([sys.executable, "tools/supervise.py", "--cooldown", "0", "--",
              sys.executable, str(child), str(marker)])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "attempt 2" in r.stdout
    assert "success after 2 attempt(s)" in r.stdout


def test_supervise_does_not_restart_other_exits(tmp_path):
    child = tmp_path / "child.py"
    child.write_text("import sys; sys.exit(3)\n")
    r = _run([sys.executable, "tools/supervise.py", "--cooldown", "0", "--",
              sys.executable, str(child)])
    assert r.returncode == 3
    assert "not restartable" in r.stdout
    assert "attempt 2" not in r.stdout


def test_supervise_retry_any_bounded(tmp_path):
    child = tmp_path / "child.py"
    child.write_text("import sys; sys.exit(3)\n")
    r = _run([sys.executable, "tools/supervise.py", "--cooldown", "0",
              "--retry-any", "--max-restarts", "2", "--",
              sys.executable, str(child)])
    assert r.returncode == 3
    assert "attempt 3" in r.stdout         # 1 original + 2 restarts
    assert "attempt 4" not in r.stdout


def test_supervise_exports_attempt_number(tmp_path):
    """Children see SUPERVISE_ATTEMPT so a restart (attempt > 1) can switch
    to resume semantics even when the original argv lacked a resume flag
    (tools/validate_pigan.py relies on this to not wipe its experiment dir
    after a watchdog restart)."""
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent("""
        import os, sys
        a = os.environ["SUPERVISE_ATTEMPT"]
        print("attempt-env=" + a)
        sys.exit(17 if a == "1" else 0)
    """))
    r = _run([sys.executable, "tools/supervise.py", "--cooldown", "0", "--",
              sys.executable, str(child)])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "attempt-env=1" in r.stdout
    assert "attempt-env=2" in r.stdout


def test_supervise_sigterm_stops_child_and_suppresses_restart(tmp_path):
    """SIGTERM to the supervisor must be forwarded to the child (no orphan
    trainer contending for the chip) and must suppress restarts — this is
    how a long run is stopped at a deadline (`timeout N supervise.py ...`)."""
    marker = tmp_path / "child_pid"
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import os, time
        open({str(marker)!r}, "w").write(str(os.getpid()))
        time.sleep(60)
    """))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "tools/supervise.py", "--cooldown", "0", "--",
         sys.executable, str(child)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, text=True)
    deadline = time.time() + 30
    while not marker.exists() and time.time() < deadline:
        time.sleep(0.1)
    assert marker.exists(), "child never started"
    child_pid = int(marker.read_text())
    proc.send_signal(subprocess.signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 128 + 15, (proc.returncode, out)
    assert "not restarting" in out
    assert "attempt 2" not in out
    # the child must be gone (kill 0 probes liveness without sending)
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            os.kill(child_pid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.1)
    else:
        raise AssertionError(f"child {child_pid} still alive after SIGTERM")


def test_watchdog_pause_blinds_then_resume_rearms(tmp_path):
    """pause() must survive a heartbeat gap longer than the timeout (the
    legitimate host-side marching pass), and resume() must re-arm from a
    fresh heartbeat."""
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {REPO!r})
        from msra_practice_project_tpu.core.diagnostics import Watchdog
        w = Watchdog(0.4)
        w.beat("work")
        w.pause()
        time.sleep(1.2)      # > timeout: would fire if not paused
        w.resume()
        time.sleep(0.2)      # < timeout after the resume reset
        w.stop()
        print("SURVIVED")
    """))
    r = _run([sys.executable, str(child)])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SURVIVED" in r.stdout


def test_watchdog_fires_after_resume(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {REPO!r})
        from msra_practice_project_tpu.core.diagnostics import Watchdog
        w = Watchdog(0.4)
        w.pause()
        w.resume()
        time.sleep(5)        # stalled while armed -> exit 17
        print("UNREACHABLE")
    """))
    r = _run([sys.executable, str(child)])
    assert r.returncode == 17
    assert "UNREACHABLE" not in r.stdout
