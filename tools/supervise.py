"""Restart-on-stall supervisor for long TPU runs.

Pairs with core/diagnostics.Watchdog: a trainer configured with
``watchdog_timeout: S`` hard-exits with code 17 when its heartbeat stalls
(wedged tunnel / stuck dispatch).  This wrapper re-runs the command until it
exits 0, relying on checkpoint auto-resume (core/ckpt.py scan-resume; exact
kill-anywhere resume in train_nerf; stage re-derivation + loss_log sidecar
in train_pigan) to make each restart lossless.

The reference framework has no failure detection (SURVEY §5: recovery =
a human restarting the script); this makes that loop automatic.

Usage:
    python tools/supervise.py [--max-restarts N] [--cooldown S] [--retry-any] \
        -- <command> [args...]

    python tools/supervise.py -- python -m \
        msra_practice_project_tpu.train.train_nerf configs/nerf/lego.json \
        watchdog_timeout=900

By default only the watchdog exit code (17) triggers a restart; --retry-any
also restarts on any other nonzero exit (crash-looping protection still
bounded by --max-restarts).  --cooldown defaults to 180 s: a freshly wedged
tunnel needs ~3 minutes to recover before even a tiny dispatch succeeds
(measured; see CLAUDE.md), so restarting immediately would just wedge again.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

WATCHDOG_EXIT = 17  # keep in sync with core/diagnostics.Watchdog.EXIT_CODE


def supervise(cmd: list[str], max_restarts: int = 10, cooldown: float = 180.0,
              retry_any: bool = False) -> int:
    """Run cmd, restarting on watchdog exits; returns the final exit code.

    SIGTERM/SIGINT to the supervisor is forwarded to the running child and
    suppresses any further restart (checkpoint auto-resume makes the stop
    lossless) — so ``timeout N python tools/supervise.py -- ...`` or killing
    the supervisor's pid cleanly stops the whole tree instead of orphaning
    a trainer that would keep contending for the chip."""
    state = {"proc": None, "stop": None}

    def _on_stop(signum, frame):
        state["stop"] = signum
        p = state["proc"]
        if p is not None and p.poll() is None:
            try:
                p.terminate()
            except OSError:
                pass

    prev = {}
    for s in (signal.SIGTERM, signal.SIGINT):
        try:
            prev[s] = signal.signal(s, _on_stop)
        except ValueError:  # not the main thread (library use from a test)
            pass

    try:
        return _supervise_loop(cmd, max_restarts, cooldown, retry_any, state)
    finally:
        for s, h in prev.items():
            signal.signal(s, h)


def _supervise_loop(cmd, max_restarts, cooldown, retry_any, state) -> int:
    attempt = 0
    while True:
        attempt += 1
        print(f"[supervise] attempt {attempt}: {' '.join(cmd)}", flush=True)
        # Children can detect a supervised RESTART (attempt > 1) and switch
        # to resume semantics even when their argv lacks an explicit resume
        # flag — otherwise a tool that wipes its own experiment dir on a
        # fresh start would restart long runs from zero after every wedge.
        env = dict(os.environ, SUPERVISE_ATTEMPT=str(attempt))
        proc = subprocess.Popen(cmd, env=env)
        state["proc"] = proc
        try:
            rc = proc.wait()
        except KeyboardInterrupt:   # SIGINT raced past the handler install
            state["stop"] = signal.SIGINT
            if proc.poll() is None:
                proc.terminate()
            rc = proc.wait()
        if state["stop"] is not None:
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            print(f"[supervise] stop signal {state['stop']}; child "
                  f"terminated (rc={rc}), not restarting", flush=True)
            return 128 + int(state["stop"])
        if rc == 0:
            print(f"[supervise] success after {attempt} attempt(s)",
                  flush=True)
            return 0
        restartable = (rc == WATCHDOG_EXIT) or (retry_any and rc != 0)
        if not restartable:
            print(f"[supervise] exit {rc} is not restartable; giving up",
                  flush=True)
            return rc
        if attempt > max_restarts:
            print(f"[supervise] exit {rc} but max restarts "
                  f"({max_restarts}) exhausted", flush=True)
            return rc
        why = "watchdog stall" if rc == WATCHDOG_EXIT else f"exit {rc}"
        print(f"[supervise] {why}; restarting in {cooldown:.0f}s "
              f"({max_restarts - attempt + 1} restart(s) left)", flush=True)
        deadline = time.time() + cooldown
        while time.time() < deadline:        # interruptible cooldown
            if state["stop"] is not None:
                print(f"[supervise] stop signal {state['stop']} during "
                      "cooldown; not restarting", flush=True)
                return 128 + int(state["stop"])
            time.sleep(min(1.0, max(deadline - time.time(), 0.0)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Restart-on-stall supervisor (see module docstring)")
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--cooldown", type=float, default=180.0,
                    help="seconds to wait before a restart (wedged tunnels "
                         "need ~180 s to recover)")
    ap.add_argument("--retry-any", action="store_true",
                    help="restart on ANY nonzero exit, not just the "
                         "watchdog code")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to run")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: supervise.py [opts] -- cmd ...)")
    return supervise(cmd, args.max_restarts, args.cooldown, args.retry_any)


if __name__ == "__main__":
    sys.exit(main())
