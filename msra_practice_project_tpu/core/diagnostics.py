"""Tracing / profiling / numerical-sanitiser subsystem.

The reference's only observability is tqdm + wall-clock prints, and its only
sanitizer is a globally-enabled `torch.autograd.set_detect_anomaly(True)`
(nerf/nerf.py:2 — an always-on train-speed tax).  Here both are first-class
and opt-in per config:

  * ``debug_nans: true``    -> jax_debug_nans (re-runs failing computations
                               un-jitted and pinpoints the primitive).
  * ``profile_steps: N``    -> capture a jax.profiler trace (TensorBoard /
                               Perfetto format) of N hot-loop steps into
                               <log_dir>/profile/.
  * ``watchdog_timeout: S`` -> hang detector (Watchdog below): if the train
                               loop stops heartbeating for S seconds the
                               process hard-exits with code 17 so a
                               supervisor (tools/supervise.py) can restart
                               it; checkpoint auto-resume makes the restart
                               lossless.  The reference has no failure
                               detection at all (SURVEY §5) — its recovery
                               story is a human re-running the script.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import jax


def enable_from_config(config) -> None:
    if config.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)


class StepProfiler:
    """Traces steps [skip, skip + steps) of a training loop.

    Usage:
        prof = StepProfiler(log_path, config.get("profile_steps", 0))
        for step in ...:
            prof.tick(step)
            ...
        prof.stop()
    """

    def __init__(self, log_path: str, steps: int = 0, skip: int = 10):
        self.dir = os.path.join(log_path, "profile")
        self.steps = steps
        self.skip = skip
        self._active = False
        self._done = steps <= 0

    def tick(self, step: int) -> None:
        if self._done:
            return
        if not self._active and step > self.skip:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True
            self._start = step
        elif self._active and step >= self._start + self.steps:
            self.stop()

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f"[profile] trace written to {self.dir}")


class Watchdog:
    """Hang detector for long device runs.

    The TPU tunnel can wedge mid-run (a dispatch or host sync that never
    returns — observed in practice as ~an hour of silence with the process
    blocked at 0% CPU).  A Python-level timeout cannot interrupt a stuck
    extension call, so the only reliable recovery is process-level: a
    daemon thread watches a heartbeat the train loop touches every
    iteration, and if it goes stale for ``timeout_s`` seconds the process
    hard-exits with :data:`EXIT_CODE`.  ``tools/supervise.py`` restarts on
    that code and checkpoint auto-resume (core/ckpt.py scan-resume; exact
    kill-anywhere resume in train_nerf) continues the run losslessly.

    ``timeout_s <= 0`` disables the watchdog (no thread started) — every
    method stays callable so call sites need no conditionals.  Pick a
    timeout larger than the longest legitimate heartbeat gap: a cold remote
    compile can take ~350 s, so long-run tooling uses >= 900 s.
    """

    EXIT_CODE = 17

    def __init__(self, timeout_s: float, log_path: str | None = None):
        self.timeout = float(timeout_s)
        self.log_path = log_path
        self._last = time.monotonic()
        self._note = ""
        self._paused = False
        self._stop_evt = threading.Event()
        self._thread = None
        if self.timeout > 0:
            self._thread = threading.Thread(
                target=self._run, daemon=True, name="msra-tpu-watchdog")
            self._thread.start()

    @property
    def enabled(self) -> bool:
        return self._thread is not None

    def beat(self, note: str = "") -> None:
        """Mark liveness (call once per host-visible loop iteration)."""
        self._note = note
        self._last = time.monotonic()

    def pause(self) -> None:
        """Temporarily blind the watchdog for a legitimately-long HOST-side
        phase (e.g. marching a 512^3 grid) that cannot wedge on the device.
        Unlike stop(), the thread stays alive and resume() re-arms it —
        a stop()+new-Watchdog pair at every mesh cadence would leak
        threads."""
        self._paused = True

    def resume(self) -> None:
        self._last = time.monotonic()
        self._paused = False

    def stop(self) -> None:
        """Disarm (call when leaving the watched region — e.g. before long
        host-side finalisation like mesh extraction)."""
        self._stop_evt.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    def _run(self) -> None:
        poll = max(min(self.timeout / 4.0, 5.0), 0.05)
        while not self._stop_evt.wait(poll):
            if self._paused:
                continue
            stalled = time.monotonic() - self._last
            if stalled > self.timeout:
                msg = (f"[watchdog] no heartbeat for {stalled:.0f}s "
                       f"(timeout {self.timeout:.0f}s) — device/tunnel "
                       f"presumed wedged (last note: {self._note!r}); "
                       f"exiting with code {self.EXIT_CODE} for supervised "
                       "restart\n")
                sys.stderr.write(msg)
                sys.stderr.flush()
                if self.log_path:
                    try:
                        with open(os.path.join(self.log_path,
                                               "watchdog.log"), "a") as f:
                            f.write(msg)
                    except OSError:
                        pass
                os._exit(self.EXIT_CODE)


def watchdog_from_config(config, log_path: str | None = None) -> Watchdog:
    """``watchdog_timeout`` seconds from config; 0/absent = disabled."""
    return Watchdog(float(config.get("watchdog_timeout", 0)), log_path)
