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
"""

from __future__ import annotations

import os

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
