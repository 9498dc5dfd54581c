"""Profiling: first-class device traces + step timing.

The reference has no profiling at all (SURVEY §5 — tqdm postfix strings
only). Here: ``trace()`` wraps a region in a ``jax.profiler`` trace that
XProf/TensorBoard can open, and ``StepTimer`` accumulates wall-clock
steps/sec with warmup exclusion (compile time must not pollute
throughput numbers — first-call compile on the TPU is O(minutes) for the
GAN epoch programs).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/imagecfgen-trace") -> Iterator[None]:
    """Capture a device trace for the enclosed region:

        with trace("/tmp/tr"):
            state, m = trainer.fit_epoch(state, data, key)
            jax.block_until_ready(m)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput accounting with warmup exclusion."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self._seen = 0
        self._steps = 0
        self._elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup_steps:
            self._steps += 1
            self._elapsed += dt
        return False

    def tick(self, n_steps: int = 1):
        """Manual variant: call after each timed unit of ``n_steps``."""
        now = time.perf_counter()
        if self._t0 is not None:
            dt = now - self._t0
            self._seen += 1
            if self._seen > self.warmup_steps:
                self._steps += n_steps
                self._elapsed += dt
        self._t0 = now

    @property
    def steps_per_sec(self) -> float:
        return self._steps / self._elapsed if self._elapsed else float("nan")
