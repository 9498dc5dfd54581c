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


def sync(tree) -> Optional[float]:
    """Hard execution barrier: force completion of the computation that
    produced ``tree`` by copying every array leaf device->host.

    On the experimental 'axon' TPU platform ``jax.block_until_ready``
    can return before device execution has finished (it synchronizes
    dispatch, not execution), which silently turns wall-clock timing into
    dispatch timing — round 1's headline numbers were inflated ~80-100x
    by exactly this. A device-to-host value fetch is the only reliable
    barrier there, so every timed region must end with ``sync(result)``,
    never ``block_until_ready``.

    Returns the first size-1 leaf as a float (convenient for asserting
    finiteness), else None.
    """
    import jax
    import numpy as np

    out: Optional[float] = None
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            host = np.asarray(leaf)
            if out is None and host.size == 1:
                out = float(host.reshape(()))
    return out


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
