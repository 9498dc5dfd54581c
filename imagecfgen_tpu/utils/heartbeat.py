"""Liveness heartbeat for silent long-running phases under the stage
watchdog.

``tools/tpu_stage.sh`` kills a stage after ~6-7 min with no log growth and
no process IO. Three phases legitimately look exactly like that wedge:

- flax ``to_bytes``/``msgpack_restore`` of a multi-GB checkpoint (pure CPU,
  page-cached file, minutes on this 1-core host);
- the first XLA compile of a large program: with the axon PJRT plugin the
  compile is a server-side RPC, so the client sits in a futex wait with
  zero IO (the 512^2 ESRF eval graph measured >7 min);
- a long jitted device execution awaited synchronously.

Wrap any such phase in ``with Heartbeat("label"):`` — a daemon thread
prints a line every ``interval`` seconds so only genuinely wedged
processes get killed. (The reference has no watchdog and no equivalent;
its closest mechanism is tqdm progress bars, SURVEY §5.)
"""
from __future__ import annotations

import threading
import time


class Heartbeat:
    """Print ``[hb] <label>... <t>s`` every ``interval`` seconds while a
    silent phase runs. Re-entrant use is fine (one thread per instance)."""

    def __init__(self, label: str, interval: float = 60.0, prefix: str = "hb"):
        self._stop = threading.Event()
        self._label = label
        self._interval = interval
        self._prefix = prefix
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        t0 = time.monotonic()
        while not self._stop.wait(self._interval):
            print(f"[{self._prefix}] {self._label}... "
                  f"{time.monotonic() - t0:.0f}s", flush=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()
