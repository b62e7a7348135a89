"""Profiling / tracing utilities (SURVEY §5 row 'tracing': the reference
has only tqdm postfixes and print breadcrumbs; this is the first-class
replacement).

- ``trace(dir)``: context manager around jax.profiler (TensorBoard-viewable
  XPlane dumps) — degrades to a no-op wall-timer when the backend doesn't
  support device tracing (e.g. the axon tunnel).
- ``StepTimer``: rolling step-rate tracker used by the trainers.
- ``device_memory_stats``: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tvi_trace"):
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"[profiling] device trace unavailable ({e}); wall-clock only")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"[profiling] trace written to {log_dir} ({dt:.3f}s)")
            except Exception:
                pass
        else:
            print(f"[profiling] section took {dt:.3f}s")


class StepTimer:
    def __init__(self, window: int = 20):
        self.window = window
        self._times = []

    def tick(self) -> Optional[float]:
        """Returns rolling steps/sec (None until 2 ticks)."""
        now = time.perf_counter()
        self._times.append(now)
        self._times = self._times[-self.window:]
        if len(self._times) < 2:
            return None
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else None


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                out[str(d)] = {k: stats[k] for k in
                               ("bytes_in_use", "peak_bytes_in_use",
                                "bytes_limit") if k in stats}
        except Exception:
            pass
    return out
