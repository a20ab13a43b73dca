"""Profiling hooks (SURVEY.md §5.1: the reference only has tqdm CUDA-memory
lines; here tracing and throughput counters are first-class):

- `profile_trace(log_dir)`: context manager around `jax.profiler` traces
  (view in TensorBoard / xprof).
- `StepTimer`: steady-state step-time and samples/sec/chip counters with
  warmup exclusion.
- `device_memory_stats()`: per-device HBM usage when the backend exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.times: List[float] = []
        self._last: Optional[float] = None
        self._step = 0

    def tick(self) -> None:
        now = time.perf_counter()
        self._step += 1
        if self._last is not None and self._step > self.warmup_steps:
            self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def samples_per_sec(self, batch_size: int, n_chips: int = 1) -> float:
        st = self.mean_step_time
        return batch_size / st / n_chips if st > 0 else 0.0

    def summary(self, batch_size: int, n_chips: int = 1) -> Dict[str, float]:
        return {
            "mean_step_time_s": self.mean_step_time,
            "samples_per_sec_per_chip": self.samples_per_sec(batch_size, n_chips),
            "steps_timed": len(self.times),
        }


def device_memory_stats() -> List[dict]:
    import jax

    out = []
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                }
            )
    return out


class PhaseTimer:
    """Named wall-time phases for multi-stage pipelines (e.g. `clibd eval`:
    extract/load → kNN grid → plots → report).  Collects always (cheap);
    `report()` prints one line per phase plus the total."""

    def __init__(self):
        import time

        self._time = time.perf_counter
        self.phases: List[tuple] = []

    def phase(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = timer._time()
                return self

            def __exit__(self, *exc):
                timer.phases.append((name, timer._time() - self.t0))
                return False

        return _Ctx()

    def report(self, prefix: str = "eval timing") -> str:
        total = sum(dt for _, dt in self.phases)
        lines = [f"{prefix}: total {total:.2f}s"]
        for name, dt in self.phases:
            pct = 100.0 * dt / total if total else 0.0
            lines.append(f"  {name:28s} {dt:8.2f}s  {pct:5.1f}%")
        return "\n".join(lines)
