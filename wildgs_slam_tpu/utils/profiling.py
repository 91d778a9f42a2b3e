"""First-class per-phase timing + jax.profiler tracing.

The reference has no tracing/profiling at all (SURVEY §5: only wall-time
stamps in run.py:36-55); this subsystem is the TPU build's replacement for
"guess where the time goes". Two layers:

  - `PhaseTimer`: a process-global registry of named phases. Wrap any host
    call in `with timer.phase("frontend.update"): ...` — it records wall
    time, separating the FIRST call (which on TPU includes XLA compilation,
    15s..8min through the remote-compile queue) from warm steady-state
    calls. `timer.report()` renders the table that goes into PERF.md;
    `timer.write(path)` is called from SLAM.terminate so every run leaves a
    `profile.txt` artifact next to its trajectory metrics.

  - `trace(logdir)`: context manager around `jax.profiler.trace` for
    capturing an xplane trace viewable in TensorBoard/XProf (used by
    scripts/profile_rasterizer.py to find real hotspots).

Timing is host wall-clock. The SLAM loop synchronizes with the device at
every phase boundary anyway (np.asarray / float() pulls), so phase times are
honest device+dispatch costs; for microbenchmarks that need explicit
synchronization pass `sync=...` a pytree to block on.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class PhaseStat:
    count: int = 0
    total: float = 0.0
    first: float = 0.0       # first call (incl. jit compile on TPU)
    warm_total: float = 0.0  # all calls after the first
    min: float = float("inf")
    max: float = 0.0
    recent: List[float] = field(default_factory=list)  # last <=64 warm calls

    @property
    def warm_count(self) -> int:
        return max(self.count - 1, 0)

    @property
    def warm_mean(self) -> float:
        return self.warm_total / self.warm_count if self.warm_count else 0.0

    def add(self, dt: float):
        self.count += 1
        self.total += dt
        if self.count == 1:
            self.first = dt
        else:
            self.warm_total += dt
            self.recent.append(dt)
            if len(self.recent) > 64:
                self.recent.pop(0)
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)


class PhaseTimer:
    def __init__(self):
        self.stats: Dict[str, PhaseStat] = {}
        self.enabled = True

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.stats.setdefault(name, PhaseStat()).add(
                time.perf_counter() - t0)

    def add(self, name: str, dt: float):
        self.stats.setdefault(name, PhaseStat()).add(dt)

    def reset(self):
        self.stats.clear()

    def report(self) -> str:
        if not self.stats:
            return "(no phases recorded)"
        rows = [("phase", "calls", "first[s]", "warm mean[ms]",
                 "warm last10[ms]", "total[s]")]
        for name in sorted(self.stats,
                           key=lambda n: -self.stats[n].total):
            s = self.stats[name]
            last10 = (sum(s.recent[-10:]) / len(s.recent[-10:]) * 1e3
                      if s.recent else 0.0)
            rows.append((name, str(s.count), f"{s.first:.3f}",
                         f"{s.warm_mean * 1e3:.2f}", f"{last10:.2f}",
                         f"{s.total:.2f}"))
        widths = [max(len(r[i]) for r in rows) for i in range(len(rows[0]))]
        lines = []
        for i, r in enumerate(rows):
            lines.append("  ".join(c.ljust(w) for c, w in zip(r, widths)))
            if i == 0:
                lines.append("-" * (sum(widths) + 2 * (len(widths) - 1)))
        return "\n".join(lines)

    def write(self, path: str):
        with open(path, "w") as f:
            f.write(self.report() + "\n")

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "count": s.count,
                "first_s": s.first,
                "warm_mean_ms": s.warm_mean * 1e3,
                "total_s": s.total,
            }
            for name, s in self.stats.items()
        }


# Process-global timer used by the SLAM system; tests/scripts may reset it.
TIMER = PhaseTimer()


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler (xplane) trace into logdir if set, else no-op."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
