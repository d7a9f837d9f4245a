"""Counters, timers, and profiling hooks.

Reference: src/core/probes.{h,cpp} + dtrace scripts — ~90 probe points
compiled to either DTrace USDT probes or shared counters printed at exit by
ProbesPrint (probes.cpp:28-226, invoked api.cpp:1298), plus
ProgressReporter/Timer (progressreporter.{h,cpp}, timer.{h,cpp}).

TPU-native design: host-side counters/timers for the orchestration loop
(scene build, BVH, upload, per-wave wall time) and a thin wrapper over
``jax.profiler`` for device traces — the XLA profile IS the per-kernel
counter story on TPU (the BASELINE's roofline audits read from it).
"""

from __future__ import annotations

import atexit
import contextlib
import time
from collections import defaultdict

_counters: dict = defaultdict(int)
_timers: dict = defaultdict(float)
_timer_counts: dict = defaultdict(int)
_enabled = True


def incr(name: str, n: int = 1):
    """PBRT_*_COUNTER equivalent."""
    if _enabled:
        _counters[name] += n


@contextlib.contextmanager
def timed(name: str):
    """Scoped wall timer (Timer + per-phase probes equivalent)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _timers[name] += dt
        _timer_counts[name] += 1


def set_enabled(v: bool):
    global _enabled
    _enabled = v


def report() -> str:
    """ProbesPrint equivalent — formatted counters + timers."""
    lines = ["pbrt_tpu statistics:"]
    for k in sorted(_counters):
        lines.append(f"  {k:<44s} {_counters[k]:>14,d}")
    for k in sorted(_timers):
        lines.append(
            f"  {k:<44s} {_timers[k]:>12.3f}s ({_timer_counts[k]} calls)"
        )
    return "\n".join(lines)


def print_report_at_exit():
    atexit.register(lambda: print(report()))


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/pbrt_tpu_trace"):
    """jax.profiler trace scope — per-kernel timing/roofline data for
    TensorBoard (the dtrace-mode analogue)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class ProgressReporter:
    """Terminal progress bar (reference: progressreporter.{h,cpp})."""

    def __init__(self, total: int, title: str = "Rendering", quiet=False):
        self.total = max(total, 1)
        self.title = title
        self.done = 0
        self.quiet = quiet
        self.t0 = time.time()

    def update(self, n: int = 1):
        self.done += n
        if self.quiet:
            return
        frac = self.done / self.total
        width = 40
        fill = int(frac * width)
        el = time.time() - self.t0
        eta = el / max(frac, 1e-9) * (1 - frac)
        print(
            f"\r{self.title}: [{'+' * fill}{' ' * (width - fill)}] "
            f"({el:.1f}s|{eta:.1f}s)",
            end="",
            flush=True,
        )

    def finish(self):
        if not self.quiet:
            self.update(0)
            print()
