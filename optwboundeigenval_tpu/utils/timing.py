"""Wall-clock stage timers + profiler hooks.

The reference instruments everything with manual timers printed as
"Time elapsed: Hh Mm Ss" lines (``timeHMS``, opt.py:230-235; autograd
stage timers aTime0/1/2 opt.py:70; power-iteration timers opt.py:446;
per-epoch gTime/ggTime/tTime/iTime opt.py:745-757).  Here a small
Timers registry reproduces those readouts, and ``trace`` wraps
``jax.profiler`` for real TPU traces.

Note: on an asynchronously-dispatching backend, timing a stage
requires materializing its outputs; the trainer timers measure
host-observed time per stage (dispatch + any blocking), the same
quantity the reference's CUDA-synchronous timers measured.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


def time_hms(t: float, head: str = "") -> str:
    """timeHMS format parity (opt.py:230-235)."""
    hrs = int(t // 3600)
    t -= hrs * 3600
    mins = int(t // 60)
    secs = t - mins * 60
    return f"{head}Time elapsed: {hrs:2d} hrs, {mins:2d} min, {secs:4.2f} sec"


class Timers:
    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - start
            )

    def report(self, names=None) -> str:
        names = names or sorted(self.totals)
        return "\n".join(
            time_hms(self.totals.get(n, 0.0), f"{n} ") for n in names
        )

    def reset(self):
        self.totals.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context — the TPU-native replacement for the
    reference's manual GPU timing (SURVEY.md §5)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
