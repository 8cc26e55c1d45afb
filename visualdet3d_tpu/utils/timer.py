"""Timing / profiling helpers.

TPU-native analogue of the reference's CUDA-synchronised profiler
(reference: visualDet3D/utils/timer.py:4-80): instead of
``torch.cuda.synchronize`` we call ``jax.block_until_ready`` on function
outputs so wall-times include device execution, and ``jax.profiler`` traces
can be captured around hot sections.
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


def formatting_time(seconds: float) -> str:
    """Seconds -> 'Hh Mm Ss' human string (reference: utils/timer.py:71-80)."""
    seconds = max(0.0, float(seconds))
    hours = int(seconds // 3600)
    minutes = int((seconds % 3600) // 60)
    secs = seconds % 60
    if hours > 0:
        return f'{hours}h {minutes}m {secs:.0f}s'
    if minutes > 0:
        return f'{minutes}m {secs:.1f}s'
    return f'{secs:.2f}s'


class Timer:
    """Average-time / ETA estimation for long loops (reference: utils/timer.py:28-69)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.start_time = time.time()
        self.last_time = self.start_time
        self.count = 0
        self.total = 0.0

    def tick(self) -> float:
        now = time.time()
        dt = now - self.last_time
        self.last_time = now
        self.count += 1
        self.total += dt
        return dt

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)

    def compute_avg_time(self, steps_done: int) -> str:
        """Average wall time per step so far (reference timer.py API)."""
        return formatting_time(self.elapsed() / max(steps_done, 1))

    def compute_eta(self, current_step: int, total_steps: int) -> str:
        remaining = max(total_steps - current_step, 0)
        if self.count == 0:
            return formatting_time(remaining * self.elapsed() / max(current_step, 1))
        return formatting_time(remaining * self.avg)

    def elapsed(self) -> float:
        return time.time() - self.start_time


def profile(name: str = '', start_iter: int = 1, end_iter: int = 10):
    """Decorator printing device-inclusive wall time for calls in [start, end).

    Mirrors the reference's ``@profile`` semantics (utils/timer.py:4-25) with
    ``jax.block_until_ready`` standing in for ``torch.cuda.synchronize``.
    """
    def decorator(fn):
        call_count = [0]

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            call_count[0] += 1
            i = call_count[0]
            if start_iter <= i < end_iter:
                t0 = time.time()
                out = fn(*args, **kwargs)
                out = jax.block_until_ready(out)
                dt = time.time() - t0
                print(f'[profile] {name or fn.__name__} call {i}: {dt*1000:.2f} ms')
                return out
            return fn(*args, **kwargs)
        return wrapper
    return decorator


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a ``jax.profiler`` trace around a code block (TensorBoard-viewable)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
