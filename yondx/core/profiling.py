"""Tracing / profiling utilities (aux subsystem, SURVEY.md §5).

The reference has wall-clock accumulation only (`fn_timer`,
utils/utils.py:62-83, plus per-stage %time on the tqdm bar). Here:
- `fn_timer`: same accumulating decorator (global table + report());
- `stage_timer`: context manager feeding a dict (the %-breakdown UX);
- `trace`: jax.profiler wrapper producing TensorBoard-loadable traces —
  the TPU-native upgrade the reference lacks.
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict

fn_time: Dict[str, float] = defaultdict(float)
fn_calls: Dict[str, int] = defaultdict(int)


def fn_timer(fn):
    """Accumulating wall-clock decorator (reference fn_timer,
    utils/utils.py:62-83)."""
    @functools.wraps(fn)
    def wrapper(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            fn_time[fn.__qualname__] += time.perf_counter() - t0
            fn_calls[fn.__qualname__] += 1
    return wrapper


def report() -> str:
    lines = [f"{name}: {fn_time[name]:.3f}s / {fn_calls[name]} calls"
             for name in sorted(fn_time, key=fn_time.get, reverse=True)]
    return "\n".join(lines)


def reset() -> None:
    fn_time.clear()
    fn_calls.clear()


@contextlib.contextmanager
def stage_timer(runtime: dict, stage: str):
    """with stage_timer(rt, 'net'): ... — accumulates seconds per stage."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        runtime[stage] = runtime.get(stage, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str = "/tmp/yondx_trace"):
    """jax.profiler trace context; open the result with TensorBoard or
    xprof. Device ops inside the context are captured."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
