"""Tracing/profiling subsystem.

The reference has none (SURVEY.md §5.1: only `verbose` stderr prints,
mrcal.c:4714, 6291); on TPU, where a solve is a handful of giant XLA
dispatches, phase-level wall timing plus the JAX/XLA device profiler is
the observability layer that replaces per-measurement debug prints.

Two mechanisms:

1. `phase(name)` — a nestable wall-clock timer.  The solver wraps its
   stages in these; `optimize(**oi)` returns the per-phase breakdown in
   `stats["time_s"]`, and `timings()` exposes the accumulated tree
   programmatically.  Overhead is one perf_counter pair per phase, so it
   is always on.

2. `trace(logdir)` — context manager around `jax.profiler.trace`, dumping
   an XLA device trace (tensorboard/xprof format) of everything inside.
   Also arms automatically for the duration of a solve when
   MRCAL_TPU_PROFILE=<logdir> is set in the environment.
"""

import contextlib
import os
import threading
import time

# accumulated {qualified phase name: seconds}; qualified = "/".join(stack).
# The accumulators are process-global (guarded by _lock); the phase STACK is
# thread-local so concurrent optimize() calls (or user phase() blocks on
# other threads) can't interleave each other's "outer/inner" names.
_acc = {}
_counts = {}
_lock = threading.Lock()
_tls = threading.local()


def _stack():
    s = getattr(_tls, "stack", None)
    if s is None:
        s = _tls.stack = []
    return s


def reset():
    """Clear accumulated phase timings."""
    with _lock:
        _acc.clear()
        _counts.clear()


def timings():
    """Accumulated phase wall-times since the last reset().

    Returns {name: seconds} where nested phases are "outer/inner"."""
    return dict(_acc)


def counts():
    """Number of times each phase ran since the last reset()."""
    return dict(_counts)


@contextlib.contextmanager
def phase(name):
    """Time a named phase (nestable; nested names join with '/')."""
    stack = _stack()
    stack.append(name)
    key = "/".join(stack)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        stack.pop()
        with _lock:
            _acc[key] = _acc.get(key, 0.0) + dt
            _counts[key] = _counts.get(key, 0) + 1


@contextlib.contextmanager
def trace(logdir=None):
    """Dump an XLA device trace of the enclosed block.

    View with tensorboard/xprof.  logdir=None reads MRCAL_TPU_PROFILE
    from the environment; when that is unset too, this is a no-op."""
    logdir = logdir or os.environ.get("MRCAL_TPU_PROFILE")
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(str(logdir)):
        yield


class _SolveTimer:
    """Collects one solve's phase breakdown for the stats dict, on top of
    the global accumulators."""

    def __init__(self):
        self.t = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        with phase(name):
            try:
                yield
            finally:
                self.t[name] = self.t.get(name, 0.0) + \
                    time.perf_counter() - t0
