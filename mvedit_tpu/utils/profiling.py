"""Profiling hooks (SURVEY §5: the reference has none; the TPU build adds
jax profiler integration).

    from mvedit_tpu.utils.profiling import trace, annotate

    with trace("/tmp/jax_trace"):        # xplane proto -> tensorboard /
        pipe(targets, key, pos, neg)     # xprof

    with annotate("mesh_fit"):           # named region in the trace
        fit(...)

`bench.py --profile DIR` wraps the headline step in a trace.
"""
from contextlib import contextmanager

__all__ = ["trace", "annotate"]


@contextmanager
def trace(log_dir="/tmp/jax_trace", host_tracer_level=2):
    """Capture a device+host profile viewable in TensorBoard/xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name):
    """Named region (TraceAnnotation) inside an active trace."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Wall-clock phase accounting for the MVEdit loop (bench.py --e2e).

    Tick-based: `tick(name, *arrays)` SYNCs the given arrays via scalar
    readback (block_until_ready does not synchronize through the axon
    tunnel) and charges the elapsed time since the previous tick to
    `name`. Installing a timer adds one ~27 ms tunnel roundtrip per tick —
    negligible against the multi-second phases it measures.
    """

    def __init__(self):
        from collections import defaultdict
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.durations = defaultdict(list)  # per-tick wall times
        self._last = None

    def mark(self):
        import time
        self._last = time.perf_counter()

    def tick(self, name, *arrays):
        import time
        import jax
        import jax.numpy as jnp
        for a in arrays:
            if a is None:
                continue
            leaves = jax.tree_util.tree_leaves(a)
            for x in leaves:
                if hasattr(x, "dtype") and jnp.issubdtype(
                        x.dtype, jnp.floating):
                    float(jnp.sum(x))
                    break
        now = time.perf_counter()
        if self._last is not None:
            self.totals[name] += now - self._last
            self.counts[name] += 1
            self.durations[name].append(now - self._last)
        self._last = now

    def steady(self, name, skip=1):
        """Median per-tick wall time after dropping the first `skip`
        ticks (which carry XLA compiles); None if too few ticks.
        Later recompiles (view-bucket changes) are outliers the median
        rejects."""
        import statistics
        d = self.durations.get(name, [])[skip:]
        return statistics.median(d) if d else None

    def report(self):
        return {k: round(v, 3) for k, v in
                sorted(self.totals.items(), key=lambda kv: -kv[1])}


_PHASE_TIMER = None


def set_phase_timer(t):
    """Install (or clear, with None) the global pipeline phase timer."""
    global _PHASE_TIMER
    _PHASE_TIMER = t


def phase_timer():
    return _PHASE_TIMER
