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
        self.sigs = defaultdict(list)       # per-tick program signatures
        self._last = None

    def mark(self):
        import time
        self._last = time.perf_counter()

    def tick(self, name, *arrays, sig=None):
        """Charge elapsed time to `name`. `sig` (hashable) identifies the
        COMPILED-PROGRAM SIGNATURE this tick ran under — e.g. (rs, N,
        phase) — so `steady` can drop each signature's first occurrence
        (the XLA compile) instead of hoping the median rejects it."""
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
            self.sigs[name].append(sig)
        self._last = now

    def steady(self, name, skip=1):
        """Median warm per-tick wall time.

        Every tick carries a program signature (tick(..., sig=...)); a
        signature's FIRST tick includes its XLA compile, so it is dropped
        and the median is taken over the rest. In a reduced-step record
        run a phase may see 5-7 signatures across 6 calls (view-bucket /
        render-size changes), so a plain median is mostly compile time —
        e.g. the r5 e2e recorded denoise steady 4.4 s while the warm
        repeated-signature calls measured 1.1-1.3 s. Falls back to
        dropping the first `skip` ticks when no sigs were provided.
        Returns None if nothing warm remains (the caller then uses the
        conservative wall-amortized unit)."""
        import statistics
        d = self.durations.get(name, [])
        s = self.sigs.get(name, [None] * len(d))
        if any(x is not None for x in s):
            seen = set()
            warm = []
            for dur, sg in zip(d, s):
                if sg in seen:
                    warm.append(dur)
                else:
                    seen.add(sg)
            return statistics.median(warm) if warm else None
        d = d[skip:]
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
