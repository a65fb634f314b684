"""Wall-clock stage profiler (actually wired in, unlike the reference's).

The reference ships a TimeProfiler (utilities/time_profiler.{h,cc}) that is
constructed and threaded through Tracking/Mapping but never invoked
(SURVEY.md §5). This one is used by the apps and bench: named tic/toc with
mean/sigma statistics and a file dump, plus a helper to trace a block with
the JAX profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class TimeProfiler:
    def __init__(self):
        self._open = {}
        self._samples = defaultdict(list)

    def tic(self, name: str):
        self._open[name] = time.perf_counter()

    def toc(self, name: str) -> float:
        dt = time.perf_counter() - self._open.pop(name)
        self._samples[name].append(dt)
        return dt

    @contextlib.contextmanager
    def section(self, name: str):
        self.tic(name)
        try:
            yield
        finally:
            self.toc(name)

    def statistics(self):
        # median_ms is the steady-state measure: on the remote-relay TPU
        # backend each process pays large one-off compile/executable-load
        # costs on the first few samples, which dominate the mean.
        return {name: dict(mean_ms=float(np.mean(s) * 1e3),
                           median_ms=float(np.median(s) * 1e3),
                           sigma_ms=float(np.std(s) * 1e3),
                           count=len(s))
                for name, s in self._samples.items()}

    def save_statistics_to_file(self, path: str):
        with open(path, "w") as f:
            for name, st in sorted(self.statistics().items()):
                f.write(f"{name}: mean {st['mean_ms']:.3f} ms "
                        f"sigma {st['sigma_ms']:.3f} ms n={st['count']}\n")


def chained_timeit(fn, perturb, n: int = 20, warmup: int = 2) -> float:
    """Time ``fn`` with a data-dependency chain and a final host fetch.

    On the remote-relay TPU backend, repeated dispatch of the SAME pure
    computation with unchanged device buffers can be elided (and
    ``block_until_ready`` returns without the work having run), which makes
    the classic enqueue-N-then-block timing report dispatch overhead
    (~0.1 ms) instead of device time. Chaining defeats both effects: each
    call's input is perturbed by a scalar derived from the previous call's
    output, so no execution can be skipped or overlapped unfairly, and the
    final ``np.asarray`` forces real completion.

    Args:
      fn: callable taking the perturbed input, returning an array/pytree.
      perturb: callable mapping a scalar eps -> fn's input.
    Returns mean milliseconds per call.
    """
    import jax
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(perturb(jnp.float32(0.0)))
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(n):
        out = fn(perturb(carry * 1e-12))
        leaf = jax.tree.leaves(out)[0]
        carry = jnp.sum(leaf).astype(jnp.float32)
    np.asarray(carry)
    return (time.perf_counter() - t0) / n * 1e3


def device_timeit(step, carry0, k: int = 8, reps: int = 3) -> float:
    """Pure device-time per call: K chained repetitions inside ONE jit.

    ``chained_timeit`` pays the full host->relay->device dispatch round trip
    per call, which on a remote-relay backend can be tens of ms and swamps
    small stages. Running ``step`` K times inside a single ``fori_loop``
    amortizes that to one dispatch per K calls, so the returned figure is the
    device execution time of the stage (plus 1/K of the round trip).

    ``step`` must map a carry pytree to a same-structured carry whose leaves
    depend on the previous output (so XLA cannot hoist the body out of the
    loop). Returns best-of-``reps`` mean milliseconds per call.
    """
    import jax

    f = jax.jit(lambda c: jax.lax.fori_loop(0, k, lambda i, cc: step(cc), c))
    c = f(carry0)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = f(c)
        jax.block_until_ready(jax.tree.leaves(c)[0])
        best = min(best, time.perf_counter() - t0)
    return best / k * 1e3


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace for TPU timeline inspection."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
