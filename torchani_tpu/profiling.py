"""Tracing and timing utilities.

TPU counterpart of the reference's observability hooks (SURVEY SS5): where
the reference emits NVTX ranges inside hot paths and wraps module forwards
with a cuda-sync-aware Timer (``tools/tool_utils.py:27-40``), here we provide
`scope` (a `jax.named_scope`/`jax.profiler.TraceAnnotation` wrapper whose
labels show up in XLA/profiler traces), a `Timer` harness with correct
device synchronization, and `trace` to capture a profiler trace viewable in
TensorBoard/Perfetto.

Env var ``TORCHANI_TPU_PRINT_AEV_BRANCH=1`` makes the AEV computer print
which strategy executed (reference ``TORCHANI_PRINT_AEV_BRANCH`` analog).
"""

import contextlib
import os
import time
import typing as tp

import jax

__all__ = ["scope", "Timer", "trace", "sync", "PRINT_AEV_BRANCH"]

PRINT_AEV_BRANCH = os.getenv("TORCHANI_TPU_PRINT_AEV_BRANCH") == "1"


def scope(name: str):
    """Named scope visible in jax profiler traces (NVTX-range analog)."""
    return jax.named_scope(name)


def sync(tree: tp.Any) -> tp.Any:
    """Block until every array in a pytree is computed."""
    return jax.block_until_ready(tree)


class Timer:
    """Wall-clock section timer with device synchronization.

    .. code-block:: python

        timer = Timer()
        with timer.section("aev"):
            out = sync(aev_fn(x))
        print(timer.report())
    """

    def __init__(self) -> None:
        self.totals: tp.Dict[str, float] = {}
        self.counts: tp.Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def time_fn(self, name: str, fn, *args, iters: int = 10, **kwargs):
        """Time a jitted callable: warmup once, then ``iters`` synced calls."""
        out = sync(fn(*args, **kwargs))
        with self.section(name):
            for _ in range(iters):
                out = fn(*args, **kwargs)
            sync(out)
        self.counts[name] = iters
        return out

    def report(self) -> str:
        lines = []
        width = max((len(k) for k in self.totals), default=10)
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts.get(name, 1)
            lines.append(
                f"{name:<{width}}  total {total * 1e3:10.2f} ms  "
                f"x{n}  avg {total / max(n, 1) * 1e3:10.3f} ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax profiler trace (open with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
