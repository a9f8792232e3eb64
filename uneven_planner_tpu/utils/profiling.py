"""Tracing and throughput instrumentation.

The reference's observability is ad-hoc wall-clock prints (SURVEY.md §5:
front-end ms, ALM ms, map progress).  Here the equivalents are structured:

- `trace(dir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace.
- `Stage`: named wall-clock stages with device synchronization, collected
  into a report (the analog of the reference's per-stage ms prints).
- `solver_stats`: summarize an ALMResult batch (convergence rate, iteration
  percentiles) — the counters behind the solves/s headline metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    with jax.profiler.trace(log_dir):
        yield


class Stage:
    """Wall-clock stage timer with device sync; accumulates per-name."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        import jax
        t0 = time.time()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.times.setdefault(name, []).append(time.time() - t0)

    def report(self) -> str:
        lines = []
        for name, ts in self.times.items():
            arr = np.asarray(ts) * 1e3
            lines.append(f"{name}: n={len(arr)} mean={arr.mean():.1f}ms "
                         f"p50={np.percentile(arr, 50):.1f}ms "
                         f"max={arr.max():.1f}ms")
        return "\n".join(lines)


def solver_stats(result) -> Dict[str, float]:
    """Convergence/iteration summary of a batched ALMResult."""
    conv = np.asarray(result.converged)
    inner = np.asarray(result.inner_iters)
    outer = np.asarray(result.outer_iters)
    return {
        "batch": int(conv.size),
        "converged_frac": float(conv.mean()),
        "inner_p50": float(np.percentile(inner, 50)),
        "inner_p95": float(np.percentile(inner, 95)),
        "inner_max": int(inner.max()),
        "outer_p50": float(np.percentile(outer, 50)),
        "outer_max": int(outer.max()),
        "res_h_max": float(np.asarray(result.res_h).max()),
        "res_g_max": float(np.asarray(result.res_g).max()),
    }
