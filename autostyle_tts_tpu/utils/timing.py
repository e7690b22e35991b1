"""Per-stage wall-time logging + jax.profiler hooks.

The reference had only print/tqdm (SURVEY §5). Here: a Stopwatch that records
named spans, reports p50/p95, and can wrap spans in jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax


class Stopwatch:
    def __init__(self, profile: bool = False):
        self.spans: Dict[str, List[float]] = defaultdict(list)
        self.profile = profile

    def sync(self, *values) -> None:
        """Force device completion of `values` — ONLY when profiling.

        JAX dispatch is async, and through the axon tunnel even
        `block_until_ready` returns before the work lands; un-synced spans
        measure dispatch (~µs) and the real cost hides in the pipeline's
        final host fetch. Callers place `watch.sync(stage_outputs)` at the
        end of each span; in profile mode we materialize every array leaf
        on host (np.asarray forces a true transfer), so span times are wall
        truth. In normal serving mode this is a no-op and stages stay
        fully pipelined."""
        if not self.profile:
            return
        # Force COMPUTATION, not transfer: fetch a scalar reduction of each
        # leaf in ONE batched device_get. Fetching the arrays themselves
        # would bill the span for transfer payload (a 1 MB wav costs
        # ~10-20 ms through the tunnel) on top of the one unavoidable RTT;
        # the reductions dispatch asynchronously and the single scalar
        # fetch blocks until every producer has run.
        import jax.numpy as jnp

        # Only DEVICE arrays: jnp.sum on a host numpy leaf would upload it
        # (a transfer + compile the production path never pays), billing
        # the span for work the profiler itself created.
        sums = [
            jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(values)
            if isinstance(leaf, jax.Array)
        ]
        if sums:
            jax.device_get(sums)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        ctx = (
            jax.profiler.TraceAnnotation(name)
            if self.profile
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with ctx:
            yield
        self.spans[name].append(time.perf_counter() - t0)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.spans.items():
            xs_sorted = sorted(xs)
            out[name] = {
                "n": len(xs),
                "total_s": sum(xs),
                "mean_s": statistics.mean(xs),
                "p50_s": xs_sorted[len(xs) // 2],
                "p95_s": xs_sorted[min(len(xs) - 1, int(len(xs) * 0.95))],
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stats().items()):
            lines.append(
                f"{name:32s} n={s['n']:5d} total={s['total_s']:8.3f}s "
                f"mean={s['mean_s'] * 1e3:8.2f}ms p50={s['p50_s'] * 1e3:8.2f}ms "
                f"p95={s['p95_s'] * 1e3:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture an XLA device trace for offline inspection."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
