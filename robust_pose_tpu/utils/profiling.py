"""Profiling hooks: jax.profiler traces + per-stage wall timing.

The reference has no tracing/profiling beyond tqdm progress bars
(SURVEY.md §5); the TPU rebuild needs them for the >30 FPS target. Use
``trace(logdir)`` around a region to capture an XLA op trace viewable in
TensorBoard or parseable via tensorflow's xplane protobuf, and ``StageTimer``
for lightweight host-side stage accounting in the inference loop.

NOTE (axon runtime): ``jax.block_until_ready`` can return before remote
execution completes on the first call after compilation, and byte-identical
executions may be served from a result cache — always time with distinct
inputs and chained dependencies (see bench.py).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


def enable_compile_cache(default_dir: Optional[str] = None) -> None:
    """Point JAX's persistent compilation cache at the repo-local store.

    The big tracking/training programs take minutes to compile cold over
    the axon tunnel; cached executables (keyed by JAX/XLA version + HLO)
    make repeat profiler/bench runs start in seconds. Honors
    ``JAX_COMPILATION_CACHE_DIR`` when set.
    """
    import os

    if default_dir is None:
        default_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region."""
    with jax.profiler.trace(logdir):
        yield


class StageTimer:
    """Accumulates per-stage wall time; ``summary()`` returns mean ms."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None) -> Iterator[None]:
        """Time a stage; pass ``sync=arrays`` to block on device results."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: 1000.0 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        return "  ".join(f"{k}: {v:.1f}ms" for k, v in self.summary().items())
