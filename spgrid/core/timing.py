"""Timing harness: warm-up + timed loop protocol on device.

Reimplements the reference measurement protocol
(``spmv_code_bench/spmv_bench.cpp:316-380``): warm-up iterations, then a
timed loop repeated until a minimum wall time is reached; throughput is
``flops / time``.  On TPU the analogue of ``clock_gettime`` around an OpenMP
region is a host monotonic clock around ``jax.block_until_ready`` on a jitted
callable; the warm-up also absorbs XLA compilation.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax


@dataclasses.dataclass
class TimedResult:
    time_per_iter_s: float
    iters: int
    total_time_s: float
    flops: Optional[float] = None       # per-iteration flop count, if known
    bytes_accessed: Optional[float] = None

    @property
    def gflops(self) -> Optional[float]:
        if self.flops is None:
            return None
        return self.flops / self.time_per_iter_s / 1e9

    @property
    def gbytes_per_s(self) -> Optional[float]:
        if self.bytes_accessed is None:
            return None
        return self.bytes_accessed / self.time_per_iter_s / 1e9


def time_kernel(
    fn: Callable[[], jax.Array],
    *,
    warmup_iters: int = 10,
    min_time_s: float = 0.5,
    min_iters: int = 32,
    flops: Optional[float] = None,
    bytes_accessed: Optional[float] = None,
) -> TimedResult:
    """Time ``fn`` (a zero-arg closure returning device array(s)).

    Protocol (spmv_bench.cpp:316-380): warm-up ``warmup_iters`` times, then
    run batches of the kernel, blocking on the last result only, until both
    ``min_time_s`` and ``min_iters`` are satisfied.  Dispatch overhead is
    amortized by growing the batch geometrically.
    """
    # Warm-up (absorbs compilation; reference uses 100 plain iterations).
    out = None
    for _ in range(max(warmup_iters, 1)):
        out = fn()
    jax.block_until_ready(out)

    total_iters = 0
    total_time = 0.0
    batch = max(1, min_iters // 4)
    while total_time < min_time_s or total_iters < min_iters:
        t0 = time.perf_counter()
        out = None
        for _ in range(batch):
            out = fn()
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        total_time += t1 - t0
        total_iters += batch
        batch = min(batch * 2, 4096)

    return TimedResult(
        time_per_iter_s=total_time / total_iters,
        iters=total_iters,
        total_time_s=total_time,
        flops=flops,
        bytes_accessed=bytes_accessed,
    )


@dataclasses.dataclass
class PhaseTimer:
    """Per-phase wall timers (read / convert / balance / compute).

    Mirrors the reference's phase prints (spmv_bench.cpp:666-768,989-999).
    """

    phases: dict = dataclasses.field(default_factory=dict)

    def __call__(self, name: str):
        return _Phase(self, name)

    def report(self) -> str:
        return ", ".join(f"{k}: {v:.4f}s" for k, v in self.phases.items())


class _Phase:
    def __init__(self, timer: PhaseTimer, name: str):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.timer.phases[self.name] = (
            self.timer.phases.get(self.name, 0.0) + time.perf_counter() - self.t0
        )
        return False
