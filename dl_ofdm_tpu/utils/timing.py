"""Honest device timing under backends whose block_until_ready is advisory.

On the experimental 'axon' (tunneled TPU) backend, `jax.block_until_ready`
returns once the dispatch is acknowledged, NOT when device execution
finishes — a chained 8192^2 bf16 matmul "measures" 55 PFLOP/s under
block_until_ready vs 92 TFLOP/s under a real fence (v5e bf16 peak ~197).
Every timing in this repo therefore fences through a device->host fetch of a
value that is data-dependent on the timed computation: the transfer cannot
complete before the compute does.

The d2h fetch itself has a large fixed latency over the tunnel (~24 ms), so
`bench_steps` times ITERS chained dispatches with ONE final fence and
subtracts the separately measured fence cost.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def d2h_fence(out) -> None:
    """Block until `out` is actually computed: fetch one element to host."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def measure_fence_cost(repeats: int = 5) -> float:
    """Fixed d2h round-trip latency (seconds) for a trivial dispatch+fetch."""
    tiny = jnp.zeros((1,), jnp.float32)

    @jax.jit
    def bump(t):
        return t + 1.0

    tiny = bump(tiny)
    d2h_fence(tiny)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        d2h_fence(bump(tiny))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_steps(fn: Callable[[int], object], iters: int = 30,
                repeats: int = 3, fence_cost: float | None = None) -> float:
    """Steady-state seconds per call of `fn(i)` (fn must dispatch device work
    whose output it returns; calls may chain state internally).

    Times `iters` back-to-back dispatches, fences once on the LAST output,
    and subtracts the fence cost, so async dispatch overlaps device execution
    exactly as in a real training loop."""
    if fence_cost is None:
        fence_cost = measure_fence_cost()
    d2h_fence(fn(0))  # warmup / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = fn(i)
        d2h_fence(out)
        best = min(best, (time.perf_counter() - t0 - fence_cost) / iters)
    return best
