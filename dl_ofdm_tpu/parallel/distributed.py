"""Multi-host initialization + scaling-efficiency harness.

The reference has no distributed backend (SURVEY.md section 5.8); the
TPU-native equivalent: `jax.distributed.initialize` for multi-host pods, a
global ('dp','tp') mesh spanning hosts (dp over DCN+ICI, tp within a slice),
and a scaling benchmark that measures samples/s at 1..N devices to report
scaling efficiency (BASELINE.md target: >= 85%).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on a single process).

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU fleets pass coordinator='host:port', num_processes, process_id.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process


def weak_scaling_efficiency(steps_per_sec: dict[int, float]) -> dict[int, float]:
    """Weak-scaling efficiency from a {n_devices: steps/s} rate profile.

    Under weak scaling the GLOBAL batch grows with n (per-device work is
    constant), so the ideal step rate is flat across widths: efficiency at
    width n is rate(n) / rate(smallest measured width).  (Per-device
    throughput in samples/s/device is then eff * base_rate * samples/device.)
    """
    if not steps_per_sec:
        return {}
    base = steps_per_sec[min(steps_per_sec)]
    return {n: r / base for n, r in steps_per_sec.items()}


def scaling_efficiency(make_step, make_args, device_counts=(1, 2, 4, 8),
                       iters: int = 10, log_fn=print
                       ) -> tuple[dict[int, float], dict[int, float]]:
    """Measure step rate at several mesh widths.

    `make_step(n_devices)` returns a jitted step closure; `make_args(n)`
    its (sharded) inputs, with the GLOBAL batch scaled by n (weak scaling).
    Returns ({n: steps_per_sec}, {n: weak_scaling_efficiency}).
    """
    from dl_ofdm_tpu.utils.timing import bench_steps, measure_fence_cost

    # d2h-fenced timing: on the tunneled axon backend block_until_ready does
    # not fence device execution (utils/timing.py); the fence estimator is
    # also correct on CPU/GPU meshes.
    fence_cost = measure_fence_cost()
    results = {}
    for n in device_counts:
        if n > len(jax.devices()):
            break
        step, args = make_step(n), make_args(n)
        dt = bench_steps(lambda i: step(*args), iters=iters,
                         fence_cost=fence_cost)
        # the fence-cost subtraction can push a near-zero step negative
        # under host load (a 1-2 ms CPU step vs a ~25 ms tunnel fence);
        # clamp so the returned rate stays physical
        dt = max(dt, 1e-9)
        results[n] = 1.0 / dt
        eff = weak_scaling_efficiency(results)[n]
        log_fn(f"{n} devices: {dt*1e3:.2f} ms/step, "
               f"scaling efficiency {eff*100:.1f}%")
    return results, weak_scaling_efficiency(results)
