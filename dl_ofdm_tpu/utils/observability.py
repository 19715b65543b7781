"""Observability: constellation dumps, throughput counters, profiler traces.

The reference's observability surface (SURVEY.md section 5.5): stdout prints
to per-job .out files, fp16 constellation CSV dumps (`<token>_txiq.csv` /
`<token>_rxiq.csv`, `dev/py/ofdmreceiver_np.py:151-152,264-265`), pandas
result CSVs.  The reference has NO tracing/profiling (section 5.1); here
`profile_trace` wraps `jax.profiler` and `Throughput` provides per-stage
samples/s counters.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


def dump_constellation(token: str, tx_iq, rx_iq, limit: int = 2048,
                       out_dir: str = ".", suffix: str = ""):
    """fp16 IQ sample dumps, reference naming `<token>[_mp]_txiq.csv`."""
    import os
    tx = np.asarray(tx_iq, dtype=np.float16).reshape(-1, 2)[:limit]
    rx = np.asarray(rx_iq, dtype=np.float16).reshape(-1, 2)[:limit]
    paths = []
    for name, arr in (("txiq", tx), ("rxiq", rx)):
        p = os.path.join(out_dir, f"{token}{suffix}_{name}.csv")
        np.savetxt(p, arr, delimiter=",")
        paths.append(p)
    return paths


class Throughput:
    """Per-stage samples/s counter: `with tp.stage('io', n) as s: s.fence(out)`.

    Device-work stages MUST hand their output to `s.fence(out)` before the
    block closes: on the tunneled axon backend, wall-clock without a
    data-dependent device->host fetch measures host dispatch rate only and
    inflates throughput 10-60x (see utils/timing.py).  Stages that never call
    `fence` are recorded under a `name+'(host)'` key so dispatch-only numbers
    can't masquerade as device throughput.
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.samples: dict[str, int] = {}

    class _Stage:
        __slots__ = ("fenced",)

        def __init__(self):
            self.fenced = False

        def fence(self, out) -> None:
            """Block until `out` is actually computed (d2h fetch)."""
            from dl_ofdm_tpu.utils.timing import d2h_fence
            d2h_fence(out)
            self.fenced = True

    @contextlib.contextmanager
    def stage(self, name: str, n_samples: int):
        s = self._Stage()
        t0 = time.perf_counter()
        yield s
        dt = time.perf_counter() - t0
        if not s.fenced:
            name = name + "(host)"
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.samples[name] = self.samples.get(name, 0) + n_samples

    def report(self) -> dict[str, float]:
        return {k: self.samples[k] / max(self.totals[k], 1e-12)
                for k in self.totals}


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
