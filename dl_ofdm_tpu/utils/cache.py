"""Persistent XLA/Mosaic compilation cache for chip-facing entry points.

The axon backend's first compile of the fused-synthesis Pallas kernel costs
seconds (static single-profile specs) to >12 min (mixRayleigh / mobile
variants).  The JAX persistent compilation cache survives processes: measured
on this image, a 5.3 s first-train-step drops to 0.7 s in the next process,
and the multi-minute Mosaic compiles become one-time per spec.

Scoped to an explicit call (rather than package import) on purpose: CPU test
runs re-loading cached CPU AOT executables warn about host-feature mismatches
("could lead to SIGILL"), so only TPU entry points (queue scripts, bench,
chip probes) opt in.  Opt out anywhere with DL_OFDM_NO_COMPILE_CACHE=1;
relocate with DL_OFDM_COMPILE_CACHE=<dir>.
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache; returns the dir (or None
    when disabled).  Call before the first jit compile of interest."""
    if os.environ.get("DL_OFDM_NO_COMPILE_CACHE"):
        return None
    import jax
    cache_dir = (cache_dir or os.environ.get("DL_OFDM_COMPILE_CACHE")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "dl_ofdm_tpu", "xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
    return cache_dir
