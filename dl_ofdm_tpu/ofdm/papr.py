"""PAPR clipping (complex clip-by-norm).

Parity with the reference's two variants:
  * `clip_papr` — NumPy `Clip_by_norm_np` semantics (`dev/py/ofdm.py:156-170`):
    clip samples whose instantaneous power exceeds `peak` x mean power.
  * `clip_papr_iq` — TF `complex_clip` semantics (`dev/py/complex.py:21-27` as
    used at `dev/py/ofdmreceiver_np.py:131`): `tf.clip_by_norm(x, peak, axes=-1)`
    clips the IQ-norm of each sample to at most `peak` (an absolute amplitude
    cap, not PAPR-relative) and also returns the mean post-clip power.
"""
from __future__ import annotations

import jax.numpy as jnp


def clip_papr(x: jnp.ndarray, peak: float = 8.0) -> jnp.ndarray:
    """Clip complex waveform to PAPR <= peak (relative to mean power).

    Samples whose instantaneous power exceeds `peak * mean power` are scaled
    down to exactly that threshold amplitude (`sqrt(peak * avg_pwr)`), same
    convention as the MATLAB link's per-symbol clip
    (`dev/m/OFDM_Benchmark_dev.m:260-267`)."""
    sig_pwr = jnp.abs(x) ** 2 + 1e-8
    avg_pwr = jnp.mean(sig_pwr)
    clipped = jnp.sqrt(peak * avg_pwr) * x / jnp.sqrt(sig_pwr)
    return jnp.where(sig_pwr < peak * avg_pwr, x, clipped)


def clip_papr_iq(x_iq: jnp.ndarray, peak: float = 8.0):
    """Clip IQ pairs [..., 2] to norm <= peak; returns (clipped, mean power)."""
    norm = jnp.sqrt(jnp.sum(x_iq**2, axis=-1, keepdims=True) + 1e-12)
    scale = jnp.minimum(1.0, peak / norm)
    clipped = x_iq * scale
    power_tx = jnp.mean(jnp.sum(clipped**2, axis=-1))
    return clipped, power_tx
