"""Jakes-model Doppler fading via sum of sinusoids, fully vectorized.

Parity with the reference realization (`dev/py/radio.py:387-396`,
`doppler_realize` / `doppler_channel`):

  ss = 48 sinusoids; for tap k (1-based) and sinusoid n (1-based):
    n_vec[n]    = (n - 0.5) * pi / (4*ss)
    alpha_re[k] = k * pi / (4*ss),  alpha_im[k] = -alpha_re[k]
    f_re[n,k]   = Fd * cos(n_vec[n] + alpha_re[k])   (f_im analogous)
    theta_*     ~ U(0, 2*pi)                          (per frame, per n,k)
    zck(t)[k]   = sqrt(1/ss) * (sum_n cos(2*pi*t*f_re + th_re)
                                + 1j * sum_n cos(2*pi*t*f_im + th_im))

The reference evaluates one t per OFDM symbol (t = i * t_sym); here all frames
and symbols evaluate in one broadcasted cos-sum on the VPU instead of a Python
loop per frame per symbol.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SS = 48  # number of sinusoids


def jakes_frequencies(fd: jnp.ndarray, n_taps: int):
    """Per-(sinusoid, tap) discrete Doppler frequencies.

    Args:
      fd: [...] Doppler shifts (Hz), broadcastable.
    Returns (f_re, f_im): [..., SS, n_taps].
    """
    k_vec = np.arange(1, n_taps + 1)
    n_vec = (np.arange(1, SS + 1).reshape(SS, 1) - 0.5) * np.pi / (4 * SS)
    alpha_re = k_vec * np.pi / (4 * SS)
    base_re = jnp.asarray(np.cos(n_vec + alpha_re), dtype=jnp.float32)
    base_im = jnp.asarray(np.cos(n_vec - alpha_re), dtype=jnp.float32)
    fd = fd[..., None, None]
    return fd * base_re, fd * base_im


def jakes_gains_from_phases(th_re: jnp.ndarray, th_im: jnp.ndarray,
                            fd: jnp.ndarray, t: jnp.ndarray,
                            n_taps: int) -> jnp.ndarray:
    """Deterministic Jakes gains given the sinusoid phases.

    Shared by the jnp channel path and the fused Pallas synthesize kernel's
    emulator, so both provably evaluate the same sum-of-sinusoids.

    Args:
      th_re, th_im: [B, SS, n_taps] uniform(0, 2pi) phases.
      fd: [B] Doppler shift per frame (Hz); t: [S] symbol times (s).
    Returns zck: [B, S, n_taps, 2] float32.
    """
    f_re, f_im = jakes_frequencies(fd, n_taps)        # [B, SS, n_taps]
    phase = 2 * np.pi * t[None, :, None, None]        # [1, S, 1, 1]
    c1 = np.sqrt(1.0 / SS).astype(np.float32)
    mu_re = c1 * jnp.sum(jnp.cos(phase * f_re[:, None] + th_re[:, None]), axis=2)
    mu_im = c1 * jnp.sum(jnp.cos(phase * f_im[:, None] + th_im[:, None]), axis=2)
    return jnp.stack([mu_re, mu_im], axis=-1)         # [B, S, n_taps, 2]


def jakes_gains_iq(key: jax.Array, fd: jnp.ndarray, t: jnp.ndarray,
                   n_taps: int) -> jnp.ndarray:
    """Time-varying tap gains as real IQ pairs (TPU-safe, no complex dtype).

    Args:
      key: PRNG key (phases are drawn per leading-batch element).
      fd: [B] Doppler shift per frame (Hz).
      t: [S] evaluation times (s), one per OFDM symbol.
      n_taps: number of taps (padded size is fine; unused taps are masked
        downstream by zero channel coefficients).

    Returns zck: [B, S, n_taps, 2] float32.
    """
    b = fd.shape[0]
    kr, ki = jax.random.split(key)
    th_re = jax.random.uniform(kr, (b, SS, n_taps), minval=0.0,
                               maxval=2 * np.pi, dtype=jnp.float32)
    th_im = jax.random.uniform(ki, (b, SS, n_taps), minval=0.0,
                               maxval=2 * np.pi, dtype=jnp.float32)
    return jakes_gains_from_phases(th_re, th_im, fd, t, n_taps)


def jakes_gains(key: jax.Array, fd: jnp.ndarray, t: jnp.ndarray,
                n_taps: int) -> jnp.ndarray:
    """Complex-dtype wrapper of `jakes_gains_iq` (CPU/tests only)."""
    z = jakes_gains_iq(key, fd, t, n_taps)
    return (z[..., 0] + 1j * z[..., 1]).astype(jnp.complex64)
