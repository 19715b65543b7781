"""AWGN with per-frame SNR, on device.

Parity with `AWGN_channel_np` (`dev/py/radio.py:513-526`): the signal is
normalized by the square root of its *batch-wide* mean complex power, then
white Gaussian noise with per-component std sqrt(0.5)*10^(-SNR/20) is added
(SNR is a per-frame dB vector).  Returns (noisy IQ, mean noise power).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn_channel(key: jax.Array, x_iq: jnp.ndarray, snr_db: jnp.ndarray):
    """Args:
      key: PRNG key.
      x_iq: [B, S, T, 2] real IQ waveform.
      snr_db: [B] or [B, 1] per-frame SNR in dB.

    Returns: (y_iq [B, S, T, 2], noise_power scalar).
    """
    snr_db = snr_db.reshape(-1, 1, 1, 1)
    sig_pwr = jnp.mean(x_iq[..., 0] ** 2 + x_iq[..., 1] ** 2)
    x_norm = x_iq * jax.lax.rsqrt(sig_pwr)
    noise_std = jnp.sqrt(0.5) * 10.0 ** (-snr_db / 20.0)
    noise = noise_std * jax.random.normal(key, x_iq.shape, dtype=x_iq.dtype)
    noise_power = jnp.mean(noise[..., 0] ** 2 + noise[..., 1] ** 2)
    return x_norm + noise, noise_power


def awgn_channel_complex(key: jax.Array, x: jnp.ndarray, snr_db: jnp.ndarray):
    """Complex-waveform variant: x [B, S, T] complex, snr_db [B]."""
    snr_db = snr_db.reshape(-1, 1, 1)
    sig_pwr = jnp.mean(jnp.abs(x) ** 2)
    x_norm = x * jax.lax.rsqrt(sig_pwr)
    noise_std = jnp.sqrt(0.5) * 10.0 ** (-snr_db / 20.0)
    kr, ki = jax.random.split(key)
    shape = x.shape
    noise = (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape))
    noise = (noise_std * noise).astype(x.dtype)
    noise_power = jnp.mean(jnp.abs(noise) ** 2)
    return x_norm + noise, noise_power
