"""AWGN with per-frame SNR, on device.

Parity with `AWGN_channel_np` (`dev/py/radio.py:513-526`): the signal is
normalized by the square root of its *batch-wide* mean complex power, then
white Gaussian noise with per-component std sqrt(0.5)*10^(-SNR/20) is added
(SNR is a per-frame dB vector).  Returns (noisy IQ, mean noise power).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn_channel(key: jax.Array, x_iq: jnp.ndarray, snr_db: jnp.ndarray,
                 noise_dtype=jnp.bfloat16):
    """Args:
      key: PRNG key.
      x_iq: [B, S, T, 2] real IQ waveform.
      snr_db: [B] or [B, 1] per-frame SNR in dB.
      noise_dtype: dtype the unit normals are DRAWN in (arithmetic stays in
        x_iq's dtype).  Default bfloat16: the generator consumes half the
        random bits per sample — noise synthesis is a large slice of the
        fully-on-device train step — at a per-sample quantization of ~0.4%
        of the noise amplitude, orders below the BER sweeps' statistical
        resolution.  Pass x_iq.dtype for full-precision draws.

    Returns: (y_iq [B, S, T, 2], noise_power scalar).
    """
    snr_db = snr_db.reshape(-1, 1, 1, 1)
    sig_pwr = jnp.mean(x_iq[..., 0] ** 2 + x_iq[..., 1] ** 2)
    x_norm = x_iq * jax.lax.rsqrt(sig_pwr)
    noise_std = jnp.sqrt(0.5) * 10.0 ** (-snr_db / 20.0)
    unit = jax.random.normal(key, x_iq.shape, dtype=noise_dtype)
    noise = noise_std * unit.astype(x_iq.dtype)
    noise_power = jnp.mean(noise[..., 0] ** 2 + noise[..., 1] ** 2)
    return x_norm + noise, noise_power


def awgn_channel_phase(key: jax.Array, x_iq: jnp.ndarray, snr_db: jnp.ndarray,
                       eps: float = 1e-8):
    """The reference's in-graph AWGN variant (`dev/py/radio.py:62-88`):
    batch-normalize the input (moments over axis 0) / sqrt(2), then add noise
    whose amplitude is |N(0, level)| with a uniform random phase split as
    (sin, cos) across I/Q.  Built-but-bypassed in the reference graph
    (`ofdmreceiver_np.py:136-138`); provided for capability parity."""
    mean = jnp.mean(x_iq, axis=0, keepdims=True)
    var = jnp.var(x_iq, axis=0, keepdims=True)
    x_norm = (x_iq - mean) * jax.lax.rsqrt(var + eps) / jnp.sqrt(2.0)
    snr_db = snr_db.reshape(-1, 1, 1, 1)
    level = jnp.sqrt(0.5) * 10.0 ** (-snr_db / 20.0)
    ka, kp = jax.random.split(key)
    shape = x_iq.shape[:-1] + (1,)
    amp = jnp.abs(level * jax.random.normal(ka, shape))
    phase = jax.random.uniform(kp, shape, maxval=2 * jnp.pi)
    noise = jnp.concatenate([amp * jnp.sin(phase), amp * jnp.cos(phase)],
                            axis=-1)
    y = x_norm + noise
    noise_power = jnp.mean(noise[..., 0] ** 2 + noise[..., 1] ** 2)
    return y, noise_power


def awgn_channel_norm(key: jax.Array, x_iq: jnp.ndarray, snr_db: jnp.ndarray,
                      norm: bool = True, eps: float = 1e-6):
    """The reference's norm-toggle AWGN variant (`dev/py/radio.py:91-120`):
    batch-normalize the input (moments over axis 0) / sqrt(2); the noise std
    is sqrt(0.5)*10^(-SNR/20), optionally (norm toggle, a graph-time int
    condition in the reference) multiplied by each frame's post-normalization
    RMS amplitude.  Returns (noisy IQ, mean noise power)."""
    b = x_iq.shape[0]
    mean = jnp.mean(x_iq, axis=0, keepdims=True)
    var = jnp.var(x_iq, axis=0, keepdims=True)
    x_norm = (x_iq - mean) * jax.lax.rsqrt(var + eps) / jnp.sqrt(2.0)
    amp2 = x_norm[..., 0] ** 2 + x_norm[..., 1] ** 2
    avg_amp = jnp.sqrt(jnp.mean(amp2.reshape(b, -1), axis=1))    # [B]
    level = jnp.sqrt(0.5) * 10.0 ** (-snr_db.reshape(b) / 20.0)
    if norm:
        level = level * avg_amp
    noise = level.reshape(b, 1, 1, 1) * jax.random.normal(
        key, x_iq.shape, x_iq.dtype)
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
