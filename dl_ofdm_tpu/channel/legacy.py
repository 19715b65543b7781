"""Legacy Rayleigh channel variants from the reference (capability parity).

The production fading path here is `channel/rayleigh.py` (fractional-delay
alpha matrices, `dev/py/radio.py:277-510`).  The reference also carries two
OLDER channel simulators with a coarser tap model, kept for parity:

* `RayLeigh_channel_np` (`dev/py/radio.py:194-257`): integer-delay taps
  (ceil(delay/Ts), duplicates merged keeping the FIRST power), per-frame iid
  Gaussian tap draws, `np.convolve(frame, ht, 'same')`, ground truth
  `H = fft(ht, nfft)` constant across the frame's symbols.
* `RayLeigh_channel` (TF graph, `dev/py/radio.py:123-188`): same tap model
  but ONE tap draw shared by the ENTIRE batch, TF 'SAME' cross-correlation
  alignment (`nn_conv1d_complex`, `dev/py/complex.py:30-48`), and in-graph
  AWGN whose level is scaled by the per-frame RMS amplitude of the distorted
  signal.

Both share a deliberate reference quirk, reproduced here: the tap weights are
the LINEAR POWERS divided by sqrt(sum of powers) — not amplitudes
(`dev/py/radio.py:162-164,231-233`) — and the same weight multiplies both the
re and im Gaussian draws.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from dl_ofdm_tpu.channel.fir import fir_same_iq
from dl_ofdm_tpu.ops import cfloat

# integer-delay legacy tap tables (`dev/py/radio.py:139-150,214-225`)
_LEGACY_TAPS = {
    "ETU": ([0, 50, 120, 200, 230, 500, 1600, 2300, 5000],
            [-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, -3.0, -5.0, -7.0]),
    "EPA": ([0, 30, 70, 90, 110, 190, 410],
            [0.0, -1.0, -2.0, -3.0, -8.0, -17.2, -20.8]),
    "EVA": ([0, 30, 150, 310, 370, 710, 1090, 1730, 2510],
            [0.0, -1.5, -1.4, -3.6, -0.6, -9.1, -7.0, -12.0, -16.9]),
}


@functools.lru_cache(maxsize=None)
def legacy_tap_coeff(chan: str, samp_rate: float,
                     n_signal: int) -> np.ndarray:
    """Integer-delay tap weight vector [N_fir] (`dev/py/radio.py:152-164`).

    ceil(delay/Ts) merges taps to sample-spaced bins, `np.unique` keeps the
    FIRST colliding tap's power; weights are linear powers / sqrt(sum powers)
    (the reference's power-not-amplitude quirk, reproduced)."""
    if chan.upper() not in _LEGACY_TAPS:
        return np.ones((1,), np.float32)        # flat single tap
    delay, pow_db = _LEGACY_TAPS[chan.upper()]
    delay = np.asarray(delay, np.float64)
    pow_db = np.asarray(pow_db, np.float64)
    t_ns = 1e9 / samp_rate
    n_fir = min(int(np.ceil(delay[-1] / t_ns)) + 1, n_signal)
    c_tap = np.ceil(delay / t_ns).astype(int)
    c_taps, c_idx = np.unique(c_tap, return_index=True)
    c_pow = 10.0 ** (pow_db[c_idx] / 10.0)
    coeff = np.zeros((n_fir,), np.float32)
    keep = c_taps < n_fir
    coeff[c_taps[keep]] = c_pow[keep] / np.sqrt(np.sum(c_pow))
    return coeff


def rayleigh_channel_legacy(key: jax.Array, x_iq: jnp.ndarray, nfft: int,
                            chan: str = "ETU",
                            samp_rate: float = 0.96e6):
    """Per-frame legacy fading (`RayLeigh_channel_np`, `dev/py/radio.py:194-257`).

    Args:
      x_iq: [n_fr, n_sym, n_sc, 2] real-pair waveform.
    Returns:
      (y_iq [n_fr, n_sym, n_sc, 2], h_iq [n_fr, n_sym, nfft, 2] — the
       frame-constant ground truth fft(ht, nfft), replicated per symbol).
    """
    n_fr, n_sym, n_sc, _ = x_iq.shape
    if chan.upper() == "AWGN":
        ones = jnp.stack([jnp.ones((n_fr, n_sym, nfft), x_iq.dtype),
                          jnp.zeros((n_fr, n_sym, nfft), x_iq.dtype)], -1)
        return x_iq, ones
    coeff = legacy_tap_coeff(chan, samp_rate, n_sym * n_sc)
    n_fir = len(coeff)
    draws = jax.random.normal(key, (n_fr, n_fir, 2),
                              x_iq.dtype) / jnp.sqrt(2.0)
    h_taps = draws * jnp.asarray(coeff)[None, :, None]       # [n_fr, F, 2]
    flat = x_iq.reshape(n_fr, n_sym * n_sc, 2)
    off = np.full((n_fr,), (n_fir - 1) // 2, np.int32)
    y = fir_same_iq(flat, h_taps, off).reshape(x_iq.shape)
    h_f = cfloat.dft_iq(h_taps, n_out=nfft)                  # [n_fr, nfft, 2]
    h_f = jnp.broadcast_to(h_f[:, None], (n_fr, n_sym, nfft, 2))
    return y, h_f


def rayleigh_channel_batch_coherent(key: jax.Array, x_iq: jnp.ndarray,
                                    snr_db: jnp.ndarray, chan: str = "ETU",
                                    samp_rate: float = 1e7):
    """In-graph legacy fading+noise (`RayLeigh_channel`, `dev/py/radio.py:123-188`).

    Quirks reproduced: ONE tap realization shared by the whole batch; the FIR
    runs as TF 'SAME' cross-correlation (kernel NOT flipped, left pad
    (F-1)//2); the AWGN level is scaled by each frame's distorted RMS
    amplitude.

    Args:
      x_iq: [B, S, T, 2]; snr_db: [B] or [B, 1] dB.
    Returns: (y_iq [B, S, T, 2], noise_power scalar).
    """
    b, s, t, _ = x_iq.shape
    n_signal = s * t
    coeff = legacy_tap_coeff(chan, samp_rate, n_signal)
    n_fir = len(coeff)
    kh, kn = jax.random.split(key)
    ht = (jax.random.normal(kh, (n_fir, 2), x_iq.dtype) / jnp.sqrt(2.0)
          * jnp.asarray(coeff)[:, None])                     # [F, 2]
    # cross-correlation == convolution with the reversed kernel; TF 'SAME'
    # places the output window at full[F-1-(F-1)//2 : ...]
    h_rev = jnp.broadcast_to(ht[::-1][None], (b, n_fir, 2))
    off = np.full((b,), n_fir - 1 - (n_fir - 1) // 2, np.int32)
    flat = x_iq.reshape(b, n_signal, 2)
    y = fir_same_iq(flat, h_rev, off)                        # [B, N, 2]

    amp2 = y[..., 0] ** 2 + y[..., 1] ** 2
    dist_amp = jnp.sqrt(jnp.mean(amp2, axis=1, keepdims=True))  # [B, 1]
    snr_db = snr_db.reshape(b, 1)
    level = jnp.sqrt(0.5) * 10.0 ** (-snr_db / 20.0) * dist_amp
    noise = level[..., None] * jax.random.normal(kn, y.shape, y.dtype)
    noise_power = jnp.mean(noise[..., 0] ** 2 + noise[..., 1] ** 2)
    return (y + noise).reshape(x_iq.shape), noise_power
