"""Batched FIR convolution primitives for the fading channel.

TPU-native replacement for the reference's per-frame `np.convolve(tx, gt,
'same')` host loop (`dev/py/radio.py:436,419`): all frames (and, under Doppler,
all symbols) convolve in one batched FFT-multiply-IFFT — the classic
frequency-domain FIR, exact for linear convolution when padded to L + F - 1.

Alignment semantics are reproduced exactly: `np.convolve(x, h, 'same')` returns
full_conv[(len(h)-1)//2 : (len(h)-1)//2 + len(x)], so each caller passes the
profile-specific `same_offset`.  (FIR length — and hence alignment — differs
per 3GPP profile; see `profiles.TapProfile.same_offset`.)

The Doppler path uses per-symbol windows with `n_taps` look-back samples and a
zero-padded future, matching `dev/py/radio.py:399-421` edge semantics.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fft_conv_full(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Full linear convolution along the last axis via FFT.

    x: [..., L], h: [..., F] (broadcastable leading dims) -> [..., L+F-1].
    Supports complex inputs; exact up to float32 roundoff.
    """
    l, f = x.shape[-1], h.shape[-1]
    n = l + f - 1
    xf = jnp.fft.fft(x, n=n, axis=-1)
    hf = jnp.fft.fft(h, n=n, axis=-1)
    return jnp.fft.ifft(xf * hf, axis=-1)


def fir_same_batched(x: jnp.ndarray, h: jnp.ndarray, same_offset: int) -> jnp.ndarray:
    """np.convolve(x_i, h_i, 'same') for each batch row.

    Args:
      x: [..., L] complex signal.
      h: [..., F] complex FIR kernels (per batch row).
      same_offset: (F-1)//2 of the *original* kernel length (callers may pass
        zero-padded kernels of a common length; the offset must correspond to
        the unpadded length to match reference alignment).

    Returns [..., L] complex.
    """
    full = _fft_conv_full(x, h)
    return jnp.asarray(
        full[..., same_offset: same_offset + x.shape[-1]], dtype=x.dtype)


def fir_same_varlen(x: jnp.ndarray, h: jnp.ndarray,
                    same_offset: jnp.ndarray) -> jnp.ndarray:
    """Like `fir_same_batched` but with a per-row alignment offset.

    Used by the mixed-channel path where frames cycle through profiles with
    different FIR lengths (`dev/py/radio.py:450-490`): kernels are zero-padded
    to a common length and each row extracts its own 'same' window.

    Args:
      x: [B, L]; h: [B, Fmax]; same_offset: [B] int32.
    """
    full = _fft_conv_full(x, h)                      # [B, L+Fmax-1]
    pos = jnp.arange(x.shape[-1])[None, :] + same_offset[:, None]
    out = jnp.take_along_axis(full, pos, axis=-1)
    return jnp.asarray(out, dtype=x.dtype)


def fir_per_symbol(tx: jnp.ndarray, h_sym: jnp.ndarray, n_taps: int,
                   same_offset: jnp.ndarray | int) -> jnp.ndarray:
    """Per-symbol time-varying FIR with `n_taps` look-back history.

    Reproduces the reference Doppler convolution (`dev/py/radio.py:399-421`):
    for symbol i the window is tx_pre[n_sc*i : n_taps + n_sc*(i+1)] where
    tx_pre is the frame waveform with `n_taps` leading zeros; the window is
    convolved 'same' with that symbol's kernel and the first n_taps outputs
    are dropped.  Future samples beyond the symbol are zeros (look-ahead edge
    effect preserved).

    Args:
      tx: [B, S, n_sc] complex frame waveform (symbol-major).
      h_sym: [B, S, F] per-symbol FIR kernels.
      n_taps: history length in samples.
      same_offset: scalar or [B] alignment offset ((F_orig-1)//2).

    Returns [B, S, n_sc] complex.
    """
    b, s, n_sc = tx.shape
    flat = tx.reshape(b, s * n_sc)
    pre = jnp.pad(flat, ((0, 0), (n_taps, 0)))
    # windows[i] = pre[n_sc*i : n_taps + n_sc*(i+1)], shape [B, S, n_taps+n_sc]
    starts = np.arange(s) * n_sc
    idx = starts[:, None] + np.arange(n_taps + n_sc)[None, :]
    windows = pre[:, idx]                            # [B, S, n_taps+n_sc]
    full = _fft_conv_full(windows, h_sym)            # [B, S, n_taps+n_sc+F-1]
    off = jnp.asarray(same_offset)
    if off.ndim == 0:
        off = jnp.broadcast_to(off, (b,))
    pos = (jnp.arange(n_sc)[None, None, :] + n_taps + off[:, None, None])
    pos = jnp.broadcast_to(pos, (b, s, n_sc))
    out = jnp.take_along_axis(full, pos, axis=-1)
    return jnp.asarray(out, dtype=tx.dtype)


def np_convolve_same_reference(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Host-side oracle for tests: NumPy semantics, one row."""
    return np.convolve(x, h, mode="same")


# ---------------------------------------------------------------------------
# Real-pair (IQ-last) implementations — the TPU path.
#
# The TPU backend has no complex dtype, so the production channel path
# carries (re, im) pairs and performs the convolution as a static
# shift-and-accumulate: per-row 'same' offsets are STATIC (they derive from
# the frame -> profile cycle computed at trace time), so each row is
# pre-aligned with one static gather and the F-tap kernel reduces to F
# static slices of fused multiply-adds on the VPU.  No FFT, no complex.
# ---------------------------------------------------------------------------


def _prealign(x: jnp.ndarray, offsets: np.ndarray, f_max: int) -> jnp.ndarray:
    """xa[b, m, :] = x[b, m + off_b - (f_max-1), :], zero-padded OOB.

    x: [B, L, 2]; offsets: static int array [B].  Returns [B, L+f_max-1, 2].
    """
    b, l, _ = x.shape
    pad = f_max - 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    m = np.arange(l + f_max - 1)[None, :]
    idx = m + np.asarray(offsets)[:, None]           # + pad - (f_max-1) == +0
    idx = jnp.asarray(idx[..., None], jnp.int32)
    return jnp.take_along_axis(xp, jnp.broadcast_to(idx, (b, l + f_max - 1, 2)),
                               axis=1)


def fir_same_iq(x: jnp.ndarray, h: jnp.ndarray,
                offsets: np.ndarray) -> jnp.ndarray:
    """np.convolve(x_b, h_b, 'same') per row, real-pair, static offsets.

    Args:
      x: [B, L, 2]; h: [B, F, 2] (zero-padded kernels of a common length);
      offsets: STATIC per-row (F_orig-1)//2 alignment (numpy int array).
    Returns [B, L, 2].
    """
    b, l, _ = x.shape
    f = h.shape[1]
    xa = _prealign(x, offsets, f)                    # [B, L+F-1, 2]
    out_r = jnp.zeros((b, l), x.dtype)
    out_i = jnp.zeros((b, l), x.dtype)
    for k in range(f):
        s = f - 1 - k
        xs = jax.lax.slice_in_dim(xa, s, s + l, axis=1)
        hr = h[:, k, 0:1]
        hi = h[:, k, 1:2]
        out_r = out_r + xs[..., 0] * hr - xs[..., 1] * hi
        out_i = out_i + xs[..., 0] * hi + xs[..., 1] * hr
    return jnp.stack([out_r, out_i], axis=-1)


def fir_per_symbol_iq(tx: jnp.ndarray, h_sym: jnp.ndarray, n_taps: int,
                      offsets: np.ndarray) -> jnp.ndarray:
    """Per-symbol time-varying FIR, real-pair, static offsets.

    Same semantics as `fir_per_symbol` (reference `dev/py/radio.py:399-421`):
    n_taps look-back history from the previous symbols, zero future.

    Args:
      tx: [B, S, n_sc, 2]; h_sym: [B, S, F, 2]; offsets: static [B].
    Returns [B, S, n_sc, 2].
    """
    b, s, n_sc, _ = tx.shape
    f = h_sym.shape[2]
    flat = tx.reshape(b, s * n_sc, 2)
    pre = jnp.pad(flat, ((0, 0), (n_taps, 0), (0, 0)))
    # windows[i] = pre[n_sc*i : n_taps + n_sc*(i+1)]
    starts = np.arange(s) * n_sc
    widx = starts[:, None] + np.arange(n_taps + n_sc)[None, :]
    win = pre[:, widx]                               # [B, S, n_taps+n_sc, 2]
    # pad and pre-align so out[n] = sum_k h[k] * wa[n + n_taps + F - 1 - k]
    wpad = jnp.pad(win, ((0, 0), (0, 0), (f, f), (0, 0)))
    wlen = n_taps + n_sc + f
    m = np.arange(wlen)[None, None, :]
    idx = m + np.asarray(offsets)[:, None, None] + 1  # +f pad -(f-1) == +1
    idx = jnp.asarray(idx[..., None], jnp.int32)
    wa = jnp.take_along_axis(wpad, jnp.broadcast_to(idx, (b, s, wlen, 2)),
                             axis=2)                 # [B, S, wlen, 2]
    out_r = jnp.zeros((b, s, n_sc), tx.dtype)
    out_i = jnp.zeros((b, s, n_sc), tx.dtype)
    base = n_taps + f - 1
    for k in range(f):
        st = base - k
        xs = jax.lax.slice_in_dim(wa, st, st + n_sc, axis=2)
        hr = h_sym[:, :, k, 0:1]
        hi = h_sym[:, :, k, 1:2]
        out_r = out_r + xs[..., 0] * hr - xs[..., 1] * hi
        out_i = out_i + xs[..., 0] * hi + xs[..., 1] * hr
    return jnp.stack([out_r, out_i], axis=-1)
