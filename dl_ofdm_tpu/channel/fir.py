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


def _prealign_plane(xp: jnp.ndarray, offsets: np.ndarray, out_len: int):
    """xa[b, m] = xp[b, m + off_b] for a pre-padded plane xp [B, Lp].

    Offsets take at most a handful of distinct values (one per 3GPP profile),
    so this is a static slice per distinct offset combined with a where-mask —
    no device gather (TPU gathers are slow compared to slices+selects)."""
    offsets = np.asarray(offsets)
    uniq = np.unique(offsets)
    if len(uniq) == 1:
        off = int(uniq[0])
        return jax.lax.slice_in_dim(xp, off, off + out_len, axis=1)
    out = jnp.zeros((xp.shape[0], out_len), xp.dtype)
    for off in uniq:
        sl = jax.lax.slice_in_dim(xp, int(off), int(off) + out_len, axis=1)
        mask = jnp.asarray((offsets == off)[:, None])
        out = jnp.where(mask, sl, out)
    return out


def fir_same_iq(x: jnp.ndarray, h: jnp.ndarray,
                offsets: np.ndarray) -> jnp.ndarray:
    """np.convolve(x_b, h_b, 'same') per row, real-pair, static offsets.

    Internally planar (separate re/im [B, L] arrays) so the time axis sits on
    the 128-lane dimension — operating on the interleaved [..., 2] layout
    would waste most of the VPU lanes/bandwidth in the tap loop.

    Args:
      x: [B, L, 2]; h: [B, F, 2] (zero-padded kernels of a common length);
      offsets: STATIC per-row (F_orig-1)//2 alignment (numpy int array).
    Returns [B, L, 2].
    """
    b, l, _ = x.shape
    f = h.shape[1]
    pad = f - 1
    xr = jnp.pad(x[..., 0], ((0, 0), (pad, pad)))
    xi = jnp.pad(x[..., 1], ((0, 0), (pad, pad)))
    xar = _prealign_plane(xr, offsets, l + f - 1)    # [B, L+F-1]
    xai = _prealign_plane(xi, offsets, l + f - 1)
    out_r = jnp.zeros((b, l), x.dtype)
    out_i = jnp.zeros((b, l), x.dtype)
    for k in range(f):
        s = f - 1 - k
        sr = jax.lax.slice_in_dim(xar, s, s + l, axis=1)
        si = jax.lax.slice_in_dim(xai, s, s + l, axis=1)
        hr = h[:, k, 0:1]
        hi = h[:, k, 1:2]
        out_r = out_r + sr * hr - si * hi
        out_i = out_i + sr * hi + si * hr
    return jnp.stack([out_r, out_i], axis=-1)


def fir_per_symbol_iq(tx: jnp.ndarray, h_sym: jnp.ndarray, n_taps: int,
                      offsets: np.ndarray) -> jnp.ndarray:
    """Per-symbol time-varying FIR, real-pair, static offsets (planar inside).

    Same semantics as `fir_per_symbol` (reference `dev/py/radio.py:399-421`):
    n_taps look-back history from the previous symbols, zero future.

    Args:
      tx: [B, S, n_sc, 2]; h_sym: [B, S, F, 2]; offsets: static [B].
    Returns [B, S, n_sc, 2].
    """
    b, s, n_sc, _ = tx.shape
    f = h_sym.shape[2]
    wlen = n_taps + n_sc + f
    uniq = np.unique(np.asarray(offsets))

    def plane(p):
        pre = jnp.pad(p.reshape(b, s * n_sc), ((0, 0), (n_taps, 0)))
        # stack of S static window slices (no gather)
        win = jnp.stack(
            [jax.lax.slice_in_dim(pre, i * n_sc, i * n_sc + n_taps + n_sc,
                                  axis=1) for i in range(s)], axis=1)
        wpad = jnp.pad(win, ((0, 0), (0, 0), (f, f)))
        if len(uniq) == 1:
            off = int(uniq[0]) + 1
            return jax.lax.slice_in_dim(wpad, off, off + wlen, axis=2)
        out = jnp.zeros((b, s, wlen), p.dtype)
        for off in uniq:
            sl = jax.lax.slice_in_dim(wpad, int(off) + 1,
                                      int(off) + 1 + wlen, axis=2)
            mask = jnp.asarray((np.asarray(offsets) == off)[:, None, None])
            out = jnp.where(mask, sl, out)
        return out

    war = plane(tx[..., 0])
    wai = plane(tx[..., 1])
    out_r = jnp.zeros((b, s, n_sc), tx.dtype)
    out_i = jnp.zeros((b, s, n_sc), tx.dtype)
    base = n_taps + f - 1
    for k in range(f):
        st = base - k
        sr = jax.lax.slice_in_dim(war, st, st + n_sc, axis=2)
        si = jax.lax.slice_in_dim(wai, st, st + n_sc, axis=2)
        hr = h_sym[:, :, k, 0:1]
        hi = h_sym[:, :, k, 1:2]
        out_r = out_r + sr * hr - si * hi
        out_i = out_i + sr * hi + si * hr
    return jnp.stack([out_r, out_i], axis=-1)
