"""Real-pair complex arithmetic + matmul DFTs — the TPU-safe complex layer.

The TPU backend (and the MXU in particular) has no complex dtype support;
this module is the framework-wide convention for complex data on the hot
path: a trailing axis of size 2 holding (re, im), `float32`.

DFT/IDFT are expressed as real matrix products against precomputed cos/sin
matrices.  At the frame sizes of this system (nfft <= 2048, FIR <= 13 taps)
a dense DFT matmul IS the fast path on TPU: a [*, K] x [K, N] GEMM maps
straight onto the systolic array, while an FFT would serialize into log-N
small stages.  This also makes the learned-DFT ('fft_like') layer and the
true DFT literally the same computation — one matmul.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def conj_iq(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([x[..., 0], -x[..., 1]], axis=-1)


def cmul_iq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def abs2_iq(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0] ** 2 + x[..., 1] ** 2


def abs_iq(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return jnp.sqrt(abs2_iq(x) + eps)


def to_complex(x: jnp.ndarray):
    """IQ pair -> complex (host/CPU use only; TPU has no complex support)."""
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


def from_complex(x) -> jnp.ndarray:
    return jnp.stack([jnp.real(x).astype(jnp.float32),
                      jnp.imag(x).astype(jnp.float32)], axis=-1)


@functools.lru_cache(maxsize=None)
def _dft_mats_np(k_in: int, n_out: int, inverse: bool):
    """cos/sin matrices for X[m] = sum_t x[t] e^(-+ 2*pi*i*t*m / n_out).

    Cached as NumPy (device constants are created at use site — caching
    traced jnp values would leak tracers across jit scopes)."""
    t = np.arange(k_in)[:, None]
    m = np.arange(n_out)[None, :]
    theta = 2 * np.pi * t * m / n_out
    c = np.cos(theta)
    s = np.sin(theta)
    if inverse:
        c, s = c / n_out, s / n_out
    return (np.asarray(c, np.float32), np.asarray(s, np.float32))


def _dft_mats(k_in: int, n_out: int, inverse: bool):
    c, s = _dft_mats_np(k_in, n_out, inverse)
    return jnp.asarray(c), jnp.asarray(s)


def dft_iq(x: jnp.ndarray, n_out: int | None = None) -> jnp.ndarray:
    """DFT along the second-to-last axis of an IQ tensor [..., K, 2].

    Matches np.fft.fft(x_complex, n=n_out) for K <= n_out (zero-padded DFT,
    exactly the reference's `np.fft.fft(gt, nfft)` ground-truth channel).
    """
    k = x.shape[-2]
    n = n_out or k
    c, s = _dft_mats(k, n, inverse=False)
    xr, xi = x[..., 0], x[..., 1]
    # full f32: TPU default (bf16-pass) matmul precision puts ~-45 dB
    # deterministic distortion on the DSP transforms, visible at the
    # high-SNR end of BER sweeps; the np.fft parity contract needs f32.
    with jax.default_matmul_precision("float32"):
        # e^{-i theta}: Xr = xr.c + xi.s ; Xi = xi.c - xr.s
        return jnp.stack([xr @ c + xi @ s, xi @ c - xr @ s], axis=-1)


def cmatvec_iq(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Complex matrix-vector product in real pairs.

    w: [n, m, 2] complex matrix (IQ-last); x: [..., m, 2].
    Returns [..., n, 2] = W @ x.
    """
    wr, wi = w[..., 0], w[..., 1]
    xr, xi = x[..., 0], x[..., 1]
    yr = xr @ wr.T - xi @ wi.T
    yi = xr @ wi.T + xi @ wr.T
    return jnp.stack([yr, yi], axis=-1)


def solve_iq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the complex system A x = b in block-real form (TPU-safe).

    a: [..., n, n, 2]; b: [..., n, 2].  Uses the real embedding
    [[Ar, -Ai], [Ai, Ar]] [xr; xi] = [br; bi].
    """
    ar, ai = a[..., 0], a[..., 1]
    top = jnp.concatenate([ar, -ai], axis=-1)
    bot = jnp.concatenate([ai, ar], axis=-1)
    big = jnp.concatenate([top, bot], axis=-2)        # [..., 2n, 2n]
    rhs = jnp.concatenate([b[..., 0], b[..., 1]], axis=-1)[..., None]
    sol = jnp.linalg.solve(big, rhs)[..., 0]
    n = a.shape[-2]
    return jnp.stack([sol[..., :n], sol[..., n:]], axis=-1)


def idft_iq(x: jnp.ndarray, n_out: int | None = None) -> jnp.ndarray:
    """Inverse DFT along the second-to-last axis (np.fft.ifft parity,
    including the 1/N normalization)."""
    k = x.shape[-2]
    n = n_out or k
    c, s = _dft_mats(k, n, inverse=True)
    xr, xi = x[..., 0], x[..., 1]
    with jax.default_matmul_precision("float32"):   # see dft_iq
        # e^{+i theta}/N: yr = xr.c - xi.s ; yi = xr.s + xi.c
        return jnp.stack([xr @ c - xi @ s, xr @ s + xi @ c], axis=-1)
