"""CP-enhanced channel estimation (Quadeer 2010) — `dev/m/cpenhanced.m`.

Per frame: for each OFDM symbol, the cyclic-prefix samples are re-used to
LS-estimate the time-domain channel taps h (via a comb matrix mixing the
previous and current symbol's CP-region data), then the data grid X is
jointly re-estimated from the stacked system

    B = [diag(Gls); H_L @ Q_NL],   C = [Rx_Freq; ycp - Xcp_u @ h]

solved in least squares.  Symbols are processed sequentially (the comb uses
the previous symbol's tail) -> lax.scan over symbols, vmap over frames.

TPU-native notes: all complex algebra is real-pair; the (N+L) x N normal
equations B^H B = diag(|g|^2) + M^H M (M = H_L Q, rank <= L) are solved with
the Woodbury identity — an L x L solve (L = CP length) instead of the
MATLAB N x N inverse, algebraically identical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.ops import cfloat


@functools.lru_cache(maxsize=None)
def _static(n: int, l: int):
    """Static index/mask/matrix constants.

    Must return NumPy (not jnp) arrays: the first call may happen inside a
    jit trace, where jnp array creation yields tracers — caching those
    leaks them into subsequent traces (UnexpectedTracerError)."""
    # Q_NL: last L rows of conj(dftmtx(N))/N  (IDFT matrix rows N-L..N-1)
    t = np.arange(n)
    qinv = np.exp(2j * np.pi * np.outer(t, t) / n) / n
    qnl = qinv[n - l:, :]                                  # [L, N] complex
    qnl_iq = np.stack([qnl.real, qnl.imag], -1).astype(np.float32)
    # comb gather: mtx[i, j] = stacked[(L + i - j) mod 2L]
    i = np.arange(l)[:, None]
    j = np.arange(l)[None, :]
    comb_idx = ((l + i - j) % (2 * l)).astype(np.int32)
    tril_mask = (i >= j).astype(np.float32)                # lower-tri incl diag
    # Xcp_u mask: kept iff j >= i + 2 (col 0 zero, triu(k=1) of cols 1..L-1)
    upper_mask = (j >= i + 2).astype(np.float32)
    eye_l = np.eye(l, dtype=np.float32)
    return qnl_iq, comb_idx, tril_mask, upper_mask, eye_l


def _comb(prev: jnp.ndarray, cur: jnp.ndarray, comb_idx) -> jnp.ndarray:
    """circshift_comb: [L,2],[L,2] -> [L,L,2] with mtx[i,j] =
    cur[i-j] if i>=j else prev[L+i-j]."""
    stacked = jnp.concatenate([prev, cur], axis=0)         # [2L, 2]
    return stacked[comb_idx]                               # [L, L, 2]


def _hermitian_matmul_iq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """A^H B for IQ matrices a [m, k, 2], b [m, n, 2] -> [k, n, 2]."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar.T @ br + ai.T @ bi, ar.T @ bi - ai.T @ br], axis=-1)


def _cmatmul_iq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """A B for IQ matrices [m, k, 2] x [k, n, 2] -> [m, n, 2]."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar @ br - ai @ bi, ar @ bi + ai @ br], axis=-1)


def _cdiv_iq(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    d = cfloat.abs2_iq(b) + eps
    return cfloat.cmul_iq(a, cfloat.conj_iq(b)) / d[..., None]


def cp_enhanced_frame(rx_freq: jnp.ndarray, gls: jnp.ndarray,
                      y_time: jnp.ndarray, cp_len: int):
    """Batched CP-enhanced estimation.

    Args:
      rx_freq: [B, S, N, 2] frequency grid (scaled-FFT output);
      gls:     [B, S, N, 2] initial channel estimate;
      y_time:  [B, S, N+CP, 2] noisy time waveform (with CP);
      cp_len:  L.

    Returns (x_est [B, S, N, 2], g_est [B, S, N, 2]).
    """
    n = rx_freq.shape[2]
    l = cp_len
    qnl_iq, comb_idx, tril_mask, upper_mask, eye_l = _static(n, l)
    ridge = 1e-9

    def one_frame(rx_f, g0, y_t):
        xls = _cdiv_iq(rx_f, g0)                           # [S, N, 2]
        xls_time = cfloat.idft_iq(xls)                     # [S, N, 2]
        ycp = y_t[:, :l, :]                                # [S, L, 2]

        def step(xcp_prev, inputs):
            xls_t, ycp_j, rx_j, g_j = inputs
            xcp_this = xls_t[n - l:, :]                    # [L, 2]
            xcp = _comb(xcp_prev, xcp_this, comb_idx)      # [L, L, 2]
            xcp_u = xcp * upper_mask[..., None]
            # h = (Xcp^H Xcp + ridge I)^-1 Xcp^H ycp
            ata = _hermitian_matmul_iq(xcp, xcp)
            ata = ata.at[..., 0].add(ridge * eye_l)
            atb = _hermitian_matmul_iq(xcp, ycp_j[:, None, :])[:, 0, :]
            h = cfloat.solve_iq(ata, atb)                  # [L, 2]
            # H_L: lower-triangular Toeplitz of h
            h_l = _comb(jnp.zeros_like(h), h, comb_idx) * tril_mask[..., None]
            m = _cmatmul_iq(h_l, qnl_iq)                   # [L, N, 2]
            # C2 = ycp - Xcp_u h
            c2 = ycp_j - _cmatmul_iq(xcp_u, h[:, None, :])[:, 0, :]
            # Solve (D + M^H M) x = conj(g) rx + M^H c2 via Woodbury
            d = cfloat.abs2_iq(g_j) + ridge                # [N]
            rhs = cfloat.cmul_iq(cfloat.conj_iq(g_j), rx_j) + \
                _hermitian_matmul_iq(m, c2[:, None, :])[:, 0, :]
            u = rhs / d[:, None]
            mu = _cmatmul_iq(m, u[:, None, :])[:, 0, :]    # [L, 2] = M u
            # T = I + M D^-1 M^H
            mdm = _cmatmul_iq(m / d[None, :, None],
                              jnp.stack([m[..., 0].T, -m[..., 1].T], -1))
            t_mat = mdm.at[..., 0].add(eye_l)
            z = cfloat.solve_iq(t_mat, mu)                 # [L, 2]
            mhz = _hermitian_matmul_iq(m, z[:, None, :])[:, 0, :]
            x = u - mhz / d[:, None]
            return xcp_this, x

        _, xs = jax.lax.scan(step, jnp.zeros((l, 2), rx_f.dtype),
                             (xls_time, ycp, rx_f, g0))
        g_est = _cdiv_iq(rx_f, xs)
        return xs, g_est

    return jax.vmap(one_frame)(rx_freq, gls, y_time)
