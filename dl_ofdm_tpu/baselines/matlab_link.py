"""MATLAB-parity OFDM link for the classical-baseline suite.

The reference's classical receivers are benchmarked on a slightly different
link than its Python DCCN path (`dev/m/OFDM_Benchmark_dev.m`):

  * qammod(...,'gray') constellations (unscaled) rather than the Python maps;
  * pilot power tied to the constellation peak: txamp*sqrt(1/2)*(1+1j)
    (`:251-253`);
  * scaled transforms: IFFT_Data = (N/sqrt(N-2*Np)) * ifft(Data)
    and Rx_Freq = (sqrt(N-2*Np)/N) * fft(Rx) (`:256,339`);
  * per-symbol PAPR-8 clip (`:260-267`);
  * physically-normalized Rayleigh path gains (`rayleighchan`
    NormalizePathGains) and a CAUSAL channel filter (`filter(h, x)`), i.e.
    full-convolution prefix rather than np.convolve 'same' (`:283-301`);
  * awgn(...,'measured'): noise power = measured mean signal power / SNR.

This module reproduces those semantics as vectorized real-pair JAX ops so the
whole classical benchmark (20,000 frames x 9 SNRs x 10 estimators) runs as a
handful of batched XLA programs instead of MATLAB parfor loops.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.channel import fir
from dl_ofdm_tpu.channel.doppler import jakes_gains_iq
from dl_ofdm_tpu.channel.profiles import get_profile
from dl_ofdm_tpu.ofdm.constellation import _matlab_table_np, bits_from_indices
from dl_ofdm_tpu.ofdm.plan import SubcarrierPlan
from dl_ofdm_tpu.ops import cfloat

# MATLAB Fd table (`OFDM_Benchmark_dev.m:93-108`) — note ETU is 70 Hz here
# vs 300 Hz in the reference Python code (known inconsistency, SURVEY 7.3).
MATLAB_FD = {"awgn": 0.0, "flat": 0.0, "epa": 5.0, "eva": 70.0, "etu": 70.0,
             "custom": 80.0}


@dataclasses.dataclass
class MatlabLinkOut:
    tx_symbols: jnp.ndarray   # [B, frame_size] int symbol indices
    y: jnp.ndarray            # [B, S, K+CP, 2] channel output (pre-noise)
    g: jnp.ndarray            # [B, S, K, 2] ground-truth channel DFT


class MatlabLink:
    def __init__(self, plan: SubcarrierPlan, m_order: int,
                 channel: str = "flat", mobile: bool = False,
                 per_sample: bool = False):
        """`per_sample=True` applies the mobile fading as MATLAB's
        `filter(rayleighchan, x)` does — per-SAMPLE time-varying tap gains,
        causal, state continuous across symbol boundaries within the frame
        (`dev/m/OFDM_Benchmark_dev.m:277-311`) — instead of the
        symbol-averaged FIR kernel (documented deviation #7).  The mobile
        ground truth G then averages the SAME per-sample gains over every
        sample instant in the symbol (exact G3d semantics, `:303-309`,
        rather than the 8-instant approximation)."""
        self.plan = plan
        self.m = m_order
        self.nbits = int(np.log2(m_order))
        self.channel = channel.lower()
        self.mobile = mobile
        self.per_sample = per_sample
        table = _matlab_table_np(m_order)
        self.table_iq = jnp.asarray(
            np.stack([table.real, table.imag], -1), jnp.float32)
        txamp = float(np.abs(table).max())
        pv = txamp * np.sqrt(0.5)
        self.pilot_iq = jnp.asarray([pv, pv], jnp.float32)
        # scaled-transform factor N/sqrt(N-2*Np)
        self.tx_scale = plan.nfft / np.sqrt(plan.nfft - 2 * plan.n_pilot)
        self.profile = get_profile(self.channel, plan.sample_rate,
                                   weighting="physical")
        self.fd = MATLAB_FD[self.channel] if mobile else 0.0

    # -- transmitter ---------------------------------------------------------
    def transmit(self, key: jax.Array, n_frames: int) -> tuple:
        """Random symbols -> time-domain frames (with CP, PAPR-clipped)."""
        plan = self.plan
        sym_idx = jax.random.randint(
            key, (n_frames, plan.frame_size), 0, self.m)
        sym_iq = self.table_iq[sym_idx]
        grid = jnp.zeros((n_frames, plan.nsymbol * plan.nfft, 2), jnp.float32)
        grid = grid.at[:, plan.data_sc, :].set(sym_iq)
        grid = grid.at[:, plan.pilot_sc, :].set(self.pilot_iq)
        grid = grid.reshape(n_frames, plan.nsymbol, plan.nfft, 2)
        time = self.tx_scale * cfloat.idft_iq(grid)
        with_cp = jnp.concatenate(
            [time[:, :, -plan.cp_len:, :], time], axis=2)
        # PAPR-8 clip, per symbol (MATLAB column = symbol)
        pwr = cfloat.abs2_iq(with_cp)
        thresh = 8.0 * jnp.mean(pwr, axis=2, keepdims=True)
        scale = jnp.sqrt(thresh / jnp.maximum(pwr, 1e-20))
        clipped = jnp.where((pwr > thresh)[..., None],
                            with_cp * scale[..., None], with_cp)
        return sym_idx, clipped

    # -- channel -------------------------------------------------------------
    def fade(self, key: jax.Array, tx: jnp.ndarray) -> MatlabLinkOut:
        """Rayleigh fading with causal filtering + per-symbol ground truth."""
        plan = self.plan
        b, s, n_sc, _ = tx.shape
        p = self.profile
        if self.channel == "awgn":
            g = jnp.zeros((b, s, plan.nfft, 2), jnp.float32).at[..., 0].set(1.0)
            return MatlabLinkOut(None, tx, g)
        coeff = jnp.asarray(p.ch_coeff, jnp.float32)
        alpha = jnp.asarray(p.alpha_matrix, jnp.float32)
        if self.fd > 0.1 and self.per_sample:
            return self._fade_per_sample(key, tx, coeff, alpha)
        if self.fd > 0.1:
            # MATLAB's mobile ground truth averages G over the sample
            # instants within each symbol (`OFDM_Benchmark_dev.m:303-309`);
            # the DFT is linear in the gains, so average the Jakes gains at
            # `n_sub` intra-symbol instants (the filtering itself uses the
            # symbol-averaged kernel — a documented approximation of
            # MATLAB's per-sample time-varying filter).
            n_sub = 8
            t_sym = n_sc / plan.sample_rate
            t = (jnp.arange(s * n_sub, dtype=jnp.float32) *
                 (t_sym / n_sub))
            z_fine = jakes_gains_iq(key, jnp.full((b,), self.fd), t,
                                    p.n_taps)          # [B, S*n_sub, taps, 2]
            zck = z_fine.reshape(b, s, n_sub, p.n_taps, 2).mean(axis=2)
        else:
            z = jax.random.normal(key, (b, p.n_taps, 2)) / np.sqrt(2.0)
            zck = jnp.broadcast_to(z[:, None], (b, s, p.n_taps, 2))
        a_taps = zck * coeff[None, None, :, None]
        gt = jnp.einsum("bstc,tf->bsfc", a_taps, alpha)   # [B, S, F, 2]
        g = cfloat.dft_iq(gt, plan.nfft)
        offsets = np.zeros(b, dtype=np.int32)              # causal filter(h, x)
        if self.fd > 0.1:
            # history length n_taps (< n_fir): reference parity with the
            # Python Doppler path (`dev/py/radio.py:401-402` prepends exactly
            # n_taps samples), which truncates the first n_fir-1-n_taps
            # ISI samples of each symbol; MATLAB's full filter(h, x) keeps
            # them — documented deviation shared with the reference.
            y = fir.fir_per_symbol_iq(tx, gt, p.n_taps, offsets)
        else:
            flat = tx.reshape(b, s * n_sc, 2)
            y = fir.fir_same_iq(flat, gt[:, 0], offsets).reshape(tx.shape)
        return MatlabLinkOut(None, y, g)

    def _fade_per_sample(self, key: jax.Array, tx: jnp.ndarray,
                         coeff: jnp.ndarray,
                         alpha: jnp.ndarray) -> MatlabLinkOut:
        """MATLAB-exact mobile fading: per-sample time-varying FIR.

        y[n] = sum_f g[n, f] * x[n - f]   (causal, zero prefix — filter(h,x))
        with g[n] = (z[n] o coeff) @ alpha, z[n] the Jakes gains at sample
        instant n (state continuous across the frame, as `rayleighchan`
        filtering is); ground truth G = fft(mean_n-in-symbol g[n]) — the
        exact G3d averaging (`OFDM_Benchmark_dev.m:303-309`).

        Implemented as a shift-and-accumulate over the n_fir taps (f32
        elementwise complex MACs; no gathers): n_fir passes over the flat
        [B, L, 2] waveform."""
        plan = self.plan
        b, s, n_sc, _ = tx.shape
        p = self.profile
        L = s * n_sc
        t = jnp.arange(L, dtype=jnp.float32) / plan.sample_rate
        z = jakes_gains_iq(key, jnp.full((b,), self.fd), t,
                           p.n_taps)                     # [B, L, taps, 2]
        a = z * coeff[None, None, :, None]               # scaled tap gains
        # per-sample FIR kernels g[n] = a[n] @ alpha  -> [B, L, n_fir, 2]
        g_ps = jnp.einsum("bltc,tf->blfc", a, alpha)
        x = tx.reshape(b, L, 2)
        xr, xi = x[..., 0], x[..., 1]
        yr = jnp.zeros_like(xr)
        yi = jnp.zeros_like(xi)
        n_fir = alpha.shape[1]
        for f in range(n_fir):
            # x[n - f] with zero prefix (causal full-convolution head)
            xr_s = jnp.pad(xr, ((0, 0), (f, 0)))[:, :L]
            xi_s = jnp.pad(xi, ((0, 0), (f, 0)))[:, :L]
            gr = g_ps[:, :, f, 0]
            gi = g_ps[:, :, f, 1]
            yr = yr + gr * xr_s - gi * xi_s
            yi = yi + gr * xi_s + gi * xr_s
        y = jnp.stack([yr, yi], axis=-1).reshape(tx.shape)
        # ground truth: average the SAME gains over all samples per symbol
        zck = z.reshape(b, s, n_sc, p.n_taps, 2).mean(axis=2)
        gt = jnp.einsum("bstc,tf->bsfc",
                        zck * coeff[None, None, :, None], alpha)
        g = cfloat.dft_iq(gt, plan.nfft)
        return MatlabLinkOut(None, y, g)

    # -- noise ---------------------------------------------------------------
    @staticmethod
    def awgn_measured(key: jax.Array, y: jnp.ndarray, snr_db: float):
        """awgn(...,'measured'): noise var = mean |y|^2 / 10^(snr/10)."""
        p_sig = jnp.mean(cfloat.abs2_iq(y))
        n_var = p_sig * 10.0 ** (-snr_db / 10.0)
        noise = jnp.sqrt(n_var / 2.0) * jax.random.normal(key, y.shape)
        return y + noise

    # -- receiver front end --------------------------------------------------
    def rx_front(self, y: jnp.ndarray) -> jnp.ndarray:
        """CP strip + scaled FFT -> [B, S, K, 2] frequency grid."""
        plan = self.plan
        no_cp = y[:, :, plan.cp_len:, :]
        return cfloat.dft_iq(no_cp) / self.tx_scale

    def pilot_ls(self, rx_freq: jnp.ndarray) -> jnp.ndarray:
        """LS pilot estimates Hhat = Y_p / pilot (pilot is real*(1+1j))."""
        b = rx_freq.shape[0]
        grid = rx_freq.reshape(b, -1, 2)
        yp = grid[:, self.plan.pilot_sc, :]               # [B, P, 2]
        pv = self.pilot_iq
        denom = pv[0] ** 2 + pv[1] ** 2
        hr = (yp[..., 0] * pv[0] + yp[..., 1] * pv[1]) / denom
        hi = (yp[..., 1] * pv[0] - yp[..., 0] * pv[1]) / denom
        return jnp.stack([hr, hi], axis=-1)

    def demodulate(self, eq_grid: jnp.ndarray) -> jnp.ndarray:
        """Extract data SCs and min-distance demap -> symbol indices."""
        b = eq_grid.shape[0]
        grid = eq_grid.reshape(b, -1, 2)
        data = grid[:, self.plan.data_sc, :]              # [B, frame, 2]
        d2 = ((data[..., None, 0] - self.table_iq[None, None, :, 0]) ** 2 +
              (data[..., None, 1] - self.table_iq[None, None, :, 1]) ** 2)
        return jnp.argmin(d2, axis=-1).astype(jnp.int32)

    def count_errors(self, tx_idx: jnp.ndarray, rx_idx: jnp.ndarray):
        """(bit errors, symbol errors, total bits, total symbols)."""
        tx_bits = bits_from_indices(tx_idx, self.nbits)
        rx_bits = bits_from_indices(rx_idx, self.nbits)
        bit_err = jnp.sum(tx_bits != rx_bits)
        sym_err = jnp.sum(tx_idx != rx_idx)
        return bit_err, sym_err, tx_bits.size, tx_idx.size
