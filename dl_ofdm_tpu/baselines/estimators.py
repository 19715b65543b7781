"""Classical channel estimators 1-10 (JAX replacement of the MATLAB suite).

Estimator ids and math follow `dev/m/OFDM_Benchmark_dev.m:319-427` exactly:

   1 Perfect CSI                      (Gls = true G)
   2 LS + biharmonic spline           (griddata 'v4')
   3 LS + Delaunay linear             (scatteredInterpolant)
   4 ideal per-realization LMMSE      (Rhh = H H', W = Rhh(Rhh+b/snr I)^-1)
   5 LS + CP-enhanced (Quadeer)       (see cp_enhanced.py)
   6 ALMMSE + CP-enhanced
   7 approximate LMMSE                (Rhh from the LS estimate / Frame_size)
   8 LMMSE, uniform-PDP prior Rhh
   9 LMMSE, exponential-PDP prior Rhh
  10 fast LMMSE, long-term Rhh with W precomputed per SNR

TPU-native formulation notes:
  * the per-frame spline/linear `griddata` calls collapse into one static
    interpolation matrix (see interp.py) -> batched matmul;
  * the rank-1 LMMSE inversions (4, 6, 7) use the Sherman-Morrison closed
    form W x = s h (h^H x) / (c + s |h|^2) — algebraically identical to the
    MATLAB `inv` of the rank-1-plus-scaled-identity matrix, O(N) instead of
    O(N^3) per symbol;
  * prior/long-term LMMSE (8, 9, 10) precompute W once per SNR on the host
    (complex NumPy) and apply it as a batched real-pair matmul.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.baselines import interp, pdp
from dl_ofdm_tpu.baselines.cp_enhanced import cp_enhanced_frame
from dl_ofdm_tpu.channel.profiles import get_profile
from dl_ofdm_tpu.ofdm.plan import SubcarrierPlan
from dl_ofdm_tpu.ops import cfloat

ESTIMATOR_NAMES = {1: "Perfect", 2: "LS-Spline", 3: "LS-Linear", 4: "LMMSE",
                   5: "LS-Quadeer", 6: "LMMSE-Quadeer", 7: "ALMMSE",
                   8: "LMMSE-Uni-PDP", 9: "LMMSE-Exp-PDP", 10: "LMMSE-Fast"}

# beta per modulation order index (1..4), `OFDM_Benchmark_dev.m:216`
BETAS = {2: 1.0, 4: 1.0, 8: 17.0 / 9.0, 16: 17.0 / 9.0}


def _iq(c: np.ndarray) -> jnp.ndarray:
    """Host complex -> device IQ pair.

    MUST split re/im in NumPy BEFORE any jnp call: `cfloat.from_complex`
    uses jnp.real/imag, which on this TPU backend (no complex dtype) dies
    with UNIMPLEMENTED when handed a host complex array."""
    c = np.asarray(c)
    return jnp.asarray(np.stack([c.real, c.imag], -1).astype(np.float32))


@dataclasses.dataclass
class EstimatorContext:
    """Static per-configuration operators shared by all frames."""
    plan: SubcarrierPlan
    a_spline: jnp.ndarray     # [S*K, P] biharmonic interpolation operator
    a_linear: jnp.ndarray     # [S*K, P] Delaunay-linear operator
    rhh_uni: np.ndarray       # [K, K] complex prior (host)
    rhh_exp: np.ndarray


def make_context(plan: SubcarrierPlan, channel: str) -> EstimatorContext:
    """Build static operators (memoized by classical_rx.get_context)."""
    k, s = plan.nfft, plan.nsymbol
    # pilot coordinates in MATLAB's (subcarrier, symbol) plane, 1-based
    pf = plan.pilot_freq + 1
    pt = plan.pilot_sym + 1
    pilot_xy = np.stack([pf, pt], axis=-1).astype(np.float64)
    gm, gt = np.meshgrid(np.arange(1, k + 1), np.arange(1, s + 1))  # [S, K]
    eval_xy = np.stack([gm.ravel(), gt.ravel()], axis=-1).astype(np.float64)
    a_spline = jnp.asarray(interp.biharmonic_operator(pilot_xy, eval_xy),
                           jnp.float32)
    a_linear = jnp.asarray(interp.linear_operator(pilot_xy, eval_xy),
                           jnp.float32)
    if channel.lower() == "awgn":
        rhh_uni = rhh_exp = np.eye(k, dtype=np.complex128)
    else:
        prof = get_profile(channel, plan.sample_rate, weighting="physical")
        trms, _ = pdp.rms_delay_spread(prof.tap_delay_ns * 1e-9,
                                       prof.tap_pow_db)
        trms_samples = trms * plan.sample_rate
        # reference parity: MATLAB passes the tap COUNT as mmse_pdp's L
        # (`OFDM_Benchmark_dev.m:200-201` uses length(tau)), not the delay
        # support in samples — physically questionable at high sample rates
        # but kept verbatim so eq 8/9 curves are comparable.
        n_paths = prof.n_taps
        rhh_uni = pdp.mmse_pdp(n_paths, k, trms_samples, True)
        rhh_exp = pdp.mmse_pdp(n_paths, k, max(trms_samples, 1e-6), False)
    return EstimatorContext(plan=plan, a_spline=a_spline, a_linear=a_linear,
                            rhh_uni=rhh_uni, rhh_exp=rhh_exp)


def _interp_grid(a: jnp.ndarray, hhat: jnp.ndarray, s: int, k: int):
    """Apply a real interpolation operator to complex pilot estimates.

    a: [S*K, P]; hhat: [B, P, 2] -> [B, S, K, 2]."""
    hr = hhat[..., 0] @ a.T
    hi = hhat[..., 1] @ a.T
    return jnp.stack([hr, hi], -1).reshape(hhat.shape[0], s, k, 2)


def _rank1_lmmse(h: jnp.ndarray, x: jnp.ndarray, c, scale: float = 1.0):
    """W x with W = s h h^H (s h h^H + c I)^{-1} (Sherman-Morrison).

    h, x: [..., K, 2]; returns [..., K, 2]."""
    hh = jnp.sum(cfloat.abs2_iq(h), axis=-1, keepdims=True)    # |h|^2
    inner = jnp.sum(cfloat.cmul_iq(cfloat.conj_iq(h), x), axis=-2,
                    keepdims=True)                              # h^H x
    denom = c + scale * hh[..., None]
    return scale * cfloat.cmul_iq(h, inner) / denom


def precompute_prior_w(rhh: np.ndarray, beta: float, snr_lin: float):
    """W = Rhh (Rhh + (beta/snr) I)^{-1} as an IQ-pair matrix (host)."""
    n = rhh.shape[0]
    w = rhh @ np.linalg.inv(rhh + (beta / snr_lin) * np.eye(n))
    return _iq(w)


def precompute_longterm_w(g: jnp.ndarray, beta: float, snr_lin: float):
    """Fast-LMMSE W from the realized ensemble G [B, S, K, 2]
    (`OFDM_Benchmark_dev.m:319-321,342`)."""
    g_host = np.asarray(g)   # to host first — the TPU has no complex dtype
    gc = g_host[..., 0] + 1j * g_host[..., 1]
    cols = gc.reshape(-1, gc.shape[-1]).T                      # [K, B*S]
    rhh = (cols @ cols.conj().T) / cols.shape[1]
    return precompute_prior_w(rhh, beta, snr_lin)


def estimate(eq_idx: int, ctx: EstimatorContext, rx_freq: jnp.ndarray,
             hhat_pilots: jnp.ndarray, g_true: jnp.ndarray,
             snr_lin: float, beta: float,
             w_prior: jnp.ndarray | None = None,
             y_time: jnp.ndarray | None = None):
    """Returns (g_est [B,S,K,2], x_eq or None).

    For eq_idx 5/6 the CP-enhanced path returns the jointly re-estimated data
    grid X directly (the MATLAB code then uses it instead of Rx./Gls).
    """
    plan = ctx.plan
    s, k = plan.nsymbol, plan.nfft
    c = beta / snr_lin
    if eq_idx == 1:
        return g_true, None
    hls = _interp_grid(ctx.a_spline, hhat_pilots, s, k)
    if eq_idx == 2:
        return hls, None
    if eq_idx == 3:
        return _interp_grid(ctx.a_linear, hhat_pilots, s, k), None
    if eq_idx == 4:
        # per-symbol ideal LMMSE with Rhh = H H^H from true CSI
        return _rank1_lmmse(g_true, hls, c), None
    if eq_idx == 7:
        hbar = jnp.mean(hls, axis=1, keepdims=True)            # [B,1,K,2]
        g1 = _rank1_lmmse(hbar, hbar, c, scale=1.0 / s)
        return jnp.broadcast_to(g1, hls.shape), None
    if eq_idx in (8, 9):
        hbar = jnp.mean(hls, axis=1, keepdims=True)
        g1 = cfloat.cmatvec_iq(w_prior, hbar)
        return jnp.broadcast_to(g1, hls.shape), None
    if eq_idx == 10:
        return cfloat.cmatvec_iq(w_prior, hls), None
    if eq_idx in (5, 6):
        if eq_idx == 5:
            hbar = jnp.mean(hls, axis=1, keepdims=True)
            g0 = jnp.broadcast_to(hbar, hls.shape)
        else:
            hbar = jnp.mean(hls, axis=1, keepdims=True)
            # reference parity: MATLAB's eq6 ALMMSE init omits eq7's
            # /Frame_size scaling (`OFDM_Benchmark_dev.m`: eq6 Rhh=h*h' vs
            # eq7 Rhh=h*h'/Frame_size) — kept verbatim.
            g1 = _rank1_lmmse(hbar, hbar, c)
            g0 = jnp.broadcast_to(g1, hls.shape)
        x_eq, g_est = cp_enhanced_frame(rx_freq, g0, y_time, plan.cp_len)
        return g_est, x_eq
    raise ValueError(f"Unsupported estimator {eq_idx}")
