"""Classical OFDM receiver + BER benchmark driver.

JAX replacement of `dev/m/OFDM_Benchmark_dev.m` (M1) and `script_rayleigh.m`
(M7): full classical link — MATLAB-parity TX, Rayleigh fading, AWGN
'measured', CP strip + scaled FFT, estimator dispatch (1-10), equalization,
Gray demapping, BER/SER — as batched XLA programs.

Protocol parity: SNR -10:5:30, configurable frame count (MATLAB uses 20,000),
CSV `BER_OFDM_<chan>_<est>_<pilot>_<N>_Gray[_mobile][_shortcp].csv` with rows
[SNRs; BER BPSK..16QAM] (`OFDM_Benchmark_dev.m:25-35,474-476`); for fading
channels only BPSK is swept (`:219-223`), matching MATLAB.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.baselines import estimators as E
from dl_ofdm_tpu.baselines.matlab_link import MatlabLink
from dl_ofdm_tpu.ofdm.plan import SubcarrierPlan
from dl_ofdm_tpu.ops import cfloat

_CTX_CACHE: dict = {}


def get_context(plan: SubcarrierPlan, channel: str) -> E.EstimatorContext:
    key = (plan.nfft, plan.nsymbol, plan.cp_len, tuple(plan.pilot_sc),
           channel.lower())
    if key not in _CTX_CACHE:
        _CTX_CACHE[key] = E.make_context(plan, channel)
    return _CTX_CACHE[key]


def _build_point_fn(link: MatlabLink, ctx: E.EstimatorContext, eq_idx: int):
    """Jitted per-batch kernel with SNR/beta as TRACED scalars, so one
    compile serves the whole SNR sweep (the old per-point closure recompiled
    an identical program for every SNR x modulation)."""

    @partial(jax.jit, static_argnums=4)
    def one_batch(key, w_prior, snr_db, beta, nb):
        # the estimator algebra (LS solves, Woodbury CP-enhanced, LMMSE) is
        # ill-conditioned enough that TPU default matmul precision (bf16
        # passes) corrupts it — measured 5x BER degradation on the
        # CP-enhanced estimator (eq5) vs f32.  Pin full f32 for this trace.
        with jax.default_matmul_precision("float32"):
            snr_lin = 10.0 ** (snr_db / 10.0)
            k1, k2, k3 = jax.random.split(key, 3)
            tx_idx, tx_wave = link.transmit(k1, nb)
            ch = link.fade(k2, tx_wave)
            y = link.awgn_measured(k3, ch.y, snr_db)
            rx_freq = link.rx_front(y)
            if link.channel == "awgn":
                eq_grid = rx_freq
            else:
                hhat = link.pilot_ls(rx_freq)
                g_est, x_eq = E.estimate(
                    eq_idx, ctx, rx_freq, hhat, ch.g, snr_lin, beta,
                    w_prior=w_prior, y_time=y)
                if x_eq is not None:
                    eq_grid = x_eq
                else:
                    d = cfloat.abs2_iq(g_est) + 1e-12
                    eq_grid = cfloat.cmul_iq(
                        rx_freq, cfloat.conj_iq(g_est)) / d[..., None]
            rx_idx = link.demodulate(eq_grid)
            return link.count_errors(tx_idx, rx_idx)

    return one_batch


def run_point(link: MatlabLink, ctx: E.EstimatorContext, eq_idx: int,
              key: jax.Array, snr_db: float, n_frames: int,
              batch: int = 2000, beta: float = 1.0):
    """One SNR point: returns (ber, ser)."""
    snr_lin = 10.0 ** (snr_db / 10.0)
    w_prior = None
    if eq_idx in (8, 9):
        rhh = ctx.rhh_uni if eq_idx == 8 else ctx.rhh_exp
        w_prior = E.precompute_prior_w(rhh, beta, snr_lin)

    fns = getattr(link, "_point_fns", None)
    if fns is None:
        fns = link._point_fns = {}
    if eq_idx not in fns:
        fns[eq_idx] = _build_point_fn(link, ctx, eq_idx)
    one_batch = fns[eq_idx]

    # fast-LMMSE needs the realized long-term Rhh first
    if eq_idx == 10:
        kf1, kf2, key = jax.random.split(key, 3)
        _, wv = link.transmit(kf1, min(batch, n_frames))
        g_ens = link.fade(kf2, wv).g
        w_prior = E.precompute_longterm_w(g_ens, beta, snr_lin)

    bit_err = sym_err = bits = syms = 0
    remaining = n_frames
    while remaining > 0:
        nb = min(batch, remaining)
        key, k = jax.random.split(key)
        be, se, tb, ts = one_batch(k, w_prior, float(snr_db), float(beta), nb)
        bit_err += int(be); sym_err += int(se)
        bits += int(tb); syms += int(ts)
        remaining -= nb
    return bit_err / max(bits, 1), sym_err / max(syms, 1)


def export_snr_point_mat(link: MatlabLink, ctx, key: jax.Array,
                         snr_db: float, n_frames: int, path: str):
    """Per-SNR waveform export — `save_tx_data` parity
    (`OFDM_Benchmark_dev.m:460-466`, `parsave(filename, y, txbits, rxbits)`):
    the noisy time waveform (complex columns), the transmitted bits and the
    demodulated bits, one .mat per SNR point."""
    from scipy.io import savemat
    k1, k2, k3 = jax.random.split(key, 3)
    tx_idx, tx_wave = link.transmit(k1, n_frames)
    ch = link.fade(k2, tx_wave)
    y = link.awgn_measured(k3, ch.y, snr_db)
    rx_freq = link.rx_front(y)
    rx_idx = link.demodulate(rx_freq)     # estimator-free (LS path outside)
    y_np = np.asarray(y)
    y_c = (y_np[..., 0] + 1j * y_np[..., 1]).reshape(n_frames, -1).T
    shifts = np.arange(link.nbits - 1, -1, -1)

    def to_bits(idx):
        return ((np.asarray(idx)[..., None] >> shifts) & 1).reshape(-1, 1)

    savemat(path, {"y": y_c.astype(np.complex64),
                   "txbits": to_bits(tx_idx).astype(np.uint8),
                   "rxbits": to_bits(rx_idx).astype(np.uint8)})
    return path


def run_benchmark(plan: SubcarrierPlan, channel: str, eq_idx: int,
                  longcp: bool = True, mobile: bool = False,
                  n_frames: int = 20000, snrs=tuple(range(-10, 31, 5)),
                  seed: int = 0, save_dir: str = ".", log_fn=print,
                  mods=None, tag: str = "", save_tx_data: bool = False,
                  per_sample: bool = False):
    """Full sweep for one (channel, estimator); writes the MATLAB-schema CSV.

    `mods=None` keeps MATLAB parity (all four modulations for AWGN, BPSK
    only for fading, `OFDM_Benchmark_dev.m:219-223`).  Passing an explicit
    subset of (2, 4, 8, 16) sweeps those modulations on any channel — the
    higher-order-QAM-over-Rayleigh configs of BASELINE.json (#3/#4) that the
    MATLAB harness never exercised; rows land in the same schema slots
    (row 1+index in the canonical modulation order).  `tag` is appended to
    the filename so such extended sweeps never collide with parity CSVs.
    """
    if per_sample and not tag:
        # never overwrite the symbol-averaged parity CSVs (frozen schema)
        tag = "_persample"
    is_awgn = channel.lower() == "awgn"
    mod_order = (2, 4, 8, 16)
    ber_all = np.zeros((5, len(snrs)))
    ser_all = np.zeros((5, len(snrs)))
    if mods is None:
        mods = mod_order if is_awgn else (2,)
    else:
        bad = set(mods) - set(mod_order)
        if bad:
            raise ValueError(f"mods takes modulation orders from {mod_order},"
                             f" got {sorted(bad)}")
        if not tag:
            raise ValueError("explicit mods= requires a filename tag= so "
                             "MATLAB-parity CSVs are never overwritten")
        # non-parity sweep: unswept rows are NaN (loud) rather than the
        # schema's zeros, which would read as perfect decoding
        ber_all[1:] = np.nan
        ser_all[1:] = np.nan
    ber_all[0] = ser_all[0] = snrs
    ctx = get_context(plan, channel)
    key = jax.random.PRNGKey(seed)
    mod_names = {2: "BPSK", 4: "QPSK", 8: "8QAM", 16: "16QAM"}
    for m in mods:
        mi = mod_order.index(m)
        # per_sample: MATLAB-exact per-sample time-varying mobile fading
        # (matlab_link.py; measured delta vs the symbol-averaged kernel
        # <=0.07% at MATLAB Doppler rates, runs/p19_mobile_per_sample.json)
        link = MatlabLink(plan, m, channel, mobile, per_sample=per_sample)
        beta = E.BETAS[m]
        for si, snr in enumerate(snrs):
            key, k = jax.random.split(key)
            ber, ser = run_point(link, ctx, eq_idx, k, float(snr), n_frames,
                                 beta=beta)
            ber_all[mi + 1, si] = ber
            ser_all[mi + 1, si] = ser
            log_fn(f"{channel}/{E.ESTIMATOR_NAMES[eq_idx]} M={m} "
                   f"SNR={snr}: BER={ber:.6f}")
            if save_tx_data:
                mat_dir = os.path.join(save_dir, "mat")
                os.makedirs(mat_dir, exist_ok=True)
                cpstr = "" if longcp else "_shortcp"
                key, km = jax.random.split(key)
                export_snr_point_mat(
                    link, ctx, km, float(snr), min(n_frames, 2000),
                    os.path.join(mat_dir,
                                 f"ofdm_{channel.lower()}_{mod_names[m]}"
                                 f"_{int(snr)}dB{cpstr}.mat"))
    mobile_str = "_mobile" if mobile else ""
    cp_str = "" if longcp else "_shortcp"
    name = (f"BER_OFDM_{channel}_{E.ESTIMATOR_NAMES[eq_idx]}_"
            f"{plan.pilot_type}_{plan.nfft}_Gray{mobile_str}{cp_str}{tag}.csv")
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, name)
    np.savetxt(path, ber_all, delimiter=",")
    # SER artifact parity: MATLAB stores berofdm_all AND serofdm_all in the
    # .mat next to the BER csv (`OFDM_Benchmark_dev.m:454-458,474-476`);
    # also write the SER as a same-schema csv for toolless inspection.
    np.savetxt(os.path.join(save_dir, "SER" + name[3:]), ser_all,
               delimiter=",")
    try:
        from scipy.io import savemat
        savemat(path[:-4] + ".mat",
                {"berofdm_all": ber_all, "serofdm_all": ser_all,
                 "mat_name": name[:-4] + ".mat"})
    except ImportError:  # scipy is in the image; guard for minimal installs
        pass
    return ber_all, ser_all, path
