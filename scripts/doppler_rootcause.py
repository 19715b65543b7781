"""Root-cause the fused-Doppler training-quality FAIL (round-3 VERDICT #1).

The round-3 matched-seed control (`runs/p14_doppler_control.json`) found a
mobile arm trained on the fused Pallas data plane evaluates 1.8x worse
(tail val BER 0.0355 vs 0.0198) on the jnp-chain validation distribution
than one trained on the jnp chain.  The only math deltas are (a) the
hardware-PRNG/Box-Muller streams and (b) the per-symbol window-mask FIR
formulation.  This script separates them:

part `stats` — distribution-identity probes on chip, mixRayleigh-mobile +
  ETU-mobile, comparing THREE planes: fused kernel / emulator (= kernel
  math, jax.random bits) / jnp chain (`Trainer.synthesize`):
    * ZF self-consistency EVM: equalize each plane's rx with its OWN
      ground-truth per-symbol H at 30 dB and measure residual EVM per
      symbol.  A kernel whose waveform and H disagree (misaligned window,
      wrong history) shows excess EVM vs the jnp chain; matching EVM means
      the kernel's (y, H) pair is as self-consistent as the oracle's.
    * H temporal autocorrelation rho(lag) across OFDM symbols per plane vs
      the analytic sum-of-sinusoids value — too-fast/too-slow Doppler
      decorrelation trains a different channel distribution.
    * noise power and rx moments.

part `control` — 3-arm x 2-seed matched training control (80-epoch mobile
  fits, the `p14_doppler_control` recipe): jnp vs emulator vs fused.
    emulator ~ jnp, fused worse  -> the hardware-PRNG stream (or the
                                    on-chip kernel deviating from its
                                    emulator) is the culprit;
    emulator ~ fused, both worse -> the kernel MATH (window formulation)
                                    differs from the jnp chain;
    all three overlap            -> the round-3 FAIL was single-seed
                                    training variance.

Usage: python scripts/doppler_rootcause.py [stats|control|all]
(chip must be free; ~10 min stats, ~45 min control)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runs"))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def _zf_evm(bits, y_iq, h, plan, cp_len, offsets):
    """Per-symbol EVM of the plane's own-(bits, y, H) forward consistency.

    `y_iq` [B, S, sps, 2] is the PRE-noise, PRE-normalization faded signal
    (the probe floor is then pure ISI from the non-circular 'same' conv,
    identical across consistent planes — batch-norm's per-position affine
    would otherwise add a ~10% structural residual, pilots being
    deterministic get mean-subtracted).

    `offsets` [B] int: the per-frame 'same'-alignment offset (profile
    same_offset).  The frame conv is out[t] = sum_k x[t+off-k] g[k], an
    acausal shift of the kernel, so the EFFECTIVE circular channel is
    H_eff(k) = H(k) * exp(+2j pi k off / nfft); the stored ground-truth H
    (fft of the unshifted kernel, reference `dev/py/radio.py:437`) must be
    ramp-corrected before the comparison."""
    import jax.numpy as jnp
    import numpy as np
    from dl_ofdm_tpu.ofdm.constellation import _table_np
    from dl_ofdm_tpu.ops import cfloat

    b, s = y_iq.shape[0], y_iq.shape[1]
    nfft = plan.nfft
    x = y_iq[:, :, cp_len:cp_len + nfft, :]
    yf = cfloat.dft_iq(x, nfft)                       # [B, S, nfft, 2]
    # ramp-correct H to the effective ('same'-aligned) channel
    kk = np.arange(nfft)
    ang = (2 * np.pi / nfft) * np.asarray(offsets, np.float64)[:, None] * kk
    ramp = jnp.asarray(
        np.stack([np.cos(ang), np.sin(ang)], -1), jnp.float32)  # [B,nfft,2]
    h = cfloat.cmul_iq(h, ramp[:, None])
    # forward-residual consistency: Y[k] vs H_eff[k] * X[k] on the data SCs
    # (a ZF metric is deep-fade dominated — 1/|H|^2 blows up the variance;
    # the forward residual keeps the probe noise-floor sensitive)
    sym_idx = plan.data_sc // nfft
    k_idx = plan.data_sc % nfft
    yd = yf[:, sym_idx, k_idx, :]                     # [B, frame_size, 2]
    hd = h[:, sym_idx, k_idx, :]
    table = _table_np(1)
    tr = np.asarray(table.real, np.float32)
    ti = np.asarray(table.imag, np.float32)
    bb = bits[..., 0]                                 # nbits=1
    sr = jnp.where(bb == 0, tr[0], tr[1]).astype(jnp.float32)
    si = jnp.where(bb == 0, ti[0], ti[1]).astype(jnp.float32)
    sref = jnp.stack([sr, si], -1)                    # [B, frame_size, 2]
    hx = cfloat.cmul_iq(hd, sref)
    # per-frame complex scale a = <Y, HX> / <HX, HX> (absorbs the TX ifft /
    # batch-norm global gain, identical across planes)
    dots = jnp.sum(cfloat.cmul_iq(yd, cfloat.conj_iq(hx)), axis=1)
    pp = jnp.sum(cfloat.abs2_iq(hx), axis=1)
    a = dots / pp[..., None]                          # [B, 2]
    err = yd - cfloat.cmul_iq(a[:, None, :], hx)
    # split per OFDM symbol
    evm_sym = []
    for sidx in range(s):
        m = sym_idx == sidx
        if not m.any():
            evm_sym.append(float("nan"))
            continue
        e = jnp.sum(cfloat.abs2_iq(err[:, m]))
        p = jnp.sum(cfloat.abs2_iq(hx[:, m]))
        evm_sym.append(float(e / p))
    tot = float(jnp.sum(cfloat.abs2_iq(err)) / jnp.sum(cfloat.abs2_iq(hx)))
    return tot, evm_sym


def _h_autocorr(h):
    """Complex autocorrelation of per-symbol H across symbol lags."""
    import numpy as np
    hn = np.asarray(h, np.float64)
    hc = hn[..., 0] + 1j * hn[..., 1]                 # [B, S, nfft]
    den = np.mean(np.abs(hc) ** 2)
    s = hc.shape[1]
    rho = []
    for lag in range(1, s):
        num = np.mean(hc[:, :-lag] * np.conj(hc[:, lag:]))
        rho.append(float(np.real(num) / den))
    return rho


def _theory_rho(fd, t_sym, lags):
    """Analytic autocorr of the discrete sum-of-sinusoids generator
    (channel/doppler.py formulas): E z(t)z*(t+tau) real part per component
    = (1/2SS) sum_n [cos(2 pi f_re,n tau) + cos(2 pi f_im,n tau)]."""
    import numpy as np
    from dl_ofdm_tpu.channel.doppler import SS
    n_vec = (np.arange(1, SS + 1) - 0.5) * np.pi / (4 * SS)
    # tap-dependence via alpha_k is weak; average over taps 1..9
    rho = []
    for lag in lags:
        tau = lag * t_sym
        vals = []
        for k in range(1, 10):
            a = k * np.pi / (4 * SS)
            fre = fd * np.cos(n_vec + a)
            fim = fd * np.cos(n_vec - a)
            vals.append(0.5 * (np.mean(np.cos(2 * np.pi * fre * tau))
                               + np.mean(np.cos(2 * np.pi * fim * tau))))
        rho.append(float(np.mean(vals)))
    return rho


def part_stats(report):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.ops import fused_synth as fs
    from dl_ofdm_tpu.train.loop import Trainer

    report["stats"] = {}
    for chan in ("ETU", "mixRayleigh"):
        tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=4096 * 7),
                     channel=chan, mobile=True)
        spec = tr._fused_synth_spec
        assert spec is not None and spec.mobile
        plan = tr.plan
        b = 4608        # divisible by the 12-frame mixRayleigh-mobile cycle
        snr = jnp.full((b,), 30.0, jnp.float32)
        planes = {}
        k = jax.random.PRNGKey(123)

        def fused_plane(k):
            bits, _, _, h, (y_r, y_i, n_r, n_i) = fs.fused_synthesize(
                spec, b, k, snr, True, True)
            y = jnp.stack([y_r, y_i], -1).reshape(b, spec.nsymbol,
                                                  spec.sps, 2)
            return bits, y, h, jnp.stack([n_r, n_i], -1)

        def emu_plane(k):
            bits, _, _, h, (y_r, y_i, n_r, n_i) = fs.emulate_fused_synthesize(
                spec, b, k, snr, debug=True, want_h=True)
            y = jnp.stack([y_r, y_i], -1).reshape(b, spec.nsymbol,
                                                  spec.sps, 2)
            return bits, y, h, jnp.stack([n_r, n_i], -1)

        def jnp_plane(k):
            # Trainer.synthesize internals, stopping BEFORE awgn/batch-norm
            kb, kc, kn = jax.random.split(k, 3)
            bits = jnp.bitwise_and(
                jax.random.bits(kb, (b, plan.frame_size, 1), jnp.uint8),
                jnp.uint8(1)).astype(jnp.int32)
            wf = tr.tx(bits)
            ch = tr.channel(kc, wf)
            nstd = jnp.float32(np.sqrt(0.5) * 10 ** (-30.0 / 20.0))
            noise = nstd * jax.random.normal(
                kn, (b, spec.length, 2), jnp.float32)
            return bits, ch.y, ch.h_freq, noise

        planes["fused"] = jax.jit(fused_plane)(k)
        planes["emu"] = jax.jit(emu_plane)(k)
        planes["jnp"] = jax.jit(jnp_plane)(k)

        prof_idx = tr.channel._frame_profiles(b)
        offsets = tr.channel._offset_np[prof_idx]
        out = {}
        for name, (bits, y, h, noise) in planes.items():
            tot, per_sym = _zf_evm(bits, y, h, plan, plan.cp_len, offsets)
            rho = _h_autocorr(h)
            nn = np.asarray(noise, np.float64)
            out[name] = {"evm_total": tot,
                         "evm_per_symbol": [round(v, 6) for v in per_sym],
                         "h_rho": [round(v, 5) for v in rho],
                         "noise_mean": float(nn.mean()),
                         "noise_pwr": float((nn ** 2).sum(-1).mean()),
                         "sig_pwr": float(jnp.mean(jnp.sum(y ** 2, -1)))}
            log(f"{chan} {name}: EVM {tot:.3e} per-sym "
                f"{['%.1e' % v for v in per_sym]} rho1={rho[0]:.4f} "
                f"npwr={out[name]['noise_pwr']:.2e}")
        # analytic Doppler autocorr at the dominant Fd (ETU: 300 Hz)
        t_sym = plan.samples_per_symbol / plan.sample_rate
        out["theory_rho_fd300"] = [
            round(v, 5) for v in _theory_rho(300.0, t_sym, range(1, 7))]
        report["stats"][chan] = out


def part_control(report, epochs=80, seeds=(1, 2)):
    import jax
    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
    from run_experiments14 import BASE_EPOCHS, OPT, ensure_awgn_base

    report["control"] = {}
    for seed in seeds:
        for arm in ("jnp", "emu", "fused"):
            tag = f"{arm}_s{seed}"
            cfg, token, base_params = ensure_awgn_base(
                nbits=1, snr=5.0, epochs=BASE_EPOCHS[1])
            tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=epochs,
                             early_stop=epochs, token=token, seed=seed,
                             save_dir="/tmp/rc4", opt=OPT)
            eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=True,
                                  pretrained_rx=base_params, freeze_rx=False)
            eq.fused_curriculum = (arm == "fused")
            eq.emulated_curriculum = (arm == "emu")
            if arm == "fused":
                assert eq._use_fused_synth
            t0 = time.time()
            state, info = eq.fit(log_fn=lambda *a: None)
            tail = [h["val_ber"] for h in info["history"][-10:]]
            report["control"][tag] = {
                "best_loss": round(info["best_loss"], 6),
                "tail_mean_val_ber": sum(tail) / len(tail),
                "secs": round(time.time() - t0, 1)}
            log(f"control {tag}: tail val BER "
                f"{report['control'][tag]['tail_mean_val_ber']:.5f} "
                f"({report['control'][tag]['secs']}s)")


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("part", nargs="?", default="all",
                    choices=("stats", "control", "all"))
    args = ap.parse_args()
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "p15_doppler_rootcause.json")
    report = {}
    if os.path.isfile(out):
        with open(out) as f:
            report = json.load(f)
    if args.part in ("stats", "all") and "stats" not in report:
        part_stats(report)
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
    if args.part in ("control", "all") and "control" not in report:
        part_control(report)
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
