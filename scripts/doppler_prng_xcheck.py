"""Decisive follow-up on the fused-Doppler PRNG hypothesis (VERDICT #1).

doppler_rootcause.py established: the fused kernel's Doppler DISTRIBUTION is
indistinguishable from the jnp oracle (EVM, H autocorrelation vs theory,
moments), and the emulator arm (kernel math, jax.random bits) trains as well
as the jnp chain — but the fused arm reproduces the round-3 training FAIL
exactly (tail val BER 0.0355, seed 1).  The only remaining delta is the
hardware-PRNG bit stream.  Two ways a bit stream can hurt training while
passing marginal-distribution probes:

  (a) exploitable cross-draw structure (bits<->taps<->noise dependence):
      the model fits plane-specific structure that does not transfer —
      signature: fused-trained model GOOD on fused data, BAD on jnp data;
  (b) reduced effective sample diversity (cross-step stream correlation):
      optimization sees "less data" than it should — signature: fused-
      trained model bad on BOTH planes (matches its WORSE train CE).

This script runs:
  1. 2x3 transfer matrix: {fused, jnp}-trained x {fused, emu, jnp}-eval
     val BER (80-epoch arms, matched seed).
  2. bit-plane serial correlation (lag 1..4 across frame positions) and
     bits<->noise cross-correlation, fused vs emu.
  3. cross-step correlation: same statistics between two batches drawn with
     consecutive trainer-style split keys.

Usage: python scripts/doppler_prng_xcheck.py   (chip must be free)
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.ops import fused_synth as fs
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
    from dl_ofdm_tpu.train.curriculum import sample_snr
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    from run_experiments14 import BASE_EPOCHS, OPT, ensure_awgn_base

    enable_persistent_cache()
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "p15_prng_xcheck.json")
    report = {}

    # ---- 1. train both arms, matched seed --------------------------------
    cfg, token, base_params = ensure_awgn_base(nbits=1, snr=5.0,
                                               epochs=BASE_EPOCHS[1])
    arms = {}
    for arm in ("fused", "jnp"):
        tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=80,
                         early_stop=80, token=token, seed=1,
                         save_dir="/tmp/xck", opt=OPT)
        eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=True,
                              pretrained_rx=base_params, freeze_rx=False)
        eq.fused_curriculum = (arm == "fused")
        t0 = time.time()
        state, info = eq.fit(log_fn=lambda *a: None)
        arms[arm] = (eq, state)
        report[f"{arm}_best_train_ce"] = round(info["best_loss"], 6)
        log(f"{arm} arm trained ({time.time()-t0:.0f}s), "
            f"best CE {info['best_loss']:.5f}")

    # ---- 2x3 transfer matrix ---------------------------------------------
    eq0 = arms["jnp"][0]
    spec = eq0._fused_synth_spec
    b_eval = 8192
    matrix = {}
    for trained, (eq, state) in arms.items():
        for plane in ("fused", "emu", "jnp"):
            bers = []
            for rep in range(4):
                k = jax.random.fold_in(jax.random.PRNGKey(777), rep)
                ks, kd = jax.random.split(k)
                snr = sample_snr(ks, b_eval, eq0._snr_offset)
                if plane == "fused":
                    bits, rx, _, _ = fs.fused_synthesize(
                        spec, b_eval, kd, snr, True)
                elif plane == "emu":
                    bits, rx, _, _ = fs.emulate_fused_synthesize(
                        spec, b_eval, kd, snr, want_h=True)
                else:
                    bits, rx, _, _, _ = jax.jit(
                        lambda kk, ss: eq0.synthesize(kk, b_eval, ss))(
                            kd, snr)
                _, aux = jax.jit(
                    lambda p, b, x: eq0._loss_fn(p, b, x))(
                        state.params, bits, rx)
                bers.append(float(aux["ber"]))
            matrix[f"{trained}_on_{plane}"] = {
                "mean": float(np.mean(bers)),
                "per_rep": [round(v, 6) for v in bers]}
            log(f"{trained}-trained on {plane}-data: "
                f"BER {np.mean(bers):.5f}")
    report["transfer_matrix"] = matrix

    # ---- bit/noise stream statistics -------------------------------------
    def stream_stats(plane, key):
        ks, kd = jax.random.split(key)
        snr = jnp.full((4096,), 10.0, jnp.float32)
        if plane == "fused":
            bits, _, _, _, dbg = fs.fused_synthesize(
                spec, 4096, kd, snr, True, True)
        else:
            bits, _, _, _, dbg = fs.emulate_fused_synthesize(
                spec, 4096, kd, snr, debug=True, want_h=True)
        n_r = np.asarray(dbg[2], np.float64)
        bb = np.asarray(bits[..., 0], np.float64) * 2 - 1     # +-1
        # lag correlation across frame positions
        lags = {}
        for lag in (1, 2, 3, 4):
            c = np.corrcoef(bb[:, :-lag].ravel(), bb[:, lag:].ravel())[0, 1]
            lags[lag] = round(float(c), 6)
        # bits x noise cross-correlation at matched leading positions
        m = min(bb.shape[1], n_r.shape[1])
        cx = np.corrcoef(bb[:, :m].ravel(), n_r[:, :m].ravel())[0, 1]
        nse = 1.0 / np.sqrt(bb[:, :m].size)
        return {"bit_lag_corr": lags, "bits_noise_corr": round(float(cx), 6),
                "mc_sigma": round(float(nse), 6),
                "bit_mean": round(float(bb.mean()), 6)}

    report["within_call"] = {
        p: stream_stats(p, jax.random.PRNGKey(5)) for p in ("fused", "emu")}
    log(f"within-call stats: {json.dumps(report['within_call'])}")

    # ---- cross-step correlation (trainer-style consecutive keys) ---------
    def draw_bits(plane, key):
        snr = jnp.full((4096,), 10.0, jnp.float32)
        if plane == "fused":
            bits, _, _ = fs.fused_synthesize(spec, 4096, key, snr)
        else:
            bits, _, _ = fs.emulate_fused_synthesize(spec, 4096, key, snr)
        return np.asarray(bits[..., 0], np.float64) * 2 - 1

    xstep = {}
    for plane in ("fused", "emu"):
        key = jax.random.PRNGKey(9)
        key, k1 = jax.random.split(key)
        key, k2 = jax.random.split(key)
        b1, b2 = draw_bits(plane, k1), draw_bits(plane, k2)
        c = np.corrcoef(b1.ravel(), b2.ravel())[0, 1]
        agree = float((b1 == b2).mean())
        xstep[plane] = {"corr": round(float(c), 6),
                        "agree": round(agree, 6),
                        "mc_sigma": round(1.0 / np.sqrt(b1.size), 6)}
    report["cross_step_bits"] = xstep
    log(f"cross-step stats: {json.dumps(xstep)}")

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
