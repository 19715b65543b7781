"""On-chip validation + A/B timing of the fused Pallas synthesize kernel.

Validation (the CPU tests pin the math via the shared-helper emulator; this
script validates the hardware-only residue — PRNG plumbing, masking, Mosaic
lowering):
  1. batch-norm property: per-position mean ~ 0 and var ~ 1/2 EXACTLY (the
     normalization uses the batch's own realized moments, so any PRNG/mask
     defect breaks this identity) — checked at a block-divisible and a
     non-divisible batch.
  2. bits uniformity + determinism (same key -> bitwise-identical outputs).
  3. noise power vs analytic expectation.
  4. an 8-epoch BPSK/AWGN fit: label<->waveform correspondence (training
     cannot learn if bits and symbols are mismatched).

Timing: interleaved fused vs jnp synthesize and full train step.

Usage: python scripts/fused_synth_check.py  (chip must be free)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.channel.profiles import get_profile
from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ops import fused_synth as fs
from dl_ofdm_tpu.train.loop import Trainer
from dl_ofdm_tpu.utils.timing import bench_steps, d2h_fence, measure_fence_cost


def check_stats(spec, b, snr_val, tag):
    key = jax.random.PRNGKey(42)
    snr = jnp.full((b,), snr_val, jnp.float32)
    bits, rx, npow = fs.fused_synthesize(spec, b, key, snr)
    rx = np.asarray(rx)
    assert np.all(np.isfinite(rx)), f"{tag}: non-finite rx"
    pos_mean = rx.mean(axis=0)
    pos_var = rx.var(axis=0)
    print(f"{tag}: max|pos_mean|={np.abs(pos_mean).max():.2e} "
          f"max|pos_var-0.5|={np.abs(pos_var-0.5).max():.2e}")
    assert np.abs(pos_mean).max() < 1e-3, f"{tag}: batch-norm mean broken"
    assert np.abs(pos_var - 0.5).max() < 1e-3, f"{tag}: batch-norm var broken"
    bm = float(np.asarray(bits, np.float64).mean())
    print(f"{tag}: bits mean={bm:.4f}  noise_pwr={float(npow):.4f} "
          f"(expect {10**(-snr_val/10):.4f})")
    assert abs(bm - 0.5) < 0.01
    np.testing.assert_allclose(float(npow), 10 ** (-snr_val / 10), rtol=0.03)
    # determinism
    bits2, rx2, _ = fs.fused_synthesize(spec, b, key, snr)
    assert np.array_equal(np.asarray(rx2), rx), f"{tag}: nondeterministic"
    print(f"{tag}: deterministic OK")


def main():
    plan = build_plan(OFDMConfig(nbits=1))
    spec_etu = fs.build_synth_spec(plan, get_profile("etu"), nbits=1)
    check_stats(spec_etu, 4096, 5.0, "ETU b=4096")
    check_stats(spec_etu, 1000, 5.0, "ETU b=1000 (masked tail)")
    plan4 = build_plan(OFDMConfig(nbits=4))
    spec16 = fs.build_synth_spec(plan4, None, nbits=4)
    check_stats(spec16, 2048, 15.0, "16QAM/AWGN b=2048")

    # static channel mixes (the equalizer curriculum's data plane)
    mixr = fs.build_synth_spec(
        plan, [get_profile(n) for n in ("flat", "etu", "eva", "epa")],
        nbits=1)
    check_stats(mixr, 2048, 5.0, "mixRayleigh b=2048")
    mixa = fs.build_synth_spec(
        plan, [None] + [get_profile(n)
                        for n in ("flat", "etu", "eva", "epa")], nbits=1)
    check_stats(mixa, 2000, 5.0, "mixAll b=2000 (blk=80)")
    # ground-truth H: finite, unit average power (normalized tap profiles)
    import jax.numpy as jnp
    key = jax.random.PRNGKey(7)
    _, _, _, h = fs.fused_synthesize(mixr, 2048, key,
                                     jnp.full((2048,), 5.0), True)
    h = np.asarray(h)
    assert np.all(np.isfinite(h))
    hp = (h[..., 0] ** 2 + h[..., 1] ** 2).mean()
    # analytic: E mean_k |H(k)|^2 = sum_t coeff_t^2 * ||alpha_t||^2 per
    # profile (fractional-delay rows have ||row||^2 < 1), averaged over the
    # mix; the flat profile's MC std alone is ~4% at 512 frames/profile
    want = np.mean([float((p.ch_coeff[:, None] ** 2
                           * p.alpha_matrix ** 2).sum())
                    for p in (get_profile(n)
                              for n in ("flat", "etu", "eva", "epa"))])
    print(f"mixRayleigh ground-truth H: mean|H|^2 = {hp:.4f} "
          f"(analytic {want:.4f})")
    assert abs(hp - want) < 0.1

    # Doppler (mobile) specs: per-symbol Jakes path (round 2)
    from dl_ofdm_tpu.config import OFDMConfig as _Cfg
    from dl_ofdm_tpu.train.loop import Trainer as _Tr
    from dl_ofdm_tpu.config import TrainConfig as _TC
    tr_mob = _Tr(_Cfg(nbits=1), _TC(batch_size=4096), channel="ETU",
                 mobile=True)
    spec_mob = tr_mob._fused_synth_spec
    assert spec_mob is not None and spec_mob.mobile
    check_stats(spec_mob, 2048, 5.0, "ETU-mobile b=2048")
    # ground-truth H must be per-symbol and actually time-varying, with the
    # same magnitude/decorrelation statistics as the jnp Jakes chain
    key = jax.random.PRNGKey(11)
    snrv = jnp.full((2048,), 5.0)
    _, _, _, h_k = fs.fused_synthesize(spec_mob, 2048, key, snrv, True)
    h_k = np.asarray(h_k)
    assert h_k.shape == (2048, 7, 64, 2)
    # jnp chain must run under jit on this backend (the TX constellation
    # table is host-complex; eager jnp.real on it is UNIMPLEMENTED here)
    h_j = np.asarray(jax.jit(
        lambda k: tr_mob.synthesize(k, 2048, snrv)[2])(
            jax.random.PRNGKey(12)))
    pk, pj = (h_k**2).sum(-1).mean(), (h_j**2).sum(-1).mean()
    dk = np.abs(h_k[:, 1:] - h_k[:, :-1]).mean()
    dj = np.abs(h_j[:, 1:] - h_j[:, :-1]).mean()
    print(f"mobile H: power kernel={pk:.4f} jnp={pj:.4f}; "
          f"sym-to-sym delta kernel={dk:.5f} jnp={dj:.5f}")
    np.testing.assert_allclose(pk, pj, rtol=0.1)
    assert dk > 1e-3
    np.testing.assert_allclose(dk, dj, rtol=0.15)
    # mixRayleigh-mobile: 48-block (12-cycle) path compiles + is sane
    tr_mix = _Tr(_Cfg(nbits=1), _TC(batch_size=4096), channel="mixRayleigh",
                 mobile=True)
    check_stats(tr_mix._fused_synth_spec, 2016, 5.0,
                "mixRayleigh-mobile b=2016 (blk=48)")

    # label<->waveform correspondence: a short AWGN fit must learn
    tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=3584, snr=5.0),
                 channel="AWGN")
    assert tr._use_fused_synth, "fused path not engaged on TPU"
    state, info = tr.fit(seed=0, max_epochs=8, grow_batch=False,
                         log_fn=lambda *a: None)
    final_ber = info["history"][-1]["val_ber"]
    print(f"AWGN BPSK fit (fused synth): val BER after 8 epochs = "
          f"{final_ber:.4f}")
    assert final_ber < 0.05, "fused-synth training failed to learn"

    if "--validate-only" in sys.argv:   # pytest chip-path mode: skip timing
        print("VALIDATION OK (timing skipped)")
        return

    # ---- interleaved timing -------------------------------------------------
    fence = measure_fence_cost()
    key = jax.random.PRNGKey(0)
    tr_f = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=65534),
                   channel="ETU")
    tr_j = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=65534),
                   channel="ETU")
    tr_j._use_fused_synth = False
    b = tr_f.batch_frames
    snr = jnp.full((b,), 5.0, jnp.float32)

    @jax.jit
    def synth_fused(k):
        return fs.fused_synthesize(tr_f._fused_synth_spec, b, k, snr)[1]

    @jax.jit
    def synth_jnp(k):
        return tr_j.synthesize(k, b, snr)[1]

    states = {"fused": {"s": tr_f.init_state(key)},
              "jnp": {"s": tr_j.init_state(key)}}

    def mk_step(tr, st):
        def step(i):
            st["s"], _ = tr.train_step(st["s"], jax.random.fold_in(key, i),
                                       snr)
            return st["s"].params
        return step

    variants = {
        "synth-fused": lambda i: synth_fused(jax.random.fold_in(key, i)),
        "synth-jnp": lambda i: synth_jnp(jax.random.fold_in(key, i)),
        "step-fused": mk_step(tr_f, states["fused"]),
        "step-jnp": mk_step(tr_j, states["jnp"]),
    }
    for name, fn in variants.items():
        print(f"compiling {name}...", flush=True)
        d2h_fence(fn(0))
    best = {n: float("inf") for n in variants}
    for rnd in range(4):
        for n, fn in variants.items():
            best[n] = min(best[n], bench_steps(fn, iters=30, repeats=1,
                                               fence_cost=fence))
        print(f"round {rnd}: " + "  ".join(
            f"{n}={best[n]*1e3:.3f}ms" for n in variants), flush=True)
    iq = b * 7 * 80
    print(f"\n== best, {b} frames/step ==")
    for n, t in best.items():
        print(f"{n:12s} {t*1e3:7.3f} ms   {iq/t/1e9:6.2f} G IQ/s")


if __name__ == "__main__":
    main()
