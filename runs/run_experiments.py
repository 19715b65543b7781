"""Sequential experiment driver for round-1 result generation on the chip.

Produces, in order:
  1. AWGN DCCN curves for QPSK and 16QAM (BPSK already done);
  2. equalizer transfer-learning stage on mixRayleigh + cross-channel sweep;
  3. classical baseline curves (Perfect / LS-Spline / LMMSE / LMMSE-Fast on
     EVA and ETU) for the DCCN-vs-LMMSE comparison.
"""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.eval.sweep import ber_sweep, cross_channel_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
from dl_ofdm_tpu.train.loop import Trainer, TrainState

RUNS = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def train_awgn(nbits: int, snr: float, epochs: int):
    token = f"OFDM_Dense3_{nbits}mod_snr{int(snr)}_cpTrue"
    csv = os.path.join(RUNS, f"Test_DCCN_{token}_AWGN.csv")
    if os.path.isfile(csv):
        log(f"skip {token} (csv exists)")
        return
    cfg = OFDMConfig(nbits=nbits)
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=epochs,
                     early_stop=100, token=token, save_dir=RUNS)
    tr = Trainer(cfg, tc, channel="AWGN")
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    log(f"{token}: trained {info['best_epoch']+1} best epochs "
        f"in {time.time()-t0:.0f}s loss={info['best_loss']:.5f}")
    ckpt.save(os.path.join(RUNS, token), state)
    res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                    snrs=range(-10, 31), frames_per_point=20000,
                    batch_frames=2000, log_fn=lambda *a: None)
    res.to_csv(csv)
    log(f"{token}: sweep done, ber@{int(snr)}dB="
        f"{res.ber[list(res.snr).index(snr)]:.6f}")


def train_equalizer(epochs: int, mobile: bool = False, opt: int = 0):
    nbits, chan = 1, "mixRayleigh"
    token = f"OFDM_Dense3_{nbits}mod_snr5_cpTrue"
    suffix = "_mobile" if mobile else ""
    done = os.path.join(
        RUNS, f"Test_DCCN_{token}_Equalizer{opt}_{chan}"
              f"_test_chan_Custom{suffix}.csv")
    if os.path.isfile(done):
        log(f"skip equalizer{suffix} opt={opt} (csv exists)")
        return
    cfg = OFDMConfig(nbits=nbits)
    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=epochs,
                     early_stop=150, token=token, save_dir=RUNS, opt=opt)
    base = Trainer(cfg, tc, channel="AWGN")
    base_state = ckpt.restore(os.path.join(RUNS, token),
                              base.init_state(jax.random.PRNGKey(0)))
    eq = EqualizerTrainer(cfg, tc, channel=chan, mobile=mobile,
                          pretrained_rx=base_state.params)
    t0 = time.time()
    state, info = eq.fit(log_fn=lambda *a: None)
    log(f"equalizer{suffix} opt={opt}: trained best={info['best_epoch']} "
        f"in {time.time()-t0:.0f}s loss={info['best_loss']:.5f}")
    ckpt.save(os.path.join(RUNS, f"{token}_Equalizer{opt}_{chan}{suffix}"),
              state)

    def make_trainer(test_chan, mob):
        return EqualizerTrainer(cfg, tc, channel=test_chan, mobile=mob,
                                pretrained_rx=base_state.params)

    cross_channel_sweep(make_trainer, state.params, jax.random.PRNGKey(777),
                        token, opt, chan, mobile=mobile, save_dir=RUNS,
                        frames_per_point=30000, batch_frames=3000,
                        log_fn=lambda *a: None)
    log(f"equalizer{suffix} opt={opt}: cross-channel sweeps done")


def classical_curves():
    from dl_ofdm_tpu.baselines.classical_rx import run_benchmark
    from dl_ofdm_tpu.ofdm.plan import build_plan
    plan = build_plan(OFDMConfig())
    for chan in ("EVA", "ETU"):
        for eq_idx in (1, 2, 4, 10):
            t0 = time.time()
            try:
                _, _, path = run_benchmark(
                    plan, chan, eq_idx, n_frames=20000, save_dir=RUNS,
                    log_fn=lambda *a: None)
                log(f"baseline {chan}/{eq_idx}: {time.time()-t0:.0f}s -> {path}")
            except Exception as e:
                log(f"baseline {chan}/{eq_idx} FAILED: {e}")


if __name__ == "__main__":
    train_awgn(2, 10.0, 400)
    train_awgn(4, 20.0, 600)
    train_awgn(3, 15.0, 500)
    train_equalizer(600)
    classical_curves()
    # mobility (Doppler) configuration — BASELINE config #4
    train_equalizer(600, mobile=True)
    log("ALL DONE")
