"""Phase-10: BASELINE.json configs #3/#4/#5 — higher-order modulations over
Rayleigh fading.

The reference driver's equalizer stage only ever ran BPSK
(`dev/py/run_local_ofdm.py:92`), but the graded configs ask for more:

  #3  16-QAM over Rayleigh (low delay spread), DCCN vs LMMSE baseline
  #4  8/16-QAM over Rayleigh with high delay spread + mobility (Doppler)
  #5  transfer-learning curriculum across ALL modulations

This queue produces:
  1. equalizer transfer learning at nbits=2/3/4 on mixRayleigh (static)
     + cross-channel sweeps  (#5, #3-learned);
  2. nbits=3/4 mobile equalizers (#4-learned);
  3. classical comparators at QPSK/8QAM/16QAM on EPA (low delay spread) and
     ETU (high delay spread), static + mobile, estimators
     {1 Perfect, 4 LMMSE, 10 LMMSE-Fast}, written as `_allmod`-tagged CSVs
     so MATLAB-parity files are untouched (#3/#4-classical).

Resume-by-CSV as in every phase; AWGN bases are retrained on demand
(checkpoint dirs are gitignored and may be cleaned).
"""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments8 import RUNS, ensure_awgn_base, log
from dl_ofdm_tpu.config import TrainConfig
from dl_ofdm_tpu.eval.sweep import cross_channel_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

BASE_EPOCHS = {1: 300, 2: 400, 3: 500, 4: 600}


def train_equalizer10(nbits: int, opt: int = 0, epochs: int = 600,
                      mobile: bool = False, channel: str = "mixRayleigh"):
    suffix = "_mobile" if mobile else ""
    snr = 5.0 * nbits
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    done = os.path.join(
        RUNS, f"Test_DCCN_{token}_Equalizer{opt}_{channel}"
              f"_test_chan_Custom{suffix}.csv")
    if os.path.isfile(done):
        log(f"skip equalizer{suffix} nbits={nbits} opt={opt} (csv exists)")
        return
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=epochs,
                     early_stop=150, token=token, save_dir=RUNS, opt=opt)
    eq = EqualizerTrainer(cfg, tc, channel=channel, mobile=mobile,
                          pretrained_rx=base_params)
    t0 = time.time()
    state, info = eq.fit(log_fn=lambda *a: None)
    log(f"equalizer{suffix} nbits={nbits} opt={opt}: "
        f"trained best={info['best_epoch']} in {time.time()-t0:.0f}s "
        f"loss={info['best_loss']:.5f}")
    ckpt.save(os.path.join(RUNS, f"{token}_Equalizer{opt}_{channel}{suffix}"),
              state)

    def make_trainer(test_chan, mob):
        return EqualizerTrainer(cfg, tc, channel=test_chan, mobile=mob,
                                pretrained_rx=base_params)

    cross_channel_sweep(make_trainer, state.params, jax.random.PRNGKey(777),
                        token, opt, channel, mobile=mobile, save_dir=RUNS,
                        frames_per_point=30000, batch_frames=3000,
                        log_fn=lambda *a: None)
    log(f"equalizer{suffix} nbits={nbits} opt={opt}: sweeps done")


def classical_allmod(chan: str, eq_idx: int, mobile: bool = False,
                     n_frames: int = 20000):
    from dl_ofdm_tpu.baselines import estimators as E
    from dl_ofdm_tpu.baselines.classical_rx import run_benchmark
    from dl_ofdm_tpu.config import OFDMConfig
    from dl_ofdm_tpu.ofdm.plan import build_plan

    mobile_str = "_mobile" if mobile else ""
    name = (f"BER_OFDM_{chan}_{E.ESTIMATOR_NAMES[eq_idx]}_lte_64_Gray"
            f"{mobile_str}_allmod.csv")
    if os.path.isfile(os.path.join(RUNS, name)):
        log(f"skip {name} (exists)")
        return
    plan = build_plan(OFDMConfig())
    t0 = time.time()
    try:
        _, _, path = run_benchmark(
            plan, chan, eq_idx, mobile=mobile, n_frames=n_frames,
            mods=(4, 8, 16), tag="_allmod", save_dir=RUNS,
            log_fn=lambda *a: None)
        log(f"classical-allmod {chan}/{eq_idx}{mobile_str}: "
            f"{time.time()-t0:.0f}s -> {path}")
    except Exception as e:
        log(f"classical-allmod {chan}/{eq_idx}{mobile_str} FAILED: {e}")


if __name__ == "__main__":
    # config #5: all-modulation transfer-learning curriculum (static)
    for nbits in (4, 2, 3):
        train_equalizer10(nbits)
    # config #4: high-order QAM + mobility
    for nbits in (4, 3):
        train_equalizer10(nbits, mobile=True)
    # configs #3/#4: classical comparators at QPSK/8QAM/16QAM
    for mobile in (False, True):
        for chan in ("EPA", "ETU"):
            for eq_idx in (1, 4, 10):
                classical_allmod(chan, eq_idx, mobile=mobile)
    log("PHASE10 DONE")
