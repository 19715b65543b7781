"""Phase-11 gap fill: remaining model/estimator variants with no generated
curve yet.

  1. `DNNReceiver` AWGN ablation curve — the reference's `ofdm_DNN_rx`
     all-dense receiver (C10 ablation, `dev/py/model.py:1539-1625`), which
     its driver never swept;
  2. the legacy single-graph equalized receiver (`ofdm_equalized_rx`,
     `dev/py/model.py:1421-1535`) trained directly on mixRayleigh (no
     transfer stage) + cross-channel sweep;
  3. classical estimator ids 3 (LS-Linear), 6 (LMMSE-Quadeer),
     8 (LMMSE-Uni-PDP), 9 (LMMSE-Exp-PDP) on EVA static — completing a
     generated curve for every estimator id 1-10 (the MATLAB grid only runs
     {1,2,4,5,7,10}, `dev/m/script_rayleigh.m:56`).

Resume-by-CSV as in every phase.
"""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments3 import classical
from run_experiments8 import RUNS, log
from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.eval.sweep import ber_sweep, cross_channel_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.loop import Trainer


def train_dnn_awgn(nbits: int = 1, snr: float = 5.0, epochs: int = 300):
    from dl_ofdm_tpu.models.dccn import DNNReceiver
    from dl_ofdm_tpu.ofdm.plan import build_plan
    token = f"OFDM_DNN_{nbits}mod_snr{int(snr)}_cpTrue"
    csv = os.path.join(RUNS, f"Test_DCCN_{token}_AWGN.csv")
    if os.path.isfile(csv):
        log(f"skip {token} (csv exists)")
        return
    cfg = OFDMConfig(nbits=nbits)
    plan = build_plan(cfg)
    model = DNNReceiver(nbits=nbits, nfft=cfg.nfft, cp_len=plan.cp_len,
                        nfilter=cfg.nfilter, frame_size=plan.frame_size)
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=epochs,
                     early_stop=100, token=token, save_dir=RUNS)
    tr = Trainer(cfg, tc, channel="AWGN", model=model)
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    log(f"{token}: trained best={info['best_epoch']+1} "
        f"in {time.time()-t0:.0f}s loss={info['best_loss']:.5f}")
    ckpt.save(os.path.join(RUNS, token), state)
    res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                    snrs=range(-10, 31), frames_per_point=20000,
                    batch_frames=2000, log_fn=lambda *a: None)
    res.to_csv(csv)
    log(f"{token}: AWGN sweep written")


def train_single_graph_eq(epochs: int = 600):
    from dl_ofdm_tpu.models.receiver import SingleGraphEqualizedRx
    from dl_ofdm_tpu.ofdm.plan import build_plan
    nbits, chan = 1, "mixRayleigh"
    token = f"OFDM_SingleGraphEq_{nbits}mod_snr5_cpTrue"
    done = os.path.join(
        RUNS, f"Test_DCCN_{token}_Equalizer11_{chan}_test_chan_Custom.csv")
    if os.path.isfile(done):
        log(f"skip {token} (csv exists)")
        return
    cfg = OFDMConfig(nbits=nbits)
    plan = build_plan(cfg)

    def make_model():
        return SingleGraphEqualizedRx(
            nbits=nbits, nfft=cfg.nfft, cp_len=plan.cp_len,
            nfilter=cfg.nfilter, frame_size=plan.frame_size,
            nsymbol=plan.nsymbol, pilot_size=plan.pilot_size)

    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=epochs,
                     early_stop=150, token=token, save_dir=RUNS)
    tr = Trainer(cfg, tc, channel=chan, model=make_model())
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    log(f"{token}: trained best={info['best_epoch']} "
        f"in {time.time()-t0:.0f}s loss={info['best_loss']:.5f}")
    ckpt.save(os.path.join(RUNS, f"{token}_Equalizer11_{chan}"), state)

    def make_trainer(test_chan, mob):
        return Trainer(cfg, tc, channel=test_chan, mobile=mob,
                       model=make_model())

    cross_channel_sweep(make_trainer, state.params, jax.random.PRNGKey(777),
                        token, 11, chan, mobile=False, save_dir=RUNS,
                        frames_per_point=30000, batch_frames=3000,
                        log_fn=lambda *a: None)
    log(f"{token}: cross-channel sweeps done")


if __name__ == "__main__":
    train_dnn_awgn()
    # estimator ids with no curve anywhere (MATLAB grid runs {1,2,4,5,7,10})
    for eq_idx in (3, 8, 9, 6):
        classical("EVA", eq_idx)
    train_single_graph_eq()
    log("PHASE11 DONE")
