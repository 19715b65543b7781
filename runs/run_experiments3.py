"""Phase-3 experiment queue (runs after run_experiments.py completes).

Produces:
  1. mobile (Jakes-Doppler) classical baseline curves on EVA and ETU —
     the `_mobile` CSV family pairing with the mobile DCCN-EQ sweep;
  2. the CP-exploitation ablation: basic DCCN trained with the CP stripped
     (--cp=False), reference phase A's second arm;
  3. a short-CP (longcp=False, 7% CP) AWGN config + classical curve.
All steps resume by output-file existence, mirroring the reference driver
(`dev/py/run_local_ofdm.py:82-90`).
"""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.eval.sweep import ber_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.loop import Trainer

RUNS = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def classical(chan: str, eq_idx: int, mobile: bool = False,
              longcp: bool = True, n_frames: int = 20000,
              mods=None, tag: str = ""):
    from dl_ofdm_tpu.baselines import estimators as E
    from dl_ofdm_tpu.baselines.classical_rx import run_benchmark
    from dl_ofdm_tpu.ofdm.plan import build_plan

    mobile_str = "_mobile" if mobile else ""
    cp_str = "" if longcp else "_shortcp"
    name = (f"BER_OFDM_{chan}_{E.ESTIMATOR_NAMES[eq_idx]}_lte_64_Gray"
            f"{mobile_str}{cp_str}{tag}.csv")
    if os.path.isfile(os.path.join(RUNS, name)):
        log(f"skip {name} (exists)")
        return
    plan = build_plan(OFDMConfig(longcp=longcp))
    t0 = time.time()
    try:
        _, _, path = run_benchmark(plan, chan, eq_idx, longcp=longcp,
                                   mobile=mobile, n_frames=n_frames,
                                   mods=mods, tag=tag,
                                   save_dir=RUNS, log_fn=lambda *a: None)
        log(f"baseline {chan}/{eq_idx}{mobile_str}{cp_str}{tag}: "
            f"{time.time()-t0:.0f}s -> {path}")
    except Exception as e:
        log(f"baseline {chan}/{eq_idx}{mobile_str}{cp_str}{tag} FAILED: {e}")


def train_awgn_variant(nbits: int, snr: float, epochs: int, *,
                       cp: bool = True, longcp: bool = True):
    token = (f"OFDM_Dense3_{nbits}mod_snr{int(snr)}_cp{cp}"
             f"{'' if longcp else '_shortcp'}")
    csv = os.path.join(RUNS, f"Test_DCCN_{token}_AWGN.csv")
    if os.path.isfile(csv):
        log(f"skip {token} (csv exists)")
        return
    cfg = OFDMConfig(nbits=nbits, cp=cp, longcp=longcp)
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=epochs,
                     early_stop=100, token=token, save_dir=RUNS)
    tr = Trainer(cfg, tc, channel="AWGN")
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    log(f"{token}: trained best={info['best_epoch']+1} epochs "
        f"in {time.time()-t0:.0f}s loss={info['best_loss']:.5f}")
    ckpt.save(os.path.join(RUNS, token), state)
    res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                    snrs=range(-10, 31), frames_per_point=20000,
                    batch_frames=2000, log_fn=lambda *a: None)
    res.to_csv(csv)
    i = list(res.snr).index(snr)
    log(f"{token}: sweep done, ber@{int(snr)}dB={res.ber[i]:.6f}")


if __name__ == "__main__":
    # 0. complete the reference estimator grid (script_rayleigh.m uses
    #    eq_idx {1,2,4,5,7,10}; 5=LS-Quadeer CP-enhanced, 7=ALMMSE)
    for chan in ("EVA", "ETU"):
        for eq_idx in (5, 7):
            classical(chan, eq_idx)
    # 1. mobile classical baselines (pairs with the mobile DCCN-EQ curves)
    for chan in ("EVA", "ETU"):
        for eq_idx in (1, 2, 4, 10):
            classical(chan, eq_idx, mobile=True)
    # 2. CP-exploitation ablation (reference phase A, --cp=False arm)
    train_awgn_variant(1, 5.0, 300, cp=False)
    # 3. short-CP config: DCCN + one classical curve
    train_awgn_variant(1, 5.0, 300, longcp=False)
    classical("EVA", 4, longcp=False)
    log("PHASE3 DONE")
