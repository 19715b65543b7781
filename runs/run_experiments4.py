"""Phase-4: continue mobile-equalizer training to the reference budget.

Phase 2 trained the mobile (Jakes-Doppler) equalizer for 600 epochs — enough
to converge the static stage but short of the reference's 4000-epoch budget
(`dev/py/run_local_ofdm.py:96`); on EVA-mobile the 600-epoch model trailed
LS-Spline.  This phase warm-starts from the phase-2 checkpoint, trains up to
2400 more epochs (early-stop 300), and regenerates the mobile cross-channel
sweep CSVs.  Idempotent via a completion marker.
"""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.eval.sweep import cross_channel_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
from dl_ofdm_tpu.train.loop import Trainer

RUNS = os.path.dirname(os.path.abspath(__file__))
MARKER = os.path.join(RUNS, ".phase4_done")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    if os.path.isfile(MARKER):
        log("phase 4 already done")
        return
    nbits, chan, opt = 1, "mixRayleigh", 0
    token = f"OFDM_Dense3_{nbits}mod_snr5_cpTrue"
    cfg = OFDMConfig(nbits=nbits)
    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=2400,
                     early_stop=300, token=token, save_dir=RUNS, opt=opt)

    base = Trainer(cfg, tc, channel="AWGN")
    base_state = ckpt.restore(os.path.join(RUNS, token),
                              base.init_state(jax.random.PRNGKey(0)))

    eq = EqualizerTrainer(cfg, tc, channel=chan, mobile=True,
                          pretrained_rx=base_state.params)
    eq_path = os.path.join(RUNS, f"{token}_Equalizer{opt}_{chan}_mobile")
    warm = ckpt.restore(eq_path, eq.init_state(jax.random.PRNGKey(1)))
    log(f"warm start from {eq_path} (step {int(warm.step)})")

    t0 = time.time()
    state, info = eq.fit(seed=11, log_fn=lambda *a: None, init_state=warm)
    log(f"continued mobile equalizer: best={info['best_epoch']} "
        f"in {time.time()-t0:.0f}s loss={info['best_loss']:.5f}")
    ckpt.save(eq_path, state)

    # regenerate mobile cross-channel CSVs with the improved model
    for f in os.listdir(RUNS):
        if f.startswith(f"Test_DCCN_{token}_Equalizer{opt}_{chan}_test_chan_") \
                and f.endswith("_mobile.csv"):
            os.rename(os.path.join(RUNS, f),
                      os.path.join(RUNS, f + ".phase2"))

    def make_trainer(test_chan, mob):
        return EqualizerTrainer(cfg, tc, channel=test_chan, mobile=mob,
                                pretrained_rx=base_state.params)

    cross_channel_sweep(make_trainer, state.params, jax.random.PRNGKey(778),
                        token, opt, chan, mobile=True, save_dir=RUNS,
                        frames_per_point=30000, batch_frames=3000,
                        log_fn=lambda *a: None)
    log("mobile cross-channel sweeps regenerated")
    with open(MARKER, "w") as f:
        f.write(time.strftime("%F %T"))
    log("PHASE4 DONE")


if __name__ == "__main__":
    main()
