"""Training-quality parity of the fused Pallas data plane.

Retrains BASELINE config #1 (BPSK, AWGN, reference protocol: SNR 5 dB,
batch 512, 300 epochs, early-stop 100) with `Trainer.train_step` on the
fused synthesize kernel, then runs the standard -10:1:30 x 20k-frame sweep
(eval stays on the jnp oracle path) and compares the BER curve against the
round-1 curve trained on the jnp chain
(runs/Test_DCCN_OFDM_Dense3_1mod_snr5_cpTrue_AWGN.csv).

Writes runs/Test_DCCN_OFDM_Dense3_1mod_snr5_cpTrue_fsynth_AWGN.csv (tagged
per repo convention — parity CSVs are never overwritten).

Usage: python scripts/fused_synth_train_parity.py  (chip must be free)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pandas as pd

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.eval.sweep import ber_sweep
from dl_ofdm_tpu.train.loop import Trainer

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    token = "OFDM_Dense3_1mod_snr5_cpTrue_fsynth"
    csv = os.path.join(RUNS, f"Test_DCCN_{token}_AWGN.csv")
    ref_csv = os.path.join(
        RUNS, "Test_DCCN_OFDM_Dense3_1mod_snr5_cpTrue_AWGN.csv")
    cfg = OFDMConfig(nbits=1)
    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=300,
                     early_stop=100, token=token, save_dir=RUNS)
    tr = Trainer(cfg, tc, channel="AWGN")
    assert tr._use_fused_synth, "fused synth not engaged"
    if os.path.isfile(csv):
        log("sweep csv exists; comparing only")
    else:
        t0 = time.time()

        def every25(msg):
            if int(msg.split()[1].rstrip(":")) % 25 == 0:
                log(msg)
        state, info = tr.fit(log_fn=every25)
        log(f"trained best_epoch={info['best_epoch']} "
            f"loss={info['best_loss']:.5f} in {time.time()-t0:.0f}s")
        res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                        snrs=range(-10, 31), frames_per_point=20000,
                        batch_frames=2000, log_fn=lambda *a: None)
        res.to_csv(csv)
        log(f"wrote {csv}")

    new = pd.read_csv(csv)
    old = pd.read_csv(ref_csv)
    log("SNR   BER(jnp-trained)  BER(fused-trained)")
    for snr in (0, 5, 10, 14):
        bo = float(old.BER[list(old.SNR).index(snr)])
        bn = float(new.BER[list(new.SNR).index(snr)])
        log(f"{snr:3d}   {bo:.6f}          {bn:.6f}")
    # Run-to-run training stochasticity dominates the waterfall region:
    # matched-seed controls (fused_synth_train_control.py) put fused and jnp
    # runs within MC error of each other (BER@5dB 0.86e-3 vs 0.88e-3 at
    # seed 1, 0.95e-3 vs 0.96e-3 at seed 2), while across seeds single runs
    # ranged 0.86e-3..2.9e-3.  Assert only the stochasticity-robust
    # properties: the flat low-SNR region and the waterfall's existence.
    b0o = float(old.BER[list(old.SNR).index(0)])
    b0n = float(new.BER[list(new.SNR).index(0)])
    assert abs(np.log10(b0n) - np.log10(b0o)) < 0.15
    assert float(new.BER[list(new.SNR).index(14)]) < 1e-4
    log("PARITY OK (matched-seed equivalence: see "
        "fused_synth_train_control.py)")


if __name__ == "__main__":
    main()
