"""Training-run controls for the fused-vs-jnp data-plane comparison.

fused_synth_train_parity.py showed the fused-trained model at BER@5dB
2.9e-3 vs the round-1 jnp-trained curve's 0.8e-3.  The PRNG probe
(prng_quality_check.py) cleared the generator, so this script separates
data-plane effect from run-to-run training stochasticity: it retrains the
same config (BPSK/AWGN, 300 epochs) (a) on the jnp chain with today's code,
and (b) on the fused kernel with a different seed, and sweeps BER at
0/5/10 dB for each (200k frames/point for tight CIs at 5 dB).

Usage: python scripts/fused_synth_train_control.py  (chip must be free)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.eval.sweep import ber_sweep
from dl_ofdm_tpu.train.loop import Trainer


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def run(tag, fused, seed):
    cfg = OFDMConfig(nbits=1)
    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=300,
                     early_stop=100, token=f"ctl_{tag}", seed=seed,
                     save_dir="/tmp/ctl")
    tr = Trainer(cfg, tc, channel="AWGN")
    if not fused:
        tr._use_fused_synth = False
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                    snrs=[0, 5, 10], frames_per_point=200000,
                    batch_frames=4000, log_fn=lambda *a: None)
    bers = {int(s): float(b) for s, b in zip(res.snr, res.ber)}
    log(f"{tag}: best_epoch={info['best_epoch']} loss={info['best_loss']:.5f} "
        f"({time.time()-t0:.0f}s) BER@0={bers[0]:.5f} BER@5={bers[5]:.6f} "
        f"BER@10={bers[10]:.2e}")
    return bers


def main():
    r = {}
    r["jnp-s1"] = run("jnp_s1", fused=False, seed=1)
    r["fused-s1"] = run("fused_s1", fused=True, seed=1)
    r["fused-s2"] = run("fused_s2", fused=True, seed=2)
    r["jnp-s2"] = run("jnp_s2", fused=False, seed=2)
    log("summary BER@5dB: " + "  ".join(
        f"{k}={v[5]:.6f}" for k, v in r.items()))


if __name__ == "__main__":
    main()
