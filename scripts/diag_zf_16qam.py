"""Diagnose the 16QAM ZF equalizer training instability (round-2 item 1).

The first chip run of the opt-12 (zero-forcing) 16QAM arm stalled at CE 4.8
(> the 0.69 random floor — confidently-wrong frozen head) and early-stopped
at epoch 44.  This A/B compares short fits of stabilization variants on CPU
with the chip-trained 16QAM AWGN base, interleaved, same seeds:

  phase      opt 0 control (reference phase-only division)
  zf         opt 12 as shipped (eps 1e-2)
  zf-e1      eps 0.1 (bounded inverse ~3x)
  zf-sg      stop_gradient through the 1/(|H|^2+eps) factor
  zf-clip    grad_clip 1.0
  zf-sg-clip stopgrad + clip + eps 0.1

Usage: python scripts/diag_zf_16qam.py [epochs]  (CPU; chip may stay busy)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.models.equalizers import EqSpec
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
from dl_ofdm_tpu.train.loop import Trainer

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30

cfg = OFDMConfig(nbits=4)
tc0 = TrainConfig(snr=20.0, batch_size=512, max_epoch_num=EPOCHS,
                  early_stop=10**9, token="diag", save_dir="/tmp")
base = Trainer(cfg, tc0, channel="AWGN")
bstate = ckpt.restore(os.path.join(RUNS, "OFDM_Dense3_4mod_snr20_cpTrue"),
                      base.init_state(jax.random.PRNGKey(0)))
print("base 16QAM AWGN model restored", flush=True)

VARIANTS = {
    "phase":      (EqSpec(), {}),
    "zf":         (EqSpec(eq_div="zf"), {}),
    "zf-e1":      (EqSpec(eq_div="zf", zf_eps=0.1), {}),
    "zf-sg":      (EqSpec(eq_div="zf", zf_stopgrad_denom=True), {}),
    "zf-clip":    (EqSpec(eq_div="zf"), {"grad_clip": 1.0}),
    "zf-sg-clip": (EqSpec(eq_div="zf", zf_eps=0.1, zf_stopgrad_denom=True),
                   {"grad_clip": 1.0}),
}

trainers, states, keys = {}, {}, {}
for name, (spec, tck) in VARIANTS.items():
    tc = TrainConfig(snr=20.0, batch_size=512, max_epoch_num=EPOCHS,
                     early_stop=10**9, token="diag", save_dir="/tmp", **tck)
    tr = EqualizerTrainer(cfg, tc, channel="mixRayleigh",
                          pretrained_rx=bstate.params, eq_spec=spec)
    trainers[name] = tr
    states[name] = tr.init_state(jax.random.PRNGKey(1))
    keys[name] = jax.random.PRNGKey(7)

steps_per_epoch = max(1, tc0.frames_per_epoch(7) // trainers["phase"].batch_frames)
eval_snr = jnp.full((2048,), 28.0, jnp.float32)

for epoch in range(EPOCHS):
    t0 = time.time()
    row = [f"ep{epoch:3d}"]
    for name, tr in trainers.items():   # interleaved for fairness
        ces = []
        for _ in range(steps_per_epoch):
            keys[name], k = jax.random.split(keys[name])
            states[name], aux = tr.train_step_curriculum(states[name], k)
            ces.append(float(aux["ce"]))
        row.append(f"{name}:ce={np.mean(ces):.3f}")
    print(" ".join(row) + f"  ({time.time()-t0:.0f}s)", flush=True)
    if (epoch + 1) % 5 == 0:
        er = [f"  eval@28dB"]
        for name, tr in trainers.items():
            val = tr.eval_step(states[name].params, jax.random.PRNGKey(123),
                               2048, eval_snr)
            er.append(f"{name}:ber={float(val['ber']):.4f}")
        print(" ".join(er), flush=True)
print("DIAG DONE")
