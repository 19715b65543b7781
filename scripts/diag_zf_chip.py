"""On-chip A/B of 16QAM equalizer recipes (round-2 item 1).

The first opt-12 (zero-forcing) chip runs stalled (best CE 4.8 at epoch ~44,
never improved for 250 epochs) while opt 0 reaches CE ~2.3 — both far above
the 0.69 random floor, i.e. the frozen ultra-confident 16QAM head punishes
residual equalization error hard.  This sequentially trains five recipes at
nbits=4 on mixRayleigh (modulation-shifted curriculum) and reports train CE
plus eval BER@28 dB so the winner can be promoted to the phase-12 queue:

  phase        opt 0 (reference division, frozen rx)  — round-1 recipe
  zf-e1        ZF, eps 0.1, frozen rx
  zf-sg-clip   ZF, eps 0.1, stop-grad denominator, grad clip 1.0, frozen rx
  phase-joint  opt 0, receiver fine-tuned jointly (freeze_rx=False)
  zf-e1-joint  ZF eps 0.1, receiver fine-tuned jointly

Usage: python scripts/diag_zf_chip.py [epochs=400]  (chip must be FREE)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.models.equalizers import EqSpec
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.curriculum import sample_snr
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
from dl_ofdm_tpu.train.loop import Trainer

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 400


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


cfg = OFDMConfig(nbits=4)
tc0 = TrainConfig(snr=20.0, batch_size=512, max_epoch_num=EPOCHS,
                  early_stop=10**9, token="diag", save_dir="/tmp")
base = Trainer(cfg, tc0, channel="AWGN")
bstate = ckpt.restore(os.path.join(RUNS, "OFDM_Dense3_4mod_snr20_cpTrue"),
                      base.init_state(jax.random.PRNGKey(0)))
log("base 16QAM AWGN model restored")

ZF1 = EqSpec(eq_div="zf", zf_eps=0.1)
ZFS = EqSpec(eq_div="zf", zf_eps=0.1, zf_stopgrad_denom=True)
VARIANTS = {
    "phase":       (EqSpec(), {}, True),
    "zf-e1":       (ZF1, {}, True),
    "zf-sg-clip":  (ZFS, {"grad_clip": 1.0}, True),
    "phase-joint": (EqSpec(), {}, False),
    "zf-e1-joint": (ZF1, {}, False),
}

results = {}
for name, (spec, tck, freeze) in VARIANTS.items():
    tc = TrainConfig(snr=20.0, batch_size=512, max_epoch_num=EPOCHS,
                     early_stop=10**9, token="diag", save_dir="/tmp", **tck)
    tr = EqualizerTrainer(cfg, tc, channel="mixRayleigh",
                          pretrained_rx=bstate.params, eq_spec=spec,
                          freeze_rx=freeze)
    state = tr.init_state(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(7)
    steps = max(1, tc.frames_per_epoch(7) // tr.batch_frames)
    t0 = time.time()
    best_ber = 1.0
    for epoch in range(EPOCHS):
        ces = []
        for _ in range(steps):
            key, k = jax.random.split(key)
            state, aux = tr.train_step_curriculum(state, k)
            ces.append(aux["ce"])
        if (epoch + 1) % 25 == 0 or epoch == 0:
            val = tr.eval_step(state.params, jax.random.PRNGKey(123), 4096,
                               jnp.full((4096,), 28.0, jnp.float32))
            ber = float(val["ber"])
            best_ber = min(best_ber, ber)
            log(f"{name} ep{epoch:4d}: ce={float(jnp.mean(jnp.stack(ces))):.4f} "
                f"ber@28={ber:.5f}")
    results[name] = best_ber
    log(f"{name}: DONE best ber@28={best_ber:.5f} in {time.time()-t0:.0f}s")

log("SUMMARY " + "  ".join(f"{n}={b:.5f}" for n, b in results.items()))
