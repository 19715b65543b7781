"""Phase-16 queue (round 4): canonical sweeps under the reference-parity
normalization protocol.

Round-4 finding: the interleaved multi-SNR sweep normalizes rx power in
per-SNR groups of batch/n_snrs frames; the variance-estimate noise of a
~444-frame group acts as ~3.3% amplitude jitter — an artificial ~29.6 dB
BER ceiling — while the reference evaluates each point with ONE session.run
over all 30,000 frames (`dev/py/ofdmreceiver_np_mp.py:89`), i.e. noise-free
normalization.  Measured on EPA QPSK @30: 2.91e-3 (444-frame groups) vs
1.2e-3 (2000-frame groups) on the same params.  `ber_sweep(point_batch=True,
batch_frames=30000)` now reproduces the reference protocol exactly; this
queue re-sweeps the canonical opt-12 arms (the per-cell best arm in every
claim-table row) with it.

Steps: `resweep <nbits> <static|mobile>` — resumable by per-arm marker.
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments8 import RUNS, base_token, ensure_awgn_base, log
from dl_ofdm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from run_experiments14 import BASE_EPOCHS, OPT
from dl_ofdm_tpu.config import TrainConfig
from dl_ofdm_tpu.eval.sweep import cross_channel_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

# the two 30 dB claim cells get the 4x frame count (deep-fade variance)
BIG_EPA = {(2, False), (1, True)}


def resweep(nbits: int, mobile: bool):
    suffix = "_mobile" if mobile else ""
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p15d_resweep_{token}{suffix}.json")
    if os.path.isfile(marker):
        log(f"skip resweep {token}{suffix} (marker exists)")
        return
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, token=token, save_dir=RUNS,
                     opt=OPT)
    name = f"{token}_Equalizer{OPT}_mixRayleigh{suffix}"
    eq_r = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=mobile,
                            pretrained_rx=base_params, freeze_rx=False)
    state = ckpt.restore(os.path.join(RUNS, name),
                         eq_r.init_state(jax.random.PRNGKey(0)))

    def make_trainer(test_chan, mob):
        return EqualizerTrainer(cfg, tc, channel=test_chan, mobile=mob,
                                pretrained_rx=base_params)

    t0 = time.time()
    others = ("ETU", "EVA", "Flat", "Custom")
    cross_channel_sweep(make_trainer, state.params, jax.random.PRNGKey(888),
                        token, OPT, "mixRayleigh", mobile=mobile,
                        save_dir=RUNS, frames_per_point=30000,
                        batch_frames=30000, test_channels=others,
                        log_fn=lambda *a: None, point_batch=True)
    epa_frames = 120000 if (nbits, mobile) in BIG_EPA else 30000
    res = cross_channel_sweep(make_trainer, state.params,
                              jax.random.PRNGKey(889),
                              token, OPT, "mixRayleigh", mobile=mobile,
                              save_dir=RUNS, frames_per_point=epa_frames,
                              batch_frames=30000, test_channels=("EPA",),
                              log_fn=lambda *a: None, point_batch=True)
    epa = res["EPA"]
    cells = {int(s): float(b) for s, b in zip(epa.snr, epa.ber)}
    log(f"resweep {token}{suffix}: parity protocol done in "
        f"{time.time()-t0:.0f}s; EPA @20={cells.get(20):.3e} "
        f"@30={cells.get(30):.3e} (EPA frames={epa_frames})")
    with open(marker, "w") as fp:
        json.dump({"arm": name, "protocol": "point_batch_30k",
                   "epa_frames": epa_frames, "epa_ber": cells,
                   "secs": round(time.time() - t0, 1)}, fp, indent=1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "resweep":
        resweep(int(sys.argv[2]), sys.argv[3] == "mobile")
    else:
        print(__doc__)
        sys.exit(2)
