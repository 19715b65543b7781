"""Phase-5: equalizer-variant ablation study (reference --opt registry).

The reference's second-stage ablations (`dev/py/ofdmreceiver_np_mp.py:293-312`)
compare equalizer architectures; phase 2 trained opt=0 (`equalizer_ofdm`,
complex-conv). This phase trains the main ablation points on mixRayleigh and
produces their cross-channel sweeps:

  opt=3  equalizer_dnnE       (all-dense; the reference flag default)
  opt=1  equalizer_nocconv    (dense replaces the complex convs)
  opt=7  equalizer_separateIQ (approximate split-IQ complex algebra)

Resumable per-opt by final CSV existence (same scheme as phase 2).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments import log, train_equalizer

if __name__ == "__main__":
    for opt in (3, 1, 7):
        train_equalizer(600, opt=opt)
    log("PHASE5 DONE")
