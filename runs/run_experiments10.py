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
     (unswept schema rows are NaN; MATLAB-parity files untouched).

All steps reuse the phase-3/8 helpers (skip-by-CSV before any training;
AWGN bases retrained on demand when the gitignored checkpoints are absent).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments3 import classical
from run_experiments8 import log, train_equalizer8

BASE_EPOCHS = {1: 300, 2: 400, 3: 500, 4: 600}

if __name__ == "__main__":
    # config #5: all-modulation transfer-learning curriculum (static)
    for nbits in (4, 2, 3):
        train_equalizer8(nbits=nbits, base_epochs=BASE_EPOCHS[nbits])
    # config #4: high-order QAM + mobility
    for nbits in (4, 3):
        train_equalizer8(nbits=nbits, base_epochs=BASE_EPOCHS[nbits],
                         mobile=True)
    # configs #3/#4: classical comparators at QPSK/8QAM/16QAM
    for mobile in (False, True):
        for chan in ("EPA", "ETU"):
            for eq_idx in (1, 4, 10):
                classical(chan, eq_idx, mobile=mobile,
                          mods=(4, 8, 16), tag="_allmod")
    log("PHASE10 DONE")
