"""Phase-9: complete the classical-baseline grid to the reference's full
`script_rayleigh` extent (`dev/m/script_rayleigh.m:46-61`):

    channels {Flat, EVA, EPA, ETU, AWGN, Custom}
  x longcp   {True, False}
  x eq_idx   {1 Perfect, 2 LS-Spline, 4 LMMSE, 5 LS-Quadeer,
              7 ALMMSE, 10 LMMSE-Fast}

Earlier phases produced the EVA/ETU static set, the EVA short-CP subset and
the mobile families; this fills the remaining (channel, cp, estimator)
cells. Resume-by-CSV (skip-if-exists) as in all phases. AWGN rows sweep all
four modulations per the MATLAB harness (`OFDM_Benchmark_dev.m:117-124`).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments3 import classical, log

EST_GRID = (1, 2, 4, 5, 7, 10)

if __name__ == "__main__":
    # finish the EVA short-CP column
    for eq_idx in (5, 7):
        classical("EVA", eq_idx, longcp=False)
    # remaining static (long-CP) channels
    for chan in ("Flat", "EPA", "Custom"):
        for eq_idx in EST_GRID:
            classical(chan, eq_idx)
    # remaining short-CP channels
    for chan in ("ETU", "Flat", "EPA", "Custom"):
        for eq_idx in EST_GRID:
            classical(chan, eq_idx, longcp=False)
    # AWGN rows (all four modulations per estimator, MATLAB behavior)
    for longcp in (True, False):
        for eq_idx in EST_GRID:
            classical("AWGN", eq_idx, longcp=longcp)
    log("PHASE9 DONE")
