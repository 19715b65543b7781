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
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments3 import RUNS, classical, log

EST_GRID = (1, 2, 4, 5, 7, 10)


def awgn_grid(longcp: bool):
    """AWGN rows for all six estimator names.

    On AWGN the estimator is bypassed entirely
    (`classical_rx._build_point_fn`: `eq_grid = rx_freq`), so the six
    estimator CSVs are statistically identical — compute one (Perfect) and
    replicate the file for name parity instead of re-running five
    ~20-minute 4-modulation sweeps of the same program.
    """
    from dl_ofdm_tpu.baselines import estimators as E
    cp_str = "" if longcp else "_shortcp"
    classical("AWGN", 1, longcp=longcp)
    src = os.path.join(RUNS, f"BER_OFDM_AWGN_Perfect_lte_64_Gray{cp_str}.csv")
    if not os.path.isfile(src):
        return
    for eq_idx in EST_GRID[1:]:
        dst = os.path.join(
            RUNS,
            f"BER_OFDM_AWGN_{E.ESTIMATOR_NAMES[eq_idx]}_lte_64_Gray"
            f"{cp_str}.csv")
        if not os.path.isfile(dst):
            shutil.copyfile(src, dst)
            log(f"replicated {os.path.basename(src)} -> "
                f"{os.path.basename(dst)} (estimator bypassed on AWGN)")

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
    # AWGN rows (all four modulations, MATLAB behavior; see awgn_grid)
    for longcp in (True, False):
        awgn_grid(longcp)
    log("PHASE9 DONE")
