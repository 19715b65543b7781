"""Phase-7 gap fill: complete the short-CP classical set and the mobile
classical baselines for EPA/Flat (pairing the DCCN mobile curves)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_experiments3 import classical, log

if __name__ == "__main__":
    for eq_idx in (1, 2, 10):
        classical("EVA", eq_idx, longcp=False)
    for chan in ("EPA", "Flat"):
        for eq_idx in (1, 2, 4, 10):
            classical(chan, eq_idx, mobile=True)
    log("PHASE7 DONE")
