"""Quantify deviation #7: symbol-averaged vs per-sample mobile filtering
(round-5 VERDICT #5).

The MATLAB harness applies per-sample time-varying tap gains
(`filter(rayleighchan, x)`, `dev/m/OFDM_Benchmark_dev.m:277-311`); the
classical-bar sweeps used the symbol-averaged FIR kernel (PARITY deviation
#7).  `MatlabLink(per_sample=True)` now implements the MATLAB semantics
exactly (oracle-tested); this script measures the BER delta between the two
filtering modes for the mobile claim-bar estimator (LS-Spline) across the
claim channels at their MATLAB Doppler rates, plus an ETU Fd=300 stress
case (the reference Python Fd, where intra-symbol variation is largest).

Writes runs/p19_mobile_per_sample.json (resumable per cell).
Usage: python scripts/mobile_per_sample_delta.py    (chip must be free)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
OUT = os.path.join(RUNS, "p19_mobile_per_sample.json")

SNRS = (10.0, 20.0, 30.0)
FRAMES = 60000
# (channel, fd override or None=MATLAB table, modulation order)
CELLS = [("etu", None, 2), ("etu", None, 16),
         ("epa", None, 2), ("epa", None, 16),
         ("eva", None, 2), ("eva", None, 16),
         ("etu", 300.0, 2), ("etu", 300.0, 16)]


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def cell(channel, fd, m, per_sample):
    import jax

    from dl_ofdm_tpu.baselines import estimators as E
    from dl_ofdm_tpu.baselines.classical_rx import get_context, run_point
    from dl_ofdm_tpu.baselines.matlab_link import MatlabLink
    from dl_ofdm_tpu.config import OFDMConfig
    from dl_ofdm_tpu.ofdm.plan import build_plan

    plan = build_plan(OFDMConfig())
    ctx = get_context(plan, channel)
    link = MatlabLink(plan, m, channel, mobile=True, per_sample=per_sample)
    if fd is not None:
        link.fd = float(fd)
    beta = E.BETAS[m]
    out = {}
    for snr in SNRS:
        ber, _ = run_point(link, ctx, 2,      # eq 2 = LS-Spline (claim bar)
                           jax.random.fold_in(jax.random.PRNGKey(404),
                                              int(snr)),
                           float(snr), FRAMES, beta=beta)
        out[str(int(snr))] = float(ber)
    return out


def main():
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    report = json.load(open(OUT)) if os.path.isfile(OUT) else {
        "frames": FRAMES, "estimator": "LS-Spline", "cells": {}}
    for channel, fd, m in CELLS:
        tag = f"{channel}_fd{int(fd) if fd else 'matlab'}_M{m}"
        if tag in report["cells"]:
            log(f"skip {tag}")
            continue
        t0 = time.time()
        avg = cell(channel, fd, m, per_sample=False)
        ps = cell(channel, fd, m, per_sample=True)
        ratio = {k: (ps[k] / avg[k] if avg[k] > 0 else None) for k in avg}
        report["cells"][tag] = {
            "symbol_averaged": avg, "per_sample": ps,
            "ratio_per_sample_over_avg": ratio,
            "secs": round(time.time() - t0, 1)}
        log(f"{tag}: avg={avg} per_sample={ps} ratio={ratio}")
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    # summary: worst relative deviation across the MATLAB-rate cells
    worst = 1.0
    for tag, c in report["cells"].items():
        if "fdmatlab" not in tag:
            continue
        for k, r in c["ratio_per_sample_over_avg"].items():
            if r:
                worst = max(worst, max(r, 1.0 / r))
    report["summary"] = {
        "worst_matlab_rate_relative_delta": round(worst, 4),
        "note": ("bound on the effect of deviation #7 on the 12 mobile "
                 "claim cells (classical bars at MATLAB Doppler rates)")}
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    log(f"summary: {report['summary']}")


if __name__ == "__main__":
    main()
