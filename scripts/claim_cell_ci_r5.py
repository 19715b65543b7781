"""CI adjudication for every thin-margin claim cell (round-5 VERDICT #3).

Round 4 CI'd only the two contested EPA @30 cells; the rest of the 21-cell
headline table had no variance statement, and several margins are < 2x.
This script:

  1. enumerates the claim-table cells exactly as make_results does (per-cell
     best across trained arms vs the classical bar);
  2. selects the cells whose margin (classical / learned) is < 2.0 at
     either gate SNR;
  3. for each selected cell whose winning arm exists as a COMMITTED archive
     (runs/arms/MANIFEST.json), measures DCCN reps x classical reps at
     matched frame counts and reports mean/95% t-CI + a verdict per SNR
     (WIN / PARITY-WITHIN-CI / loss);
  4. reports `no_committed_arm` for thin cells whose winning arm was lost
     to the round-4 checkpoint cleanup (those keep their single-sweep
     numbers, flagged as such).

Writes runs/p19_claim_cell_ci.json (resumable per cell).
Usage: python scripts/claim_cell_ci_r5.py [--reps 4] [--frames 60000]
"""
import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runs"))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
ARMS = os.path.join(RUNS, "arms")
OUT = os.path.join(RUNS, "p19_claim_cell_ci.json")

GATE_PTS = (20, 30)
MODN = {1: "BPSK", 2: "QPSK", 3: "8QAM", 4: "16QAM"}


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def _ci(vals):
    import numpy as np
    v = np.asarray(vals, np.float64)
    n = len(v)
    m = float(v.mean())
    s = float(v.std(ddof=1)) if n > 1 else 0.0
    ttab = {2: 12.71, 3: 4.30, 4: 3.18, 5: 2.78, 6: 2.57, 7: 2.45, 8: 2.36}
    t = ttab.get(n, 2.0)
    half = t * s / max(n, 1) ** 0.5
    return {"mean": m, "std": s, "lo95": m - half, "hi95": m + half,
            "n_reps": n, "per_rep": [round(float(x), 7) for x in v]}


def enumerate_cells():
    """(cfg_label, chan, nbits, mobile, winning-arm info, learned, bar)
    for every claim cell, using the same CSV selection as make_results."""
    import numpy as np

    def dccn(path):
        r = np.genfromtxt(path, delimiter=",", names=True)
        s = list(r["SNR"])
        return {p: float(r["BER"][s.index(p)]) for p in (20.0, 30.0)
                if p in s}

    def classical(path, row):
        a = np.genfromtxt(path, delimiter=",")
        s = list(a[0])
        return {p: float(a[row][s.index(p)]) for p in (20.0, 30.0)}

    cells = []
    arm_specs = [(12, "mixRayleigh", "ZF"), (0, "mixRayleigh", "opt0"),
                 (12, "mixRayleighTail", "ZF-tail")]
    tok = {1: "1mod_snr5", 2: "2mod_snr10", 3: "3mod_snr15", 4: "4mod_snr20"}
    for chan in ("EPA", "EVA", "ETU"):
        for mobile in (False, True):
            for n in (1, 2, 3, 4):
                if not mobile and n == 1:
                    continue
                suffix = "_mobile" if mobile else ""
                # classical bar
                ests = ("LS-Spline",) if mobile else ("ALMMSE", "LS-Quadeer")
                row = n
                bar = None
                for est in ests:
                    allmod = "" if (mobile and n == 1) else "_allmod"
                    p = os.path.join(
                        RUNS, f"BER_OFDM_{chan}_{est}_lte_64_Gray"
                              f"{suffix}{allmod}.csv")
                    if not os.path.isfile(p):
                        continue
                    c = classical(p, row if not (mobile and n == 1) else 1)
                    bar = (c if bar is None else
                           {k: min(bar[k], c[k]) for k in c})
                if bar is None:
                    continue
                # learned per-cell best across arms
                best = {}
                for opt, mix, lab in arm_specs:
                    p = os.path.join(
                        RUNS, f"Test_DCCN_OFDM_Dense3_{tok[n]}_cpTrue"
                              f"_Equalizer{opt}_{mix}_test_chan_"
                              f"{chan}{suffix}.csv")
                    if not os.path.isfile(p):
                        continue
                    d = dccn(p)
                    for pt, v in d.items():
                        if pt not in best or v < best[pt][0]:
                            best[pt] = (v, opt, mix, lab)
                if len(best) < 2:
                    continue
                cells.append({"cfg": f"{chan} {MODN[n]}"
                                     + (" mobile" if mobile else ""),
                              "chan": chan, "nbits": n, "mobile": mobile,
                              "learned": {str(int(k)): best[k]
                                          for k in best},
                              "bar": {str(int(k)): bar[k] for k in bar}})
    return cells


def arm_available(nbits, mobile, opt, mix):
    """Committed-archive name for the winning arm, or None if lost."""
    manifest = json.load(open(os.path.join(ARMS, "MANIFEST.json")))
    for name, info in manifest.items():
        if (info.get("kind") == "equalizer" and info["nbits"] == nbits
                and info["mobile"] == mobile and info["opt"] == opt
                and info.get("sweep_tag") == mix):
            return name
    return None


def dccn_reps(name, nbits, mobile, chan, reps, frames):
    import jax

    from run_experiments8 import base_token
    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.train.checkpoint import load_params_npz
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    base_params = load_params_npz(os.path.join(ARMS, token + ".npz"))
    params = load_params_npz(os.path.join(ARMS, name + ".npz"))
    manifest = json.load(open(os.path.join(ARMS, "MANIFEST.json")))
    opt = manifest[name]["opt"]
    cfg = OFDMConfig(nbits=nbits)
    tc = TrainConfig(snr=snr, batch_size=512, token=token, save_dir=RUNS,
                     opt=opt)
    eq = EqualizerTrainer(cfg, tc, channel=chan, mobile=mobile,
                          pretrained_rx=base_params)
    out = {20: [], 30: []}
    for rep in range(reps):
        res = ber_sweep(eq, params,
                        jax.random.fold_in(jax.random.PRNGKey(55555), rep),
                        snrs=(20, 30), frames_per_point=frames,
                        batch_frames=min(frames, 30000),
                        log_fn=lambda *a: None, point_batch=True)
        out[20].append(float(res.ber[0]))
        out[30].append(float(res.ber[1]))
        log(f"  DCCN {name} {chan} rep {rep}: @20={res.ber[0]:.3e} "
            f"@30={res.ber[1]:.3e}")
    return {s: _ci(v) for s, v in out.items()}


def classical_reps(chan, nbits, mobile, reps, frames):
    import jax

    from dl_ofdm_tpu.baselines import estimators as E
    from dl_ofdm_tpu.baselines.classical_rx import get_context, run_point
    from dl_ofdm_tpu.baselines.matlab_link import MatlabLink
    from dl_ofdm_tpu.config import OFDMConfig
    from dl_ofdm_tpu.ofdm.plan import build_plan

    plan = build_plan(OFDMConfig())
    ctx = get_context(plan, chan)
    m = 2 ** nbits
    link = MatlabLink(plan, m, chan, mobile)
    ests = ((2,) if mobile else
            tuple(k for k, v in E.ESTIMATOR_NAMES.items()
                  if v in ("ALMMSE", "LS-Quadeer")))
    beta = E.BETAS[m]
    best = None
    for eq_idx in ests:
        out = {20: [], 30: []}
        for rep in range(reps):
            for snr in (20, 30):
                ber, _ = run_point(
                    link, ctx, eq_idx,
                    jax.random.fold_in(jax.random.PRNGKey(777 + snr), rep),
                    float(snr), frames, beta=beta)
                out[snr].append(float(ber))
            log(f"  classical {E.ESTIMATOR_NAMES[eq_idx]} {chan} M={m} "
                f"rep {rep}: @20={out[20][-1]:.3e} @30={out[30][-1]:.3e}")
        ci = {s: _ci(v) for s, v in out.items()}
        if best is None or ci[30]["mean"] < best[30]["mean"]:
            best = ci
    return best


def verdict(dccn, cls):
    if dccn["hi95"] < cls["lo95"]:
        return "WIN"
    if dccn["lo95"] > cls["hi95"]:
        return "loss"
    return "PARITY-WITHIN-CI"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=60000)
    ap.add_argument("--margin", type=float, default=2.0)
    args = ap.parse_args()
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    report = json.load(open(OUT)) if os.path.isfile(OUT) else {
        "reps": args.reps, "frames": args.frames, "cells": {}}
    cells = enumerate_cells()
    thin = []
    for c in cells:
        margins = {pt: c["bar"][pt] / c["learned"][pt][0]
                   for pt in c["bar"] if pt in c["learned"]}
        if min(margins.values()) < args.margin:
            c["margins"] = {k: round(v, 3) for k, v in margins.items()}
            thin.append(c)
    log(f"{len(thin)}/{len(cells)} claim cells have margin < {args.margin}x:"
        f" {[c['cfg'] for c in thin]}")
    report["thin_cells"] = [c["cfg"] for c in thin]
    # persist the refreshed thin set immediately: on a rerun where every
    # cell is already adjudicated (e.g. after a rebuilt arm widens the
    # QPSK-mobile margins) the loop below writes nothing
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)

    # already-adjudicated round-4 cells keep their deeper 120k study
    r4 = json.load(open(os.path.join(RUNS, "p15_claim_cell_ci.json"))) \
        if os.path.isfile(os.path.join(RUNS, "p15_claim_cell_ci.json")) \
        else {}
    DONE_R4 = {"EPA QPSK": "EPA_QPSK_static", "EPA BPSK mobile":
               "EPA_BPSK_mobile"}

    for c in thin:
        tag = c["cfg"].replace(" ", "_")
        if tag in report["cells"]:
            log(f"skip {tag}")
            continue
        if c["cfg"] in DONE_R4 and DONE_R4[c["cfg"]] in r4:
            report["cells"][tag] = {"see": "p15_claim_cell_ci.json",
                                    "verdict30":
                                        r4[DONE_R4[c["cfg"]]]["verdict30"]}
            continue
        # the arm winning the thinner cell
        pt_thin = min(c["margins"], key=lambda k: c["margins"][k])
        _, opt, mix, lab = c["learned"][pt_thin]
        name = arm_available(c["nbits"], c["mobile"], opt, mix)
        if name is None:
            report["cells"][tag] = {
                "no_committed_arm": True, "winning_arm": f"opt{opt} {mix}",
                "margins": c["margins"],
                "note": "winning arm lost to the round-4 checkpoint "
                        "cleanup; single-sweep numbers stand, flagged"}
            log(f"{tag}: winning arm (opt{opt} {mix}) not committed — "
                f"flagged")
            with open(OUT, "w") as f:
                json.dump(report, f, indent=1)
            continue
        t0 = time.time()
        d = dccn_reps(name, c["nbits"], c["mobile"], c["chan"],
                      args.reps, args.frames)
        cl = classical_reps(c["chan"], c["nbits"], c["mobile"],
                            max(args.reps - 1, 2), args.frames)
        cell = {"arm": name, "margins": c["margins"],
                "dccn": {str(k): v for k, v in d.items()},
                "classical_best": {str(k): v for k, v in cl.items()},
                "verdict20": verdict(d[20], cl[20]),
                "verdict30": verdict(d[30], cl[30]),
                "secs": round(time.time() - t0, 1)}
        report["cells"][tag] = cell
        log(f"{tag}: @20 {cell['verdict20']} @30 {cell['verdict30']}")
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    log("claim_cell_ci_r5 complete")


if __name__ == "__main__":
    main()
