"""Regenerate every headline claim-table cell from the COMMITTED arm
archives (`runs/arms/*.npz`) with zero training — round-5 VERDICT #2.

For each equalizer arm in `runs/arms/MANIFEST.json`, loads its params
(`checkpoint.load_params_npz`), rebuilds the evaluation trainers, and
re-sweeps the claim-gate cells (EPA/EVA/ETU x {20,30} dB) under the
reference-parity protocol (`ber_sweep(point_batch=True, batch_frames=30000)`
— one normalization window per point, `dev/py/ofdmreceiver_np_mp.py:89`).
Then recomputes the headline verdict per claim cell as the per-cell best
across COMMITTED arms vs the classical bar (ALMMSE/LS-Quadeer static,
LS-Spline mobile — `dev/m/script_rayleigh.m:56`), and reports which cells
are additionally covered only by canonical CSVs of arms lost to the round-4
checkpoint cleanup (the manifest documents those).

Usage:  python runs/resweep_claims.py [--frames N] [--arm NAME]
Writes: runs/p19_resweep_claims.json (resumable per-arm by marker content)
Chip must be free.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.dirname(os.path.abspath(__file__))
ARMS = os.path.join(RUNS, "arms")
OUT = os.path.join(RUNS, "p19_resweep_claims.json")

GATE_CHANS = ("EPA", "EVA", "ETU")
GATE_PTS = (20, 30)
MODN = {1: "BPSK", 2: "QPSK", 3: "8QAM", 4: "16QAM"}


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def classical_bar(chan, nbits, mobile):
    """Best classical BER at each gate point for the claim config (same
    files/rows make_results.py uses)."""
    import numpy as np
    ests = ("LS-Spline",) if mobile else ("ALMMSE", "LS-Quadeer")
    row = {1: 1, 2: 2, 3: 3, 4: 4}[nbits]
    suffix = "_mobile" if mobile else ""
    out = {}
    for pt in GATE_PTS:
        best = None
        for est in ests:
            allmod = "" if (mobile and nbits == 1) else "_allmod"
            p = os.path.join(
                RUNS, f"BER_OFDM_{chan}_{est}_lte_64_Gray{suffix}{allmod}.csv")
            if not os.path.isfile(p):
                continue
            arr = np.genfromtxt(p, delimiter=",")
            snrs = list(arr[0])
            v = float(arr[row][snrs.index(pt)])
            best = v if best is None else min(best, v)
        out[pt] = best
    return out


def sweep_arm(name, info, frames):
    """Re-sweep one committed arm's gate cells from its npz params."""
    import jax

    from run_experiments8 import base_token
    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.train.checkpoint import load_params_npz
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

    nbits, mobile, opt = info["nbits"], info["mobile"], info["opt"]
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    base_npz = os.path.join(ARMS, token + ".npz")
    base_params = load_params_npz(base_npz)
    params = load_params_npz(os.path.join(ARMS, name + ".npz"))
    cfg = OFDMConfig(nbits=nbits)
    tc = TrainConfig(snr=snr, batch_size=512, token=token, save_dir=RUNS,
                     opt=opt)
    cells = {}
    for chan in GATE_CHANS:
        eq = EqualizerTrainer(cfg, tc, channel=chan, mobile=mobile,
                              pretrained_rx=base_params)
        res = ber_sweep(eq, params, jax.random.PRNGKey(1919),
                        snrs=GATE_PTS, frames_per_point=frames,
                        batch_frames=min(frames, 30000),
                        log_fn=lambda *a: None, point_batch=True)
        cells[chan] = {int(s): float(b) for s, b in zip(res.snr, res.ber)}
        log(f"  {name} {chan}: {cells[chan]}")
    return cells


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--frames", type=int, default=30000,
                    help="frames per point (reference cross-channel "
                         "protocol: 30000)")
    ap.add_argument("--arm", default=None, help="only this arm")
    args = ap.parse_args()

    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    manifest = json.load(open(os.path.join(ARMS, "MANIFEST.json")))
    report = json.load(open(OUT)) if os.path.isfile(OUT) else {
        "frames": args.frames, "protocol": "point_batch_30k", "arms": {}}

    eq_arms = {k: v for k, v in manifest.items()
               if v["kind"] == "equalizer" and
               (args.arm is None or k == args.arm)}
    for name, info in sorted(eq_arms.items()):
        if name in report["arms"]:
            log(f"skip {name} (already swept)")
            continue
        t0 = time.time()
        log(f"sweep {name} (tag {info['sweep_tag']})")
        cells = sweep_arm(name, info, args.frames)
        report["arms"][name] = {
            "sweep_tag": info["sweep_tag"], "nbits": info["nbits"],
            "mobile": info["mobile"], "cells": cells,
            "secs": round(time.time() - t0, 1)}
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)

    # headline verdicts from committed arms only
    table = []
    for chan in GATE_CHANS:
        for nbits in (1, 2, 3, 4):
            for mobile in (False, True):
                if not mobile and nbits == 1:
                    continue   # BPSK static is not a claim-table row
                arms = [a for a in report["arms"].values()
                        if a["nbits"] == nbits and a["mobile"] == mobile]
                if not arms:
                    continue
                bar = classical_bar(chan, nbits, mobile)
                if bar.get(20) is None:
                    continue
                best = {pt: min(a["cells"][chan][str(pt)]
                                if str(pt) in a["cells"][chan]
                                else a["cells"][chan][pt] for a in arms)
                        for pt in GATE_PTS}
                win = all(best[pt] <= bar[pt] * 1.05 for pt in GATE_PTS)
                table.append({
                    "cfg": f"{chan} {MODN[nbits]}"
                           + (" mobile" if mobile else ""),
                    "committed_best": best, "classical_bar": bar,
                    "verdict": "WIN" if win else "loss"})
    report["headline_from_committed_arms"] = table
    wins = sum(1 for r in table if r["verdict"] == "WIN")
    report["summary"] = f"{wins}/{len(table)} cells WIN from committed arms"
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    log(report["summary"])
    for r in table:
        log(f"  {r['cfg']}: committed {r['committed_best']} vs bar "
            f"{r['classical_bar']} -> {r['verdict']}")


if __name__ == "__main__":
    main()
