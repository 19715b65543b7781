"""CI-quantified comparison for the two contested claim cells (VERDICT #2).

The EPA @30 dB cells are dominated by rare deep-fade channel realizations:
at 30k frames/point the DCCN estimate moves ~2x key-to-key, and even the
120k-frame canonical sweep vs a 30k probe differed 1.85x (round-4 qpsk_tail:
probe 1.57e-3, canonical 2.91e-3).  A single number cannot settle these
cells; this script measures BOTH sides at matched, honest frame counts:

  cell A  EPA QPSK  @30 (static): DCCN ZF arm vs ALMMSE and LS-Quadeer
  cell B  EPA BPSK  @30 (mobile): DCCN ZF mobile arm vs LS-Spline

DCCN side: 8 reps x 120k frames (960k frames/cell); classical side:
4 reps x 120k frames.  Reports mean / std / 95% t-CI per estimator and a
verdict: WIN (DCCN upper CI < classical lower CI), loss (reverse), or
PARITY-WITHIN-CI.  Writes runs/p15_claim_cell_ci.json.

Usage: python scripts/claim_cell_ci.py [A|B|all]   (chip must be free)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runs"))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def _ci(vals):
    import numpy as np
    v = np.asarray(vals, np.float64)
    n = len(v)
    m = float(v.mean())
    s = float(v.std(ddof=1)) if n > 1 else 0.0
    # t_{0.975, n-1} for small n
    ttab = {2: 12.71, 3: 4.30, 4: 3.18, 5: 2.78, 6: 2.57, 7: 2.45, 8: 2.36}
    t = ttab.get(n, 2.0)
    half = t * s / max(n, 1) ** 0.5
    return {"mean": m, "std": s, "lo95": m - half, "hi95": m + half,
            "n_reps": n, "per_rep": [round(float(x), 7) for x in v]}


def dccn_cell(nbits, mobile, reps=8, frames=120000, point_batch=True):
    import jax
    from run_experiments14 import BASE_EPOCHS, OPT
    from run_experiments8 import base_token, ensure_awgn_base
    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.train import checkpoint as ckpt
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

    snr = 5.0 * nbits
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, token=token, save_dir=RUNS,
                     opt=OPT)
    name = (f"{token}_Equalizer{OPT}_mixRayleigh"
            f"{'_mobile' if mobile else ''}")
    # the arm behind a '(ZF-tail)' claim cell lives ASIDE as `<name>_tail`
    # (gate-failed fresh rebuild, swept under the mixRayleighTail tag —
    # round-4 ADVICE #1 fix); prefer it when present so the CI adjudicates
    # the same arm the table shows
    if os.path.isdir(os.path.join(RUNS, name + "_tail")):
        name += "_tail"
    # restore with the TRAINING-time trainer config (joint arms were trained
    # freeze_rx=False -> plain optimizer; the masked default has a different
    # opt_state tree and the restore refuses the structure)
    eq_r = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=mobile,
                            pretrained_rx=base_params, freeze_rx=False)
    state = ckpt.restore(os.path.join(RUNS, name),
                         eq_r.init_state(jax.random.PRNGKey(0)))
    eq = EqualizerTrainer(cfg, tc, channel="EPA", mobile=mobile,
                          pretrained_rx=base_params)
    out = {20: [], 30: []}
    for rep in range(reps):
        # point_batch=True + batch 30000 = the reference protocol exactly
        # (one 30k-frame normalization window per SNR point,
        # `ofdmreceiver_np_mp.py:89`); the interleaved mode's small norm
        # groups inflate 30 dB BER ~2.4x (artificial ~29.6 dB ceiling at
        # 444-frame groups)
        res = ber_sweep(eq, state.params,
                        jax.random.fold_in(jax.random.PRNGKey(31337), rep),
                        snrs=(20, 30), frames_per_point=frames,
                        batch_frames=(30000 if point_batch else 4000),
                        log_fn=lambda *a: None, point_batch=point_batch)
        out[20].append(float(res.ber[0]))
        out[30].append(float(res.ber[1]))
        log(f"DCCN {name} rep {rep}: @20={res.ber[0]:.3e} "
            f"@30={res.ber[1]:.3e}")
    return {s: _ci(v) for s, v in out.items()}


def classical_cell(eq_idx, mod, mobile, reps=4, frames=120000):
    import jax
    from dl_ofdm_tpu.baselines import estimators as E
    from dl_ofdm_tpu.baselines.classical_rx import get_context, run_point
    from dl_ofdm_tpu.baselines.matlab_link import MatlabLink
    from dl_ofdm_tpu.config import OFDMConfig
    from dl_ofdm_tpu.ofdm.plan import build_plan

    plan = build_plan(OFDMConfig())
    ctx = get_context(plan, "EPA")
    link = MatlabLink(plan, mod, "EPA", mobile)
    beta = E.BETAS[mod]
    out = {20: [], 30: []}
    for rep in range(reps):
        for snr in (20, 30):
            ber, _ = run_point(
                link, ctx, eq_idx,
                jax.random.fold_in(jax.random.PRNGKey(1234 + snr), rep),
                float(snr), frames, beta=beta)
            out[snr].append(float(ber))
        log(f"classical {E.ESTIMATOR_NAMES[eq_idx]} M={mod} "
            f"mobile={mobile} rep {rep}: @20={out[20][-1]:.3e} "
            f"@30={out[30][-1]:.3e}")
    return {s: _ci(v) for s, v in out.items()}


def verdict(dccn, classical_best):
    if dccn["hi95"] < classical_best["lo95"]:
        return "WIN"
    if dccn["lo95"] > classical_best["hi95"]:
        return "loss"
    return "PARITY-WITHIN-CI"


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("cell", nargs="?", default="all",
                    choices=("A", "B", "all"))
    args = ap.parse_args()
    from dl_ofdm_tpu.baselines import estimators as E
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    out_path = os.path.join(RUNS, "p15_claim_cell_ci.json")
    report = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            report = json.load(f)
    name_to_idx = {v: k for k, v in E.ESTIMATOR_NAMES.items()}

    PROTO = "point_batch_30k"   # reference-parity normalization protocol

    def _num(cimap):
        # JSON round-trip stringifies the SNR keys
        return {int(k): v for k, v in cimap.items()} if cimap else None

    if args.cell in ("A", "all") and \
            report.get("EPA_QPSK_static", {}).get("protocol") != PROTO:
        old = report.get("EPA_QPSK_static", {})
        cell = {"protocol": PROTO,
                "dccn": dccn_cell(nbits=2, mobile=False)}
        if "dccn" in old:
            cell["dccn_interleaved_4k"] = old["dccn"]
        for est in ("ALMMSE", "LS-Quadeer"):
            # classical side has no batch normalization — reuse finished
            # measurements from a prior (pre-parity-protocol) pass
            cell[est] = _num(old.get(est)) or \
                classical_cell(name_to_idx[est], 4, False)
        best30 = min((cell[e][30] for e in ("ALMMSE", "LS-Quadeer")),
                     key=lambda c: c["mean"])
        cell["verdict30"] = verdict(cell["dccn"][30], best30)
        report["EPA_QPSK_static"] = _jsonable(cell)
        log(f"EPA QPSK @30: DCCN {cell['dccn'][30]['mean']:.3e} "
            f"[{cell['dccn'][30]['lo95']:.3e},{cell['dccn'][30]['hi95']:.3e}]"
            f" vs best classical {best30['mean']:.3e} -> {cell['verdict30']}")
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)

    if args.cell in ("B", "all") and \
            report.get("EPA_BPSK_mobile", {}).get("protocol") != PROTO:
        old = report.get("EPA_BPSK_mobile", {})
        cell = {"protocol": PROTO,
                "dccn": dccn_cell(nbits=1, mobile=True)}
        if "dccn" in old:
            cell["dccn_interleaved_4k"] = old["dccn"]
        cell["LS-Spline"] = _num(old.get("LS-Spline")) or \
            classical_cell(name_to_idx["LS-Spline"], 2, True)
        cell["verdict30"] = verdict(cell["dccn"][30], cell["LS-Spline"][30])
        report["EPA_BPSK_mobile"] = _jsonable(cell)
        log(f"EPA BPSK-mobile @30: DCCN {cell['dccn'][30]['mean']:.3e} "
            f"[{cell['dccn'][30]['lo95']:.3e},{cell['dccn'][30]['hi95']:.3e}]"
            f" vs LS-Spline {cell['LS-Spline'][30]['mean']:.3e} "
            f"-> {cell['verdict30']}")
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    log(f"wrote {out_path}")


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    return obj


if __name__ == "__main__":
    main()
