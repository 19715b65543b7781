"""Aggregate result CSVs into plots + RESULTS.md.

Run after runs/run_experiments.py completes.
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RUNS = os.path.dirname(os.path.abspath(__file__))


def read_dccn_csv(path):
    rows = np.genfromtxt(path, delimiter=",", names=True)
    return rows["SNR"], rows["BER"]


def main():
    from dl_ofdm_tpu.eval.plots import closed_form_ber, plot_ber_curves

    lines = ["# RESULTS — round-1 generated curves\n"]

    # --- DCCN AWGN curves -------------------------------------------------
    curves = {}
    mod_names = {1: "BPSK", 2: "QPSK", 3: "8QAM", 4: "16QAM"}
    for nbits, name in mod_names.items():
        matches = glob.glob(os.path.join(
            RUNS, f"Test_DCCN_OFDM_Dense3_{nbits}mod_*_AWGN.csv"))
        if matches:
            snr, ber = read_dccn_csv(matches[0])
            curves[f"DCCN {name}"] = (snr, ber)
    if curves:
        png = os.path.join(RUNS, "dccn_awgn_ber.png")
        plot_ber_curves(curves, "DCCN over AWGN (learned receiver)", png)
        lines.append("## DCCN over AWGN\n")
        lines.append(f"![AWGN]({os.path.basename(png)})\n")
        lines.append("| modulation | BER@5dB | BER@10dB | BER@15dB | BER@20dB |")
        lines.append("|---|---|---|---|---|")
        for label, (snr, ber) in curves.items():
            cells = []
            for pt in (5, 10, 15, 20):
                i = list(snr).index(pt)
                cells.append(f"{ber[i]:.2e}")
            lines.append(f"| {label} | " + " | ".join(cells) + " |")
        lines.append("")

    # --- cross-channel equalizer curves -----------------------------------
    eq_curves = {}
    for path in glob.glob(os.path.join(RUNS, "Test_DCCN_*_Equalizer*_test_chan_*.csv")):
        chan = path.split("_test_chan_")[-1].replace(".csv", "")
        snr, ber = read_dccn_csv(path)
        eq_curves[f"DCCN-EQ on {chan}"] = (snr, ber)
    if eq_curves:
        png = os.path.join(RUNS, "dccn_eq_cross_channel.png")
        plot_ber_curves(eq_curves,
                        "DCCN + equalizer (mixRayleigh-trained), cross-channel",
                        png)
        lines.append("## Equalized DCCN across channels\n")
        lines.append(f"![cross]({os.path.basename(png)})\n")

    # --- classical baselines ----------------------------------------------
    for chan in ("EVA", "ETU"):
        cl_curves = {}
        for path in glob.glob(os.path.join(RUNS, f"BER_OFDM_{chan}_*.csv")):
            est = path.split(f"BER_OFDM_{chan}_")[-1].split("_lte")[0]
            arr = np.genfromtxt(path, delimiter=",")
            cl_curves[est] = (arr[0], arr[1])
        key = f"DCCN-EQ on {chan.upper()}" if f"DCCN-EQ on {chan.upper()}" in eq_curves else None
        for k in eq_curves:
            if chan.upper() in k.upper():
                cl_curves["DCCN-EQ (learned)"] = eq_curves[k]
        if cl_curves:
            png = os.path.join(RUNS, f"classical_vs_dccn_{chan}.png")
            plot_ber_curves(cl_curves, f"{chan}: classical estimators vs DCCN",
                            png)
            lines.append(f"## {chan}: classical vs learned\n")
            lines.append(f"![{chan}]({os.path.basename(png)})\n")

    out = os.path.join(RUNS, "RESULTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
