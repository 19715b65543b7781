"""Plot the Gray-coded constellations with bit labels.

Capability parity with `dev/m/script_QAM_constellation.m` (M9).
Run: python examples/plot_constellations.py [out.png]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_png="constellations.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dl_ofdm_tpu.ofdm.constellation import _table_np

    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    for ax, nbits in zip(axes, (1, 2, 3, 4)):
        pts = _table_np(nbits)
        ax.scatter(pts.real, pts.imag, s=40)
        for i, p in enumerate(pts):
            ax.annotate(f"{i:0{nbits}b}", (p.real, p.imag),
                        textcoords="offset points", xytext=(4, 4), fontsize=8)
        ax.set_title(["BPSK", "QPSK", "8QAM", "16QAM"][nbits - 1])
        ax.grid(alpha=0.3)
        ax.axhline(0, color="k", lw=0.5)
        ax.axvline(0, color="k", lw=0.5)
        ax.set_aspect("equal")
    fig.savefig(out_png, dpi=110, bbox_inches="tight")
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main(*sys.argv[1:])
