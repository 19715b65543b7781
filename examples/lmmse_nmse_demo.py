"""LS vs ideal-LMMSE vs fast-ALMMSE channel-estimation NMSE comparison.

Capability parity with `dev/m/script_fastLMMSE_OFDM_example.m` (M8): Monte
Carlo over Rayleigh realizations, comparing the normalized MSE of LS pilot
estimates, per-realization ideal LMMSE, and long-term fast LMMSE.

Run: python examples/lmmse_nmse_demo.py [--mc 1500]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.baselines import estimators as E
from dl_ofdm_tpu.baselines.classical_rx import get_context
from dl_ofdm_tpu.baselines.matlab_link import MatlabLink
from dl_ofdm_tpu.config import OFDMConfig
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ops import cfloat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=1500)
    ap.add_argument("--snr", type=float, default=10.0)
    ap.add_argument("--channel", default="eva")
    args = ap.parse_args()

    plan = build_plan(OFDMConfig())
    link = MatlabLink(plan, 2, args.channel)
    ctx = get_context(plan, args.channel)
    snr_lin = 10 ** (args.snr / 10.0)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    _, wave = link.transmit(k1, args.mc)
    ch = link.fade(k2, wave)
    y = link.awgn_measured(k3, ch.y, args.snr)
    rx_freq = link.rx_front(y)
    hhat = link.pilot_ls(rx_freq)

    def nmse(est):
        err = jnp.sum(cfloat.abs2_iq(est - ch.g))
        ref = jnp.sum(cfloat.abs2_iq(ch.g))
        return float(err / ref)

    g_ls, _ = E.estimate(2, ctx, rx_freq, hhat, ch.g, snr_lin, 1.0)
    g_lmmse, _ = E.estimate(4, ctx, rx_freq, hhat, ch.g, snr_lin, 1.0)
    w_fast = E.precompute_longterm_w(ch.g, 1.0, snr_lin)
    g_fast, _ = E.estimate(10, ctx, rx_freq, hhat, ch.g, snr_lin, 1.0,
                           w_prior=w_fast)

    print(f"MC={args.mc} channel={args.channel} SNR={args.snr} dB")
    print(f"  LS (spline)   NMSE: {nmse(g_ls):.4f}")
    print(f"  ideal LMMSE   NMSE: {nmse(g_lmmse):.4f}")
    print(f"  fast ALMMSE   NMSE: {nmse(g_fast):.4f}")


if __name__ == "__main__":
    main()
