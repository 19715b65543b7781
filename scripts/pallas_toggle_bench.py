"""A/B the fused Pallas complex-dense kernel against XLA's lowering on the
real chip, forward and train-step (honest d2h-fenced timing — see
utils/timing.py; the axon backend's block_until_ready does not fence).

Verdict baked into `complex_ops._default_use_pallas` (OFF): at nfft=64 the
XLA lowering is ~3.5x faster forward and ~25% faster per train step — the
four [B,80]x[80,F] GEMMs are too small for a hand kernel to beat XLA's
fusion, and the custom_vjp breaks backward fusion.

Usage: python scripts/pallas_toggle_bench.py  (chip must be free)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.models.dccn import DCCNReceiver
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ops import complex_ops
from dl_ofdm_tpu.train.loop import Trainer
from dl_ofdm_tpu.utils.timing import bench_steps, measure_fence_cost


def main():
    cfg = OFDMConfig(nbits=1)
    plan = build_plan(cfg)
    b = 4096
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(
        key, (b, plan.nsymbol, plan.samples_per_symbol, 2), jnp.float32)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    for use_pallas in (False, True):
        complex_ops.set_use_pallas(use_pallas)
        model = DCCNReceiver(nbits=cfg.nbits, nfft=cfg.nfft,
                             cp_len=plan.cp_len, nfilter=cfg.nfilter,
                             frame_size=plan.frame_size, keep_cp=cfg.cp)
        params = model.init(key, x[:2])["params"]

        @jax.jit
        def fwd(params, x):
            return model.apply({"params": params}, x)[0]

        t_fwd = bench_steps(lambda i: fwd(params, x), iters=40,
                            fence_cost=fence)

        tr = Trainer(cfg, TrainConfig(batch_size=16384), channel="ETU")
        st = tr.init_state(key)
        snr = jnp.full((tr.batch_frames,), 5.0, jnp.float32)
        state = {"s": st}

        def step(i):
            state["s"], _ = tr.train_step(
                state["s"], jax.random.fold_in(key, i), snr)
            return state["s"].params

        t_train = bench_steps(step, iters=30, fence_cost=fence)
        print(f"use_pallas={use_pallas}: fwd {t_fwd*1e3:.3f} ms/batch({b}), "
              f"train {t_train*1e3:.3f} ms/step({tr.batch_frames} frames)",
              flush=True)
    complex_ops.set_use_pallas(None)  # restore default


if __name__ == "__main__":
    main()
