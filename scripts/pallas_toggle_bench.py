"""A/B the fused Pallas complex-dense kernel against XLA's lowering on the
real chip, forward and train-step. Decides whether `set_use_pallas(True)`
should be the TPU default (run only when the chip is free).

Usage: python scripts/pallas_toggle_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.models.dccn import DCCNReceiver
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ops import complex_ops
from dl_ofdm_tpu.train.loop import Trainer


def timeit(fn, iters=50):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = OFDMConfig(nbits=1)
    plan = build_plan(cfg)
    b = 4096
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(
        key, (b, plan.nsymbol, plan.samples_per_symbol, 2), jnp.float32)

    for use_pallas in (False, True):
        complex_ops.set_use_pallas(use_pallas)
        model = DCCNReceiver(nbits=cfg.nbits, nfft=cfg.nfft,
                             cp_len=plan.cp_len, nfilter=cfg.nfilter,
                             frame_size=plan.frame_size, keep_cp=cfg.cp)
        params = model.init(key, x[:2])["params"]

        @jax.jit
        def fwd(params, x):
            return model.apply({"params": params}, x)[0]

        t_fwd = timeit(lambda: fwd(params, x))

        tr = Trainer(cfg, TrainConfig(batch_size=2048), channel="ETU")
        st = tr.init_state(key)
        snr = jnp.full((tr.batch_frames,), 5.0, jnp.float32)

        def step():
            nonlocal st
            st, _ = tr.train_step(st, key, snr)
            return st.step

        t_train = timeit(step, 20)
        print(f"use_pallas={use_pallas}: fwd {t_fwd*1e3:.3f} ms/batch({b}), "
              f"train {t_train*1e3:.3f} ms/step({tr.batch_frames} frames)",
              flush=True)
    complex_ops.set_use_pallas(None)  # restore auto default


if __name__ == "__main__":
    main()
