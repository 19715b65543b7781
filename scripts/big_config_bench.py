"""Production-scale throughput: train-step IQ/s at large LTE grids.

The reference only ever runs nfft=64; the LTE table goes to nfft=2048
(30.72 Msps / 100 RB), where the learned-DFT GEMMs become MXU-sized.
Measures the full training pipeline at nfft in {64, 256, 1024, 2048} with
honest d2h-fenced timing (utils/timing.py — the axon backend's
block_until_ready does not fence).

Run on the TPU: python scripts/big_config_bench.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.train.loop import Trainer
from dl_ofdm_tpu.utils.timing import bench_steps, measure_fence_cost


def main():
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)
    for nfft, frames in ((64, 9362), (256, 2048), (1024, 512), (2048, 256)):
        cfg = OFDMConfig(nbits=1, nfft=nfft, nfilter=nfft)
        tc = TrainConfig(batch_size=frames * 7)
        tr = Trainer(cfg, tc, channel="ETU")
        key = jax.random.PRNGKey(0)
        state = {"s": tr.init_state(key)}
        snr = jnp.full((tr.batch_frames,), 5.0, jnp.float32)

        def step(i):
            state["s"], _ = tr.train_step(
                state["s"], jax.random.fold_in(key, i), snr)
            return state["s"].params

        dt = bench_steps(step, iters=20, fence_cost=fence)
        iq = tr.batch_frames * tr.plan.samples_per_frame
        print(f"nfft={nfft:5d} frames={tr.batch_frames:5d} "
              f"({tr.plan.samples_per_frame} IQ/frame): "
              f"{dt*1e3:8.2f} ms/step -> {iq/dt:.3e} IQ/s", flush=True)


if __name__ == "__main__":
    main()
