"""Production-scale throughput: train-step IQ/s at large LTE grids.

The reference only ever runs nfft=64; the LTE table goes to nfft=2048
(30.72 Msps / 100 RB), where the learned-DFT GEMMs become MXU-sized.
Measures the full training pipeline at nfft in {64, 256, 1024, 2048}.

Run on the TPU: python scripts/big_config_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.train.loop import Trainer


def main():
    for nfft, frames in ((64, 1170), (256, 512), (1024, 128), (2048, 64)):
        cfg = OFDMConfig(nbits=1, nfft=nfft, nfilter=nfft)
        tc = TrainConfig(batch_size=frames * 7)
        tr = Trainer(cfg, tc, channel="ETU")
        key = jax.random.PRNGKey(0)
        state = tr.init_state(key)
        snr = jnp.full((tr.batch_frames,), 5.0, jnp.float32)
        state, _ = tr.train_step(state, key, snr)
        # warm the tiny key-split program too: its first-use compile (~1s)
        # otherwise lands inside the first timed window and dominates it
        key, k = jax.random.split(key)
        state, _ = tr.train_step(state, k, snr)
        jax.block_until_ready(state.params)
        iters = 20
        dt = float("inf")   # min-of-3: the tunneled device's timing is noisy
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                key, k = jax.random.split(key)
                state, _ = tr.train_step(state, k, snr)
            jax.block_until_ready(state.params)
            dt = min(dt, (time.perf_counter() - t0) / iters)
        iq = tr.batch_frames * tr.plan.samples_per_frame
        print(f"nfft={nfft:5d} frames={tr.batch_frames:5d} "
              f"({tr.plan.samples_per_frame} IQ/frame): "
              f"{dt*1e3:8.2f} ms/step -> {iq/dt:.3e} IQ/s", flush=True)


if __name__ == "__main__":
    main()
