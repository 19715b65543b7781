"""Fine-grained synthesize-chain breakdown on the real chip (interleaved).

Locates the cost inside the on-device data plane (bits -> TX -> FIR -> AWGN
-> batch-norm) at the bench batch (9362 frames, ETU, BPSK) to size the
payoff of a fused Pallas synthesize kernel.

Usage: python scripts/synth_breakdown_bench.py  (chip must be free)
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dl_ofdm_tpu.channel.awgn import awgn_channel
from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames_iq
from dl_ofdm_tpu.ops.norms import batch_norm_ref
from dl_ofdm_tpu.train.loop import Trainer
from dl_ofdm_tpu.utils.timing import bench_steps, d2h_fence, measure_fence_cost


def main():
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=65534),
                 channel="ETU")
    b = tr.batch_frames
    snr = jnp.full((b,), 5.0, jnp.float32)
    plan = tr.plan
    shape_wf = (b, plan.nsymbol, plan.samples_per_symbol, 2)
    wf_fix = jax.random.normal(key, shape_wf, jnp.float32)

    def bits_of(k):
        return jnp.bitwise_and(
            jax.random.bits(k, (b, plan.frame_size, 1), jnp.uint8),
            jnp.uint8(1)).astype(jnp.int32)

    variants = {}

    @jax.jit
    def s_full(k):
        kb, kc, kn = jax.random.split(k, 3)
        wf = tr.tx(bits_of(kb))
        ch = tr.channel(kc, wf)
        y, npw = awgn_channel(kn, ch.y, snr)
        return batch_norm_ref(y)
    variants["full"] = s_full

    @jax.jit
    def s_nonoise(k):
        kb, kc, _ = jax.random.split(k, 3)
        wf = tr.tx(bits_of(kb))
        ch = tr.channel(kc, wf)
        return batch_norm_ref(ch.y)
    variants["no-awgn"] = s_nonoise

    @jax.jit
    def s_nobn(k):
        kb, kc, kn = jax.random.split(k, 3)
        wf = tr.tx(bits_of(kb))
        ch = tr.channel(kc, wf)
        y, npw = awgn_channel(kn, ch.y, snr)
        return y
    variants["no-bn"] = s_nobn

    @jax.jit
    def s_tx(k):
        return tr.tx(bits_of(k))
    variants["bits+tx"] = s_tx

    @jax.jit
    def s_bits(k):
        return bits_of(k)
    variants["bits"] = s_bits

    @jax.jit
    def s_chan(k):
        return tr.channel(k, wf_fix).y
    variants["fir-alone"] = s_chan

    @jax.jit
    def s_awgn(k):
        y, npw = awgn_channel(k, wf_fix, snr)
        return y
    variants["awgn-alone"] = s_awgn

    @jax.jit
    def s_bn(k):
        return batch_norm_ref(wf_fix)
    variants["bn-alone"] = s_bn

    @jax.jit
    def s_noise_f32(k):
        return jax.random.normal(k, shape_wf, jnp.float32)
    variants["normal-f32"] = s_noise_f32

    @jax.jit
    def s_noise_bf16(k):
        return jax.random.normal(k, shape_wf, jnp.bfloat16)
    variants["normal-bf16"] = s_noise_bf16

    for name, fn in variants.items():
        print(f"compiling {name}...", flush=True)
        d2h_fence(fn(key))

    best = {name: float("inf") for name in variants}
    for rnd in range(4):
        for name, fn in variants.items():
            t = bench_steps(lambda i, f=fn: f(jax.random.fold_in(key, i)),
                            iters=30, repeats=1, fence_cost=fence)
            best[name] = min(best[name], t)
        print(f"round {rnd} done", flush=True)

    print(f"\n== best (min over rounds), {b} frames ==")
    for name, t in best.items():
        print(f"{name:12s} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
