"""In-situ train-step cost breakdown on the real chip (interleaved A/B).

Co-resident executables on the tunneled device perturb step times ~2x
(runs/train_step_roofline.txt), so standalone stage timings are upper bounds
only.  This script compiles every variant FIRST, then rotates measurement
rounds across variants (bench_steps repeats=1 per round, min over rounds), so
each variant sees the same co-residency state.

Variants (ETU static fading, BPSK, 9362 frames/step):
  full-symbol  default step with the block-diagonal per-symbol TX operator
  full-dense   step with the dense [frame_size, S*sps] TX operator
  no-fir       channel replaced by passthrough (FIR + gt synthesis removed)
  no-synth     bits/rx_in precomputed: fwd+bwd+Adam only
  synth-only   synthesize chain alone (no model, no grads)

Usage: python scripts/step_breakdown_bench.py  (chip must be free)
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from dl_ofdm_tpu.channel.rayleigh import ChannelOut
from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames_iq
from dl_ofdm_tpu.train.loop import Trainer, TrainState
from dl_ofdm_tpu.utils.timing import bench_steps, measure_fence_cost


def make_trainer(tx_form):
    tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=65534),
                 channel="ETU")
    if tx_form is not None:
        tr.tx = partial(ofdm_modulate_frames_iq, plan=tr.plan, fused=tx_form)
    return tr


def main():
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    variants = {}

    # full steps: symbol vs dense TX
    for name, form in (("full-symbol", "symbol"), ("full-dense", "dense")):
        tr = make_trainer(form)
        st = tr.init_state(key)
        snr = jnp.full((tr.batch_frames,), 5.0, jnp.float32)
        state = {"s": st}

        def step(i, state=state, tr=tr, snr=snr):
            state["s"], _ = tr.train_step(
                state["s"], jax.random.fold_in(key, i), snr)
            return state["s"].params
        variants[name] = step

    # no-fir: channel passthrough
    tr_nf = make_trainer("symbol")
    b, s, nfft = tr_nf.batch_frames, tr_nf.plan.nsymbol, tr_nf.cfg.nfft

    def passthrough(k, wf, nfft=nfft):
        bb, ss = wf.shape[0], wf.shape[1]
        return ChannelOut(y=wf, h_freq=jnp.zeros((bb, ss, nfft, 2)))
    tr_nf.channel = passthrough
    st_nf = tr_nf.init_state(key)
    snr = jnp.full((b,), 5.0, jnp.float32)
    state_nf = {"s": st_nf}

    def step_nofir(i):
        state_nf["s"], _ = tr_nf.train_step(
            state_nf["s"], jax.random.fold_in(key, i), snr)
        return state_nf["s"].params
    variants["no-fir"] = step_nofir

    # no-synth: fixed data, fwd+bwd+update only
    tr0 = make_trainer("symbol")
    st0 = tr0.init_state(key)
    bits, rx_in, _, _, _ = jax.jit(
        lambda k: tr0.synthesize(k, tr0.batch_frames, snr))(key)
    bits = jax.block_until_ready(bits)

    @jax.jit
    def data_step(state, bits, rx_in):
        (loss, aux), grads = jax.value_and_grad(
            tr0._loss_fn, has_aux=True)(state.params, bits, rx_in)
        updates, opt_state = tr0.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1)

    state0 = {"s": st0}

    def step_nosynth(i):
        state0["s"] = data_step(state0["s"], bits, rx_in)
        return state0["s"].params
    variants["no-synth"] = step_nosynth

    # synth-only
    tr_s = make_trainer("symbol")

    @jax.jit
    def synth(k):
        bits, rx_in, _, npwr, _ = tr_s.synthesize(k, tr_s.batch_frames, snr)
        return rx_in, npwr

    def step_synth(i):
        return synth(jax.random.fold_in(key, i))
    variants["synth-only"] = step_synth

    # compile everything first
    for name, fn in variants.items():
        print(f"compiling {name}...", flush=True)
        from dl_ofdm_tpu.utils.timing import d2h_fence
        d2h_fence(fn(0))

    # interleaved measurement rounds
    best = {name: float("inf") for name in variants}
    for rnd in range(4):
        for name, fn in variants.items():
            t = bench_steps(fn, iters=30, repeats=1, fence_cost=fence)
            best[name] = min(best[name], t)
        print(f"round {rnd}: " + "  ".join(
            f"{n}={best[n]*1e3:.3f}ms" for n in variants), flush=True)

    iq = 9362 * 7 * 80
    print("\n== best (min over rounds), 9362 frames/step ==")
    for name, t in best.items():
        print(f"{name:12s} {t*1e3:7.3f} ms/step   {iq/t/1e9:6.2f} G IQ/s")
    print(f"\nTX in situ (dense - symbol): "
          f"{(best['full-dense']-best['full-symbol'])*1e3:+.3f} ms")
    print(f"FIR+gt in situ (full - nofir): "
          f"{(best['full-symbol']-best['no-fir'])*1e3:+.3f} ms")
    print(f"synth in situ (full - nosynth): "
          f"{(best['full-symbol']-best['no-synth'])*1e3:+.3f} ms")


if __name__ == "__main__":
    main()
