"""Attribute the >9.4k-frame throughput cliff (round-2 VERDICT item 7).

BENCH_r01 / runs/train_step_roofline.txt: the end-to-end train step scales
sublinearly up to 9362 frames (3.1 ms) then exactly linearly (18724 frames ->
6.2 ms, zero marginal throughput).  This probe measures, per batch size, the
d2h-fenced cost of

  full    the bench train step (fused synth + fwd + bwd + Adam)
  synth   fused_synthesize alone
  model   fwd + bwd + Adam on fixed data (no synthesis)

interleaved across rounds (co-resident executables perturb the tunneled
device ~2x; runs/train_step_roofline.txt), so the per-variant minima are
comparable.  Whichever component's ms/frame stops improving first is the
cliff owner.  With --trace, also writes an xprof trace of the full step at
the largest batch to runs/xprof_cliff/.

Usage: python scripts/cliff_probe.py [--trace]   (chip must be free)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.ops.fused_synth import fused_synthesize
from dl_ofdm_tpu.train.loop import Trainer, TrainState
from dl_ofdm_tpu.utils.timing import bench_steps, d2h_fence, measure_fence_cost

FRAMES = tuple(int(x) for x in os.environ.get(
    "P_FRAMES", "2340,4681,9362,14043,18724,28086,37449").split(","))
KINDS = tuple(os.environ.get("P_KINDS", "full,synth,model").split(","))


def main():
    trace = "--trace" in sys.argv
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    variants = {}   # (kind, frames) -> step fn
    for frames in FRAMES:
        # only build what KINDS asks for: the 'model' variant materializes a
        # per-size rx_in buffer (~168 MB f32 at 37449 frames) that must not
        # be paid when filtered out
        tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=frames * 7),
                     channel="ETU")
        assert tr.batch_frames == frames and tr._use_fused_synth
        snr = jnp.full((frames,), 5.0, jnp.float32)
        st = tr.init_state(key)

        if "full" in KINDS:
            state = {"s": st}

            def step_full(i, state=state, tr=tr, snr=snr):
                state["s"], _ = tr.train_step(
                    state["s"], jax.random.fold_in(key, i), snr)
                return state["s"].params
            variants[("full", frames)] = step_full

        spec, nf = tr._fused_synth_spec, frames

        @jax.jit
        def synth(k, spec=spec, nf=nf, snr=snr):
            return fused_synthesize(spec, nf, k, snr)

        if "synth" in KINDS:
            def step_synth(i, synth=synth):
                return synth(jax.random.fold_in(key, i))
            variants[("synth", frames)] = step_synth

        if "model" in KINDS:
            bits, rx_in, _ = jax.jit(
                lambda k, synth=synth: synth(k))(key)
            bits = jax.block_until_ready(bits)

            @jax.jit
            def data_step(state, bits, rx_in, tr=tr):
                (_, _), grads = jax.value_and_grad(
                    tr._loss_fn, has_aux=True)(state.params, bits, rx_in)
                updates, opt_state = tr.optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(params, opt_state, state.step + 1)

            state_m = {"s": st}

            def step_model(i, state_m=state_m, data_step=data_step,
                           bits=bits, rx_in=rx_in):
                state_m["s"] = data_step(state_m["s"], bits, rx_in)
                return state_m["s"].params
            variants[("model", frames)] = step_model
    for name, fn in variants.items():
        print(f"compiling {name}...", flush=True)
        d2h_fence(fn(0))

    best = {name: float("inf") for name in variants}
    for rnd in range(4):
        for name, fn in variants.items():
            t = bench_steps(fn, iters=20, repeats=1, fence_cost=fence)
            best[name] = min(best[name], t)
        print(f"round {rnd} done", flush=True)

    print("\nframes | " + " | ".join(f"{k} ms (us/fr)" for k in KINDS)
          + " | G IQ/s (full)")
    for frames in FRAMES:
        cells = []
        for k in KINDS:
            t = best[(k, frames)]
            cells.append(f"{t*1e3:8.3f} ({t/frames*1e6:6.3f})")
        f = best.get(("full", frames))
        iq = frames * 7 * 80
        gs = f"{iq/f/1e9:6.2f}" if f else "   n/a"
        print(f"{frames:6d} | " + " | ".join(cells) + f" | {gs}", flush=True)

    if trace:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "runs", "xprof_cliff")
        fn = variants.get(("full", FRAMES[-1]))
        if fn is None:  # 'full' filtered out by P_KINDS: trace any survivor
            fn = next(iter(variants.values()))
        with jax.profiler.trace(out):
            for i in range(8):
                o = fn(i)
            d2h_fence(o)
        print(f"trace written to {out}")


if __name__ == "__main__":
    main()
