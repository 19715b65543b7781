"""Locate the 19k->37k-frame superlinear cost (round-2 VERDICT item 3b).

cliff_probe_r2: full step 0.314 us/frame @18724 but 0.417 @37449 while the
fused synth stage stays ~0.18 us/frame — something in fwd+bwd+Adam scales
superlinearly.  This probe splits the model side on FIXED data:

  fwd     forward only (loss value)
  grad    value_and_grad (fwd + bwd)
  opt     value_and_grad + Adam update (the full non-synth step)

at 9362 / 18724 / 37449 frames, interleaved rounds, per-variant minima.
Whichever split's us/frame jumps between 18724 and 37449 owns the knee.
With --trace, writes an xprof trace of `grad` at 37449 to runs/xprof_knee/.

Usage: python scripts/knee_probe_r3.py [--trace]   (chip must be free)
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
from dl_ofdm_tpu.utils.cache import enable_persistent_cache
from dl_ofdm_tpu.utils.timing import bench_steps, d2h_fence, measure_fence_cost

FRAMES = tuple(int(x) for x in os.environ.get(
    "P_FRAMES", "9362,18724,37449").split(","))


def main():
    # chip-safety guard (round-3 VERDICT weak #8): any unknown argv —
    # including --help — must exit BEFORE touching the backend, because a
    # second process importing the axon backend while another holds the
    # chip hangs, and a killed chip process leaves the lease held ~25-30 min
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--trace", action="store_true",
                    help="write an xprof trace of grad at the largest size")
    args = ap.parse_args()
    enable_persistent_cache()
    trace = args.trace
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    variants = {}
    for frames in FRAMES:
        tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=frames * 7),
                     channel="ETU")
        assert tr.batch_frames == frames
        snr = jnp.full((frames,), 5.0, jnp.float32)
        st = tr.init_state(key)
        # fixed data, synthesized once
        spec = tr._fused_synth_spec
        bits, rx_in, _ = jax.jit(
            lambda k: fused_synthesize(spec, frames, k, snr))(key)
        d2h_fence(bits)

        fwd_j = jax.jit(lambda p, b, x, tr=tr: tr._loss_fn(p, b, x)[0])
        grad_j = jax.jit(lambda p, b, x, tr=tr: jax.grad(
            lambda q: tr._loss_fn(q, b, x)[0])(p))

        @jax.jit
        def opt_j(state, b, x, tr=tr):
            grads = jax.grad(
                lambda q: tr._loss_fn(q, b, x)[0])(state.params)
            updates, opt_state = tr.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1)

        box = {"p": st.params, "s": st}
        variants[("fwd", frames)] = \
            lambda i, f=fwd_j, box=box, b=bits, x=rx_in: f(box["p"], b, x)
        variants[("grad", frames)] = \
            lambda i, f=grad_j, box=box, b=bits, x=rx_in: f(box["p"], b, x)

        def step_opt(i, f=opt_j, box=box, b=bits, x=rx_in):
            box["s"] = f(box["s"], b, x)
            return box["s"].params
        variants[("opt", frames)] = step_opt

    for name, fn in variants.items():
        print(f"compiling {name}...", flush=True)
        d2h_fence(fn(0))

    best = {name: float("inf") for name in variants}
    for rnd in range(4):
        for name, fn in variants.items():
            t = bench_steps(fn, iters=20, repeats=1, fence_cost=fence)
            best[name] = min(best[name], t)
        print(f"round {rnd} done", flush=True)

    kinds = ("fwd", "grad", "opt")
    print("\nframes | " + " | ".join(f"{k} ms (us/fr)" for k in kinds))
    for frames in FRAMES:
        cells = []
        for k in kinds:
            t = best[(k, frames)]
            cells.append(f"{t*1e3:8.3f} ({t/frames*1e6:6.3f})")
        print(f"{frames:6d} | " + " | ".join(cells), flush=True)

    if trace:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "runs", "xprof_knee")
        fn = variants[("grad", FRAMES[-1])]
        with jax.profiler.trace(out):
            o = None
            for i in range(8):
                o = fn(i)
            d2h_fence(o)
        print(f"trace written to {out}")


if __name__ == "__main__":
    main()
