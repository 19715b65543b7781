"""Round-3 bench bisect: fused-Pallas vs jnp data plane in the FULL train step.

BENCH_r01 (jnp chain) measured 3.089 ms @9362 frames; BENCH_r02 (fused synth,
adopted for every static spec when `_use_fused_synth` latched on in round 2)
measured 5.926 ms at the same batch — while 18724 was unchanged and 2340 got
faster.  runs/cliff_probe_r2.log shows the fused synth stage alone is ~3 ms
nearly flat in batch size, i.e. a fixed overhead, not bandwidth.  This probe
A/Bs the two data planes inside the identical train step, interleaved within
one process (co-resident executables perturb the tunneled chip ~2x), to decide
which plane the bench/Trainer should pick per batch size.

Usage: python scripts/synth_ab_r3.py    (chip must be free)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.ops.fused_synth import fused_synthesize
from dl_ofdm_tpu.train.loop import Trainer
from dl_ofdm_tpu.utils.timing import bench_steps, d2h_fence, measure_fence_cost

FRAMES = tuple(int(x) for x in os.environ.get(
    "P_FRAMES", "2340,9362,18724,37449").split(","))


def main():
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    variants = {}   # (kind, frames) -> step fn
    for frames in FRAMES:
        for kind in ("fused", "jnp"):
            tr = Trainer(OFDMConfig(nbits=1),
                         TrainConfig(batch_size=frames * 7), channel="ETU")
            assert tr.batch_frames == frames
            if kind == "jnp":
                tr._use_fused_synth = False
            snr = jnp.full((frames,), 5.0, jnp.float32)
            state = {"s": tr.init_state(key)}

            def step(i, state=state, tr=tr, snr=snr):
                state["s"], _ = tr.train_step(
                    state["s"], jax.random.fold_in(key, i), snr)
                return state["s"].params
            variants[(kind, frames)] = step

        # synth-alone fused (for the fixed-overhead attribution)
        spec = tr._fused_synth_spec

        @jax.jit
        def synth(k, spec=spec, nf=frames, snr=snr):
            return fused_synthesize(spec, nf, k, snr)

        def step_synth(i, synth=synth):
            return synth(jax.random.fold_in(key, i))
        variants[("synthf", frames)] = step_synth

    for name, fn in variants.items():
        print(f"compiling {name}...", flush=True)
        d2h_fence(fn(0))

    best = {name: float("inf") for name in variants}
    for rnd in range(3):
        for name, fn in variants.items():
            t = bench_steps(fn, iters=20, repeats=1, fence_cost=fence)
            best[name] = min(best[name], t)
        print(f"round {rnd} done", flush=True)

    kinds = ("fused", "jnp", "synthf")
    print("\nframes | " + " | ".join(f"{k} ms (us/fr)" for k in kinds))
    for frames in FRAMES:
        cells = []
        for k in kinds:
            t = best[(k, frames)]
            cells.append(f"{t*1e3:8.3f} ({t/frames*1e6:6.3f})")
        print(f"{frames:6d} | " + " | ".join(cells), flush=True)


if __name__ == "__main__":
    main()
