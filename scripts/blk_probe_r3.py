"""Fused-synth grid block-size sweep (round-3 throughput knob).

The synth kernel runs a serialized grid of `spec.block`-row blocks; at the
default 64 the stage costs a near-flat ~0.17-0.19 us/frame (cliff_probe /
synth_ab_r3) — per-block overhead, not bandwidth.  With the persistent
compilation cache a multi-minute Mosaic compile of a bigger block is
one-time, so this probe measures synth-alone and the full train step with
block_override in P_BLKS (default "64,128") at P_FRAMES (default
"18724,37449"), interleaved, to size the win.

Usage: python scripts/blk_probe_r3.py     (chip must be free)
       P_BLKS=64,128,256 python scripts/blk_probe_r3.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.ops.fused_synth import fused_synthesize
from dl_ofdm_tpu.train.loop import Trainer
from dl_ofdm_tpu.utils.cache import enable_persistent_cache
from dl_ofdm_tpu.utils.timing import bench_steps, d2h_fence, measure_fence_cost

FRAMES = tuple(int(x) for x in os.environ.get(
    "P_FRAMES", "18724,37449").split(","))
BLKS = tuple(int(x) for x in os.environ.get("P_BLKS", "64,128").split(","))


def main():
    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    variants = {}
    for frames in FRAMES:
        for blk in BLKS:
            tr = Trainer(OFDMConfig(nbits=1),
                         TrainConfig(batch_size=frames * 7), channel="ETU")
            assert tr.batch_frames == frames
            if blk:
                tr._fused_synth_spec = dataclasses.replace(
                    tr._fused_synth_spec, block_override=blk)
            spec = tr._fused_synth_spec
            snr = jnp.full((frames,), 5.0, jnp.float32)
            state = {"s": tr.init_state(key)}

            def step_full(i, state=state, tr=tr, snr=snr):
                state["s"], _ = tr.train_step(
                    state["s"], jax.random.fold_in(key, i), snr)
                return state["s"].params
            variants[("full", blk, frames)] = step_full

            @jax.jit
            def synth(k, spec=spec, nf=frames, snr=snr):
                return fused_synthesize(spec, nf, k, snr)

            variants[("synth", blk, frames)] = \
                lambda i, synth=synth: synth(jax.random.fold_in(key, i))

    import time
    for name, fn in variants.items():
        t0 = time.time()
        print(f"compiling {name}...", flush=True)
        d2h_fence(fn(0))
        print(f"  compiled+ran in {time.time()-t0:.1f}s", flush=True)

    best = {name: float("inf") for name in variants}
    for rnd in range(3):
        for name, fn in variants.items():
            t = bench_steps(fn, iters=20, repeats=1, fence_cost=fence)
            best[name] = min(best[name], t)
        print(f"round {rnd} done", flush=True)

    print("\nkind blk | " + " | ".join(f"{f} fr ms (us/fr)" for f in FRAMES))
    for kind in ("synth", "full"):
        for blk in BLKS:
            cells = []
            for frames in FRAMES:
                t = best[(kind, blk, frames)]
                cells.append(f"{t*1e3:8.3f} ({t/frames*1e6:6.3f})")
            print(f"{kind:>5} {blk:3d} | " + " | ".join(cells), flush=True)


if __name__ == "__main__":
    main()
