"""37k-frame knee (round-3 VERDICT #3): probe candidate fixes.

knee_probe_r3 attributed the knee: grad 0.093 -> 0.217 us/frame and opt
0.086 -> 0.215 between 9362 and 37449 frames (superlinear), forward flat.
This probe times, interleaved with per-variant minima on FIXED data:

  grad        value_and_grad, f32 activations (baseline)
  grad_bf16   value_and_grad, bf16 activations (halved activation bytes)
  grad_mb4    f32 grad via 4-way microbatch accumulation in ONE jit
              (bounds the weight-gradient GEMM's contraction dim; if the
              knee is a spill/tiling pathology of the big contraction,
              4x 9362-frame chunks should restore ~4x the 9362 cost)
  opt / opt_bf16   grad + Adam update

at 9362 / 18724 / 37449 frames.  With --trace, writes xprof traces of the
f32 grad at 18724 and 37449 to runs/xprof_knee_r4/.

Usage: python scripts/knee_probe_r4.py [--trace]   (chip must be free)
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.ops.fused_synth import fused_synthesize
    from dl_ofdm_tpu.train.loop import Trainer, TrainState
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    from dl_ofdm_tpu.utils.timing import (bench_steps, d2h_fence,
                                          measure_fence_cost)

    enable_persistent_cache()
    frames_list = tuple(int(x) for x in os.environ.get(
        "P_FRAMES", "9362,18724,37449").split(","))
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    print(f"d2h fence: {fence*1e3:.2f} ms", flush=True)

    variants = {}
    for frames in frames_list:
        tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=frames * 7),
                     channel="ETU")
        tr_bf = Trainer(OFDMConfig(nbits=1, compute_dtype="bfloat16"),
                        TrainConfig(batch_size=frames * 7), channel="ETU")
        assert tr.batch_frames == frames
        snr = jnp.full((frames,), 5.0, jnp.float32)
        st = tr.init_state(key)
        spec = tr._fused_synth_spec
        bits, rx_in, _ = jax.jit(
            lambda k: fused_synthesize(spec, frames, k, snr))(key)
        d2h_fence(bits)

        grad_j = jax.jit(lambda p, b, x, tr=tr: jax.grad(
            lambda q: tr._loss_fn(q, b, x)[0])(p))
        grad_bf = jax.jit(lambda p, b, x, tr=tr_bf: jax.grad(
            lambda q: tr._loss_fn(q, b, x)[0])(p))

        def grad_mb(p, b, x, tr=tr, n_chunks=4):
            cb = b.shape[0] // n_chunks
            acc = None
            for c in range(n_chunks):
                sl = slice(c * cb, (c + 1) * cb)
                g = jax.grad(lambda q: tr._loss_fn(q, b[sl], x[sl])[0])(p)
                acc = g if acc is None else jax.tree.map(
                    jnp.add, acc, g)
            return jax.tree.map(lambda v: v / n_chunks, acc)
        grad_mb_j = jax.jit(grad_mb)

        @jax.jit
        def opt_j(state, b, x, tr=tr):
            grads = jax.grad(
                lambda q: tr._loss_fn(q, b, x)[0])(state.params)
            updates, opt_state = tr.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1)

        box = {"p": st.params, "s": st}
        variants[("grad", frames)] = \
            lambda i, f=grad_j, box=box, b=bits, x=rx_in: f(box["p"], b, x)
        variants[("grad_bf16", frames)] = \
            lambda i, f=grad_bf, box=box, b=bits, x=rx_in: f(box["p"], b, x)
        variants[("grad_mb4", frames)] = \
            lambda i, f=grad_mb_j, box=box, b=bits, x=rx_in: f(box["p"], b, x)

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
            t = bench_steps(fn, iters=16, repeats=1, fence_cost=fence)
            best[name] = min(best[name], t)
        print(f"round {rnd} done", flush=True)

    kinds = ("grad", "grad_bf16", "grad_mb4", "opt")
    print("\nframes | " + " | ".join(f"{k} ms (us/fr)" for k in kinds),
          flush=True)
    for frames in frames_list:
        cells = []
        for k in kinds:
            t = best[(k, frames)]
            cells.append(f"{t*1e3:8.3f} ({t/frames*1e6:6.3f})")
        print(f"{frames:6d} | " + " | ".join(cells), flush=True)

    if args.trace:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "runs", "xprof_knee_r4")
        for frames in frames_list[-2:]:
            fn = variants[("grad", frames)]
            with jax.profiler.trace(os.path.join(out, str(frames))):
                o = None
                for i in range(8):
                    o = fn(i)
                d2h_fence(o)
        print(f"traces written to {out}", flush=True)


if __name__ == "__main__":
    main()
