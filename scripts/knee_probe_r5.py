"""37k-frame knee (round-3 VERDICT #3), probe 3: isolation + memory.

knee_probe_r4 showed bf16 and 4-way microbatching do NOT remove the knee,
and that microbatch chunks the SAME size as the fast 9362-frame executable
still run ~2.2x slower inside the big-batch program — the knee is about the
program/memory context, not the GEMM shapes.  Two suspects remain:

  1. co-residency: every prior probe compiled all sizes/variants into ONE
     process, and CLAUDE.md documents ~2x step-time perturbation from
     co-resident executables.  This probe times each (frames, variant) in
     its OWN fresh process (subprocess orchestration) — if the knee
     disappears in isolation it was a measurement artifact all along.
  2. memory context: XLA remat / layout / allocator behavior at the larger
     live-buffer footprint.  `--one` mode also dumps the compiled
     executable's memory_analysis (temp/argument/output bytes) and
     cost_analysis (flops, bytes accessed) so superlinear temp growth or
     bytes-accessed growth is visible directly.

Variants: grad (baseline), remat (whole-loss jax.checkpoint: activations
recomputed in backward, minimal live memory), donate (rx/bits buffers
donated).  Sizes include 32768 (power-of-2 control for shape pathology).

Usage:
  python scripts/knee_probe_r5.py            # orchestrate (chip must be free)
  python scripts/knee_probe_r5.py --one F V  # single measurement (internal)
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "runs", "p15_knee_r5.json")

FRAMES = (9362, 18724, 32768, 37449)
VARIANTS = ("grad", "remat", "donate")


def run_one(frames: int, variant: str) -> dict:
    import jax
    import jax.numpy as jnp

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.ops.fused_synth import fused_synthesize
    from dl_ofdm_tpu.train.loop import Trainer
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    from dl_ofdm_tpu.utils.timing import (bench_steps, d2h_fence,
                                          measure_fence_cost)

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    fence = measure_fence_cost()
    tr = Trainer(OFDMConfig(nbits=1), TrainConfig(batch_size=frames * 7),
                 channel="ETU")
    assert tr.batch_frames == frames
    snr = jnp.full((frames,), 5.0, jnp.float32)
    bits, rx_in, _ = jax.jit(
        lambda k: fused_synthesize(tr._fused_synth_spec, frames, k, snr))(key)
    d2h_fence(bits)
    st = tr.init_state(key)

    if variant == "grad":
        fn = jax.jit(lambda p, b, x: jax.grad(
            lambda q: tr._loss_fn(q, b, x)[0])(p))
    elif variant == "remat":
        loss_ck = jax.checkpoint(lambda q, b, x: tr._loss_fn(q, b, x)[0])
        fn = jax.jit(lambda p, b, x: jax.grad(
            lambda q: loss_ck(q, b, x))(p))
    elif variant == "donate":
        fn = jax.jit(lambda p, b, x: jax.grad(
            lambda q: tr._loss_fn(q, b, x)[0])(p), donate_argnums=(1, 2))
    else:
        raise SystemExit(f"unknown variant {variant}")

    lowered = fn.lower(st.params, bits, rx_in)
    compiled = lowered.compile()
    rec = {"frames": frames, "variant": variant}
    try:
        ma = compiled.memory_analysis()
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                rec[k] = int(v)
    except Exception as e:                                  # noqa: BLE001
        rec["memory_analysis_error"] = str(e)
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        for k in ("flops", "bytes accessed"):
            if k in ca:
                rec[k.replace(" ", "_")] = float(ca[k])
    except Exception as e:                                  # noqa: BLE001
        rec["cost_analysis_error"] = str(e)

    if variant == "donate":
        # donated buffers are dead after one call; rebuild per iteration is
        # not steady-state -> time by re-donating a fresh copy each iter
        # would measure the copy.  Instead donate COPIES made inside jit is
        # moot; fall back to timing the non-donated call pattern but with
        # donation semantics disabled after first use: just measure compile
        # stats (timing skipped).
        rec["ms"] = None
    else:
        compiled_call = fn  # jit caches the executable
        best = float("inf")
        for _ in range(4):
            t = bench_steps(lambda i: compiled_call(st.params, bits, rx_in),
                            iters=16, repeats=1, fence_cost=fence)
            best = min(best, t)
        rec["ms"] = round(best * 1e3, 4)
        rec["us_per_frame"] = round(best / frames * 1e6, 4)
    rec["fence_ms"] = round(fence * 1e3, 2)
    print("RESULT " + json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--one", nargs=2, metavar=("FRAMES", "VARIANT"))
    args = ap.parse_args()
    if args.one:
        run_one(int(args.one[0]), args.one[1])
        return

    def probe_backend():
        # after a killed chip process the axon lease can be held ~25-30 min;
        # wait until a fresh client can init before the next subprocess
        import time
        for _ in range(40):
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=180)
            if p.returncode == 0:
                return
            print("[orchestrator] backend busy; waiting 60s", flush=True)
            time.sleep(60)

    results = []
    if os.path.isfile(OUT):
        with open(OUT) as f:
            results = json.load(f)
    # an error/timeout record is NOT done — a rerun retries it (round-4
    # ADVICE: treating errors as completed made failures permanent)
    done = {(r["frames"], r["variant"]) for r in results
            if "error" not in r}
    for frames in FRAMES:
        for variant in VARIANTS:
            if (frames, variant) in done:
                continue
            print(f"[orchestrator] {frames} {variant}", flush=True)
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--one", str(frames), variant],
                    capture_output=True, text=True, timeout=1500)
                out, err, rc = p.stdout, p.stderr, p.returncode
            except subprocess.TimeoutExpired as e:
                out = (e.stdout or b"").decode() \
                    if isinstance(e.stdout, bytes) else (e.stdout or "")
                err, rc = "TIMEOUT", -1
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results.append(json.loads(line[len("RESULT "):]))
                    break
            else:
                results.append({"frames": frames, "variant": variant,
                                "error": (err or out)[-500:]})
                probe_backend()
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
