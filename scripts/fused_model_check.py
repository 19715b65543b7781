"""On-chip validation + timing of the fused DCCN fwd+bwd kernel
(ops/fused_model.py, round-5 VERDICT #1).

1. Numerics: with the SAME PRNG key, the fused-synth kernel's raw-plane
   output + fused model-grad kernel must reproduce the XLA autodiff grads
   computed on the kernel's own non-raw (bits, rx_in) output — same data,
   two grad paths.
2. Timing: steady-state ms/step of the fused train step vs the XLA step at
   the bench batch sizes, f32 and bf16 matmul variants (d2h-fenced,
   interleaved within one process).

Writes runs/p19_fused_model_check.json.  Chip must be free.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.ops.fused_model import dccn_fused_grads
    from dl_ofdm_tpu.ops.fused_synth import _combine_stats, fused_synthesize
    from dl_ofdm_tpu.train import metrics as M
    from dl_ofdm_tpu.train.loop import Trainer
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    from dl_ofdm_tpu.utils.timing import bench_steps, measure_fence_cost

    enable_persistent_cache()
    report = {"device": str(jax.devices()[0])}
    cfg = OFDMConfig(nbits=1)
    tc = TrainConfig(snr=5.0, batch_size=512)
    tr = Trainer(cfg, tc, channel="AWGN")
    assert tr._fused_model_spec is not None, "fused model path not engaged"
    key = jax.random.PRNGKey(42)
    state = tr.init_state(key)
    n = 2048
    snr = jnp.full((n,), 5.0, jnp.float32)
    ks = jax.random.PRNGKey(7)

    # --- numerics: same synth draws, two grad paths ------------------------
    bits, rx_in, _ = fused_synthesize(tr._fused_synth_spec, n, ks, snr)

    def ce_only(p):
        out = tr.model.apply({"params": p}, rx_in)
        logits = out[0] if isinstance(out, tuple) else out
        return M.cross_entropy(logits, bits)

    ce_ref, grads_ref = jax.value_and_grad(ce_only)(state.params)
    out_m = tr.model.apply({"params": state.params}, rx_in)
    logits_ref = out_m[0] if isinstance(out_m, tuple) else out_m
    conf_ref = np.asarray(M.confusion_matrix(
        bits, M.bit_predictions(logits_ref)))
    idx, yr, yi, nr, ni, stats = fused_synthesize(
        tr._fused_synth_spec, n, ks, snr, raw=True)
    _, c, _, _ = _combine_stats(stats.sum(axis=0), n)
    grads, ce, conf = dccn_fused_grads(
        tr._fused_model_spec, n, state.params, yr, yi, nr, ni, c, idx)
    rel = {}
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(grads_ref)[0],
            jax.tree_util.tree_flatten_with_path(grads)[0]):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(a).max()), 1e-12)
        rel[jax.tree_util.keystr(path)] = float(
            np.abs(b - a).max() / denom)
    report["numerics"] = {
        "ce_fused": float(ce), "ce_xla": float(ce_ref),
        "conf_match": bool((np.asarray(conf) == conf_ref).all()),
        "grad_max_rel_err_vs_xla": rel,
    }
    log(f"ce fused={float(ce):.6f} xla={float(ce_ref):.6f} "
        f"conf_match={report['numerics']['conf_match']}")
    log("grad rel err (kernel vs XLA autodiff, CE-only, same data):")
    for k, v in rel.items():
        log(f"  {k}: {v:.2e}")

    # --- timing ------------------------------------------------------------
    fence = measure_fence_cost()
    report["fence_ms"] = fence * 1e3
    timing = {}
    for frames in (2340, 9362, 18724):
        snr_b = jnp.full((frames,), 5.0, jnp.float32)
        rows = {}
        for label, mmd in (("fused_f32", "float32"),
                           ("fused_bf16", "bfloat16"), ("xla", None)):
            tc2 = TrainConfig(snr=5.0, batch_size=512,
                              fused_model_matmul_dtype=mmd or "float32")
            tr2 = Trainer(cfg, tc2, channel="AWGN")
            tr2.batch_frames = frames
            if mmd is None:
                tr2._fused_model_spec = None     # force the XLA step
            st = tr2.init_state(jax.random.PRNGKey(1))
            keys = jax.random.split(jax.random.PRNGKey(2), 64)

            def step(i, _tr=tr2, _st=st, _k=keys, _s=snr_b):
                out = _tr.train_step(_st, _k[i % 64], _s)
                return out[1]["ce"]

            sec = bench_steps(step, iters=20, repeats=3, fence_cost=fence)
            rows[label] = round(sec * 1e3, 4)
            log(f"frames={frames} {label}: {sec*1e3:.3f} ms/step "
                f"({frames*560*2/sec/1e9:.2f} G IQ/s)")
        timing[frames] = rows
    report["timing_ms"] = timing

    out = os.path.join(RUNS, "p19_fused_model_check.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
