#!/usr/bin/env python3
"""Benchmark: IQ samples/s/chip through the DCCN receiver (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "IQ_samples_per_sec_per_chip",
   "vs_baseline": R, ...}

`value` is the full-pipeline training throughput per chip: bits -> OFDM TX
-> Rayleigh fading -> AWGN -> DCCN forward+backward -> Adam update, all one
on-device XLA program.  `vs_baseline` is the speedup versus the reference's
pipeline architecture measured on THIS machine: identical device-side step,
but with the data plane synthesized on the host exactly the reference way
(NumPy LUT/packbits constellation mapping, np.fft.ifft, per-frame
np.convolve fading loop, AWGN — `dev/py/ofdm.py:328-380`,
`dev/py/radio.py:424-506`, `dev/py/radio.py:513-526`), which is what
dominates the reference's wall clock.  Host->device copy time is NOT charged
to the baseline (it would be tunnel-distorted here), so the reported speedup
is conservative.  Forward-only receiver throughput is reported as an aux
field.

TIMING METHODOLOGY (utils/timing.py): on this tunneled 'axon' backend
jax.block_until_ready does NOT fence device execution (a chained 8192^2 bf16
matmul "measures" 55 PFLOP/s under it vs 92 TFLOP/s under a real fence), so
every measurement here chains ITERS dispatches and fences ONCE through a
device->host fetch of a value data-dependent on the result, subtracting the
separately measured d2h round-trip (~23 ms).
"""


from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def numpy_reference_synthesis(rng, n_frames, plan, table, ch_coeff,
                              alpha, nfft, snr_db):
    """Faithful reference-style host data plane (NumPy, per-frame loops)."""
    import numpy as np
    nbits = 1
    bits = rng.integers(0, 2, (n_frames, plan.frame_size, nbits))
    # constellation map via packbits LUT (ofdm_tx_frame_np)
    padded = np.pad(bits.reshape(-1, nbits).astype(np.uint8),
                    [(0, 0), (8 - nbits, 0)])
    sym = table.take(np.packbits(padded, axis=1).ravel())
    grid = np.zeros((n_frames, plan.nsymbol * plan.nfft), np.complex64)
    grid[:, plan.data_sc] = sym.reshape(n_frames, plan.frame_size)
    grid[:, plan.pilot_sc] = 3 + 3j
    time_d = np.fft.ifft(grid.reshape(-1, plan.nfft))
    wf = np.concatenate([time_d[:, -plan.cp_len:], time_d], axis=1)
    wf = wf.reshape(n_frames, plan.nsymbol, -1)
    # per-frame Rayleigh fading loop (rayleigh_chan_lte.run)
    y = np.zeros_like(wf)
    h_fr = np.zeros((n_frames, plan.nsymbol, nfft), np.complex64)
    n_taps = ch_coeff.shape[0]
    for i in range(n_frames):
        zrk = rng.normal(scale=1 / np.sqrt(2), size=(n_taps, 2))
        zck = zrk[:, 0] + 1j * zrk[:, 1]
        gt = (zck * ch_coeff) @ alpha
        sig = wf[i].reshape(-1)
        y[i] = np.convolve(sig, gt, mode="same").reshape(wf[i].shape)
        h_fr[i] = np.fft.fft(gt, nfft)
    # AWGN_channel_np
    y_iq = np.stack([y.real, y.imag], -1).astype(np.float32)
    pwr = np.mean(y_iq[..., 0] ** 2 + y_iq[..., 1] ** 2)
    y_iq /= np.sqrt(pwr)
    nstd = np.sqrt(0.5) * 10 ** (-snr_db / 20.0)
    y_iq += nstd * rng.normal(size=y_iq.shape).astype(np.float32)
    return bits, y_iq, h_fr

def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from dl_ofdm_tpu.config import OFDMConfig
    from dl_ofdm_tpu.models.dccn import DCCNReceiver
    from dl_ofdm_tpu.ofdm.plan import build_plan
    from dl_ofdm_tpu.ops.norms import leaky_relu
    from dl_ofdm_tpu.utils.timing import (bench_steps, d2h_fence,
                                          measure_fence_cost)

    cfg = OFDMConfig(nbits=1)
    plan = build_plan(cfg)
    b = 4096
    s, t = plan.nsymbol, plan.samples_per_symbol
    iq_per_batch = b * s * t

    model = DCCNReceiver(nbits=cfg.nbits, nfft=cfg.nfft, cp_len=plan.cp_len,
                         nfilter=cfg.nfilter, frame_size=plan.frame_size,
                         keep_cp=cfg.cp)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, s, t, 2), jnp.float32)
    params = model.init(key, x[:2])["params"]

    @jax.jit
    def fwd(params, x):
        logits, _ = model.apply({"params": params}, x)
        return logits

    fence_cost = measure_fence_cost()
    log(f"d2h fence cost: {fence_cost*1e3:.2f} ms")

    # ---- headline metric FIRST: the tunneled device sporadically drops into
    # a slower regime when many unrelated executables are co-resident
    # (runs/train_step_roofline.txt) -- measure the train pipeline before
    # compiling the aux-measurement programs.
    # full end-to-end train step (data synthesis + fwd + bwd + update).
    # PINNED PROTOCOL (round-3 VERDICT #5): ALL train-step executables
    # (every batch size, f32 AND bf16) are compiled before any timing, then
    # measured INTERLEAVED over `rounds` passes with a per-step minimum and
    # a recorded max spread — the round-2 bench measured one size inside a
    # transient slow-regime window and shipped a phantom 1.9x "regression"
    # at 9362 frames (scripts/synth_ab_r3.py interleaved A/B: 2.94 ms, vs
    # the 5.93 ms BENCH_r02 recorded).  Throughput is reported at the best
    # batch size (the training loop's adaptive batch growth reaches these
    # sizes within a few epochs); the per-size tables are kept in the JSON,
    # and the same run emits BOTH the bench JSON line and the README block
    # (runs/bench_local.json + scripts/sync_readme_bench.py), so the two
    # artifacts can never disagree.
    # Since round 5 the train step runs the FUSED model fwd+bwd kernel
    # (ops/fused_model.py; the XLA autodiff fwd+bwd owned 87% of step
    # traffic) — the dtype axis is the kernel's GEMM input dtype ('f32' =
    # f32 passes, HIGHER precision than the XLA step's default TPU matmul;
    # 'bf16' = full-rate MXU, f32 accumulation).  An 'xla' row per batch
    # size keeps the autodiff step measured for comparison.
    log("compiling full train steps (fused f32/bf16 + xla)...")
    from dl_ofdm_tpu.channel.profiles import get_profile
    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.ofdm.constellation import _table_np
    from dl_ofdm_tpu.train.loop import Trainer

    steps, trainers = {}, {}
    for dk, mmd in (("f32", "float32"), ("bf16", "bfloat16"),
                    ("xla", None)):
        for batch_size in (16384, 65534, 131068, 262143):
            tr_c = Trainer(cfg, TrainConfig(
                batch_size=batch_size,
                fused_model_matmul_dtype=mmd or "float32"),
                channel="ETU")
            if mmd is None:
                tr_c._fused_model_spec = None    # force the XLA step
            st = tr_c.init_state(key)
            snr = jnp.full((tr_c.batch_frames,), 5.0, jnp.float32)
            state = {"s": st}

            def step(i, state=state, tr_c=tr_c, snr=snr):
                state["s"], _ = tr_c.train_step(
                    state["s"], jax.random.fold_in(key, i), snr)
                return state["s"].params

            d2h_fence(step(0))                   # compile before timing
            steps[(dk, tr_c.batch_frames)] = step
            trainers[(dk, tr_c.batch_frames)] = tr_c

    rounds = 4
    best_t = {k: float("inf") for k in steps}
    worst_t = {k: 0.0 for k in steps}
    for rnd in range(rounds):
        for k, step in steps.items():
            t_c = bench_steps(step, iters=20, repeats=1,
                              fence_cost=fence_cost)
            best_t[k] = min(best_t[k], t_c)
            worst_t[k] = max(worst_t[k], t_c)

    # a fused variant is eligible for the headline only if its matched-seed
    # training control passed (runs/p19_fused_train_control.json: BER@5dB
    # within 25% relative of the XLA-autodiff arms) — perf must not ship a
    # gradient path that trains measurably worse.
    fused_ok = {"xla": True, "f32": False, "bf16": False}
    fused_ctl = None
    ctl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "runs", "p19_fused_train_control.json")
    if os.path.isfile(ctl_path):
        with open(ctl_path) as f:
            ctl = json.load(f)
        summ = ctl.get("summary", {})
        fused_ok["f32"] = summ.get("fused_f32_verdict") == "PASS"
        fused_ok["bf16"] = summ.get("fused_bf16_verdict") == "PASS"
        fused_ctl = summ

    t_train, train_iq, tr, head_key = None, 0.0, None, None
    per_size = {"f32": {}, "bf16": {}, "xla": {}}
    spread = {}
    for (dk, bf), t_c in best_t.items():
        iq_c = bf * s * t / t_c
        per_size[dk][bf] = {"ms_per_step": round(t_c * 1e3, 3),
                            "g_iq_per_sec": round(iq_c / 1e9, 3)}
        spread[f"{dk}@{bf}"] = round(worst_t[(dk, bf)] / t_c, 3)
        log(f"train[{dk}] batch={bf} frames: {t_c*1e3:.3f} ms/step, "
            f"{iq_c/1e9:.2f}G IQ/s (spread x{spread[f'{dk}@{bf}']})")
        if iq_c > train_iq and fused_ok[dk]:
            t_train, train_iq, tr, head_key = t_c, iq_c, \
                trainers[(dk, bf)], (dk, bf)

    # roofline context for the winning step (VERDICT r2 item 3d): compiled
    # FLOP/byte counts vs v5e peaks (bf16 197 TFLOP/s, ~819 GB/s HBM).
    # cost_analysis is the XLA estimate; utilization is a lower bound.
    roofline = None
    try:
        st = tr.init_state(key)
        snr = jnp.full((tr.batch_frames,), 5.0, jnp.float32)
        ca = type(tr).train_step.lower(tr, st, key, snr).compile() \
                     .cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        roofline = {
            "flops_per_step": flops,
            "tflops_per_sec": round(flops / t_train / 1e12, 2),
            "pct_bf16_peak": round(100 * flops / t_train / 197e12, 2),
            "hbm_bytes_per_step": nbytes,
            "hbm_gb_per_sec": round(nbytes / t_train / 1e9, 1),
            "pct_hbm_peak": round(100 * nbytes / t_train / 819e9, 1),
        }
        log(f"roofline: {roofline['tflops_per_sec']} TF/s "
            f"({roofline['pct_bf16_peak']}% bf16 peak), "
            f"{roofline['hbm_gb_per_sec']} GB/s "
            f"({roofline['pct_hbm_peak']}% HBM peak)")
    except Exception as e:  # pragma: no cover - cost_analysis backend support
        log(f"cost_analysis unavailable: {e}")

    # reference-architecture baseline: host NumPy data plane + same device step
    log("timing reference-style host data plane...")
    prof = get_profile("etu")
    rng = np.random.default_rng(0)
    # min over repeats, matching the device-side estimator: the first pass
    # pays one-off page-fault/allocation costs ~20x the steady state
    t_host = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        numpy_reference_synthesis(rng, tr.batch_frames, plan, _table_np(1),
                                  prof.ch_coeff, prof.alpha_matrix,
                                  cfg.nfft, 5.0)
        t_host = min(t_host, time.perf_counter() - t0)
    t_ref_pipeline = t_host + t_train  # copy time excluded (conservative)
    base_train_iq = tr.batch_frames * s * t / t_ref_pipeline

    # ---- reference-style baseline -----------------------------------------
    # fft_like as the reference's conv-over-depth trick: input transposed to
    # [B*S, 1(w), 2(depth), K(chan)], conv with kernel (1,K wide,1) 'SAME'
    # producing 2F channels, then the a-d / b-c recombination.
    f = cfg.nfilter
    wr = params["fft_like"]["wr"]
    wi = params["fft_like"]["wi"]
    conv_kernel = jnp.concatenate([wr, wi], axis=-1)  # [K, 2F]
    kernel4 = jnp.zeros((1, t, t, 2 * f), jnp.float32)
    kernel4 = kernel4.at[0, t // 2].set(conv_kernel)  # only center tap live
    dense_params = {k: v for k, v in params.items() if k != "fft_like"}

    def ref_style_fwd(kernel4, dense_params, x):
        bb = x.shape[0]
        h = jnp.transpose(x, (0, 1, 3, 2)).reshape(bb * s, 1, 2, t)
        h = jnp.moveaxis(h, -1, 1)  # NHWC with H=1? emulate conv3d: [B*S, 1, 2, K]
        h = h.reshape(bb * s, 1, 2, t)
        out = jax.lax.conv_general_dilated(
            h, kernel4, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B*S, 1, 2, 2F]
        out = out.reshape(bb * s, 2, 2, f)
        yr = out[:, 0, 0] - out[:, 1, 1]
        yi = out[:, 0, 1] - out[:, 1, 0]
        fft_out = jnp.stack([yr, yi], -1).reshape(bb, s, f, 2)
        # same demodulation head
        o = fft_out.reshape(bb, s * f * 2)
        d = dense_params
        o = o @ d["Dense_extract"]["kernel"] + d["Dense_extract"]["bias"]
        o = o.reshape(bb, 1, plan.frame_size, 2)
        h2 = o @ d["Dense_conv1x1"]["kernel"] + d["Dense_conv1x1"]["bias"]
        h2 = leaky_relu(h2)
        h2 = jnp.concatenate([h2, o], -1)
        h2 = leaky_relu(h2 @ d["Dense_llr"]["kernel"] + d["Dense_llr"]["bias"])
        return h2.reshape(bb, plan.frame_size, cfg.nbits, 2)

    ref_fwd = jax.jit(ref_style_fwd)

    log("compiling ours...")
    t_ours = bench_steps(lambda i: fwd(params, x), iters=40,
                         fence_cost=fence_cost)

    # bf16-activation forward (same f32 params; memory-bound path option)
    model_bf = DCCNReceiver(nbits=cfg.nbits, nfft=cfg.nfft,
                            cp_len=plan.cp_len, nfilter=cfg.nfilter,
                            frame_size=plan.frame_size, keep_cp=cfg.cp,
                            compute_dtype="bfloat16")

    @jax.jit
    def fwd_bf(params, x):
        logits, _ = model_bf.apply({"params": params}, x)
        return logits

    log("compiling bf16 forward...")
    t_bf = bench_steps(lambda i: fwd_bf(params, x), iters=40,
                       fence_cost=fence_cost)

    log("compiling reference-style (on-device, same data)...")
    t_ref = bench_steps(lambda i: ref_fwd(kernel4, dense_params, x), iters=20,
                        fence_cost=fence_cost)

    ours_fwd = iq_per_batch / t_ours
    log(f"fwd: {t_ours*1e3:.3f} ms (ref-style fwd {t_ref*1e3:.3f} ms); "
        f"train-step: {t_train*1e3:.3f} ms; host synthesis: {t_host*1e3:.1f} ms")

    result = {
        "metric": "IQ samples/s/chip, end-to-end DCCN training pipeline",
        "value": round(train_iq, 1),
        "unit": "IQ_samples_per_sec_per_chip",
        "vs_baseline": round(train_iq / base_train_iq, 3),
        "baseline": ("reference pipeline architecture on this machine: host-NumPy "
                     "data plane (LUT/ifft/np.convolve per frame) + identical "
                     "device step; host->device copy excluded (conservative)"),
        "timing": ("d2h-fenced steady state (axon block_until_ready does not "
                   "fence; see utils/timing.py); interleaved min over "
                   f"{rounds} rounds across the full executable set"),
        "train_batch_frames": tr.batch_frames,
        "train_ms_per_step": round(t_train * 1e3, 3),
        "headline_grad_path": ("xla_autodiff" if head_key[0] == "xla" else
                               f"fused_kernel_{head_key[0]}_matmul"),
        "fused_train_control": fused_ctl,
        "per_batch_size": per_size["f32"],
        "per_batch_size_bf16": per_size["bf16"],
        "per_batch_size_xla": per_size["xla"],
        "repeatability_spread_max_over_min": spread,
        "roofline_vs_v5e_peaks": roofline,
        "host_synthesis_ms": round(t_host * 1e3, 1),
        "fwd_iq_per_sec": round(ours_fwd, 1),
        "fwd_bf16_iq_per_sec": round(iq_per_batch / t_bf, 1),
        "fwd_vs_conv3d_formulation": round(t_ref / t_ours, 3),
        "device": str(jax.devices()[0]),
    }
    # the SAME run emits the bench line, the committed local artifact and
    # the README block — they can no longer disagree (VERDICT r3 #5)
    root = os.path.dirname(os.path.abspath(__file__))
    local = os.path.join(root, "runs", "bench_local.json")
    with open(local, "w") as f:
        json.dump(result, f, indent=1)
    try:
        sys.path.insert(0, os.path.join(root, "scripts"))
        import sync_readme_bench as srb
        block = srb.render(result, "runs/bench_local.json")
        import re
        rp = os.path.join(root, "README.md")
        text = open(rp).read()
        pat = re.compile(re.escape(srb.BEGIN) + r".*?" + re.escape(srb.END),
                         re.S)
        open(rp, "w").write(pat.sub(lambda m: block, text))
        log("README bench block + runs/bench_local.json regenerated")
    except Exception as e:  # pragma: no cover
        log(f"README sync skipped: {e}")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
