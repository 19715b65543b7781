#!/usr/bin/env python3
"""Benchmark: IQ samples/s/chip through the DCCN receiver (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "IQ_samples_per_sec_per_chip",
   "vs_baseline": R, ...}

`value` is the throughput of this framework's MXU-native receiver forward
(learned-DFT as complex dense matmul, fused XLA program, data resident on
device).  `vs_baseline` is the speedup versus a faithful re-creation of the
reference's computation style measured in the same run on the same chip: the
fft_like layer expressed as the reference's conv3d-over-IQ-depth formulation
(`/root/reference/dev/py/complex.py:140-196`) plus the per-step host->device
feed boundary of its feed-dict training loop
(`/root/reference/dev/py/ofdmreceiver_np.py:230-234`).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from dl_ofdm_tpu.config import OFDMConfig
    from dl_ofdm_tpu.models.dccn import DCCNReceiver
    from dl_ofdm_tpu.ofdm.plan import build_plan
    from dl_ofdm_tpu.ops.norms import leaky_relu

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

    # ---- timing ------------------------------------------------------------
    def bench(fn, feed_host: bool, iters: int):
        x_host = np.asarray(x) if feed_host else None
        fn()  # warmup/compile
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    log("compiling ours...")
    ours_call = lambda: fwd(params, x)
    t_ours = bench(ours_call, False, 30)

    log("compiling reference-style...")
    x_host = np.asarray(x)

    def ref_call():
        xd = jax.device_put(x_host)       # feed-dict boundary emulation
        return ref_fwd(kernel4, dense_params, xd)

    t_ref = bench(ref_call, True, 10)

    ours = iq_per_batch / t_ours
    base = iq_per_batch / t_ref
    log(f"ours: {t_ours*1e3:.3f} ms/batch  ref-style: {t_ref*1e3:.3f} ms/batch")

    result = {
        "metric": "IQ samples/s/chip through DCCN receiver",
        "value": round(ours, 1),
        "unit": "IQ_samples_per_sec_per_chip",
        "vs_baseline": round(ours / base, 3),
        "baseline": "reference-style conv3d formulation + host feed boundary, same chip",
        "batch_frames": b,
        "ms_per_batch": round(t_ours * 1e3, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
