"""Matched-seed training control for the fused DCCN fwd+bwd kernel
(round-5 VERDICT #1: "a matched-seed BER-parity control" gates the perf
headline).

Trains the same config (BPSK/AWGN, 300 epochs, reference recipe) with the
gradient path set to (a) XLA autodiff, (b) the fused kernel with f32
matmuls, (c) the fused kernel with bf16 matmuls (f32 accumulation — the
same contract as XLA's default TPU matmul precision), two seeds each, then
sweeps BER at 0/5/10 dB (200k frames/point).  bench.py gates headline
eligibility of the fused variants on this artifact.

Writes runs/p19_fused_train_control.json (resumable per arm).
Usage: python scripts/fused_model_train_control.py   (chip must be free)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
OUT = os.path.join(RUNS, "p19_fused_train_control.json")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def run(tag, mode, seed):
    import jax

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.train.loop import Trainer

    cfg = OFDMConfig(nbits=1)
    mmd = "bfloat16" if mode == "fused_bf16" else "float32"
    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=300,
                     early_stop=100, token=f"ctl_{tag}", seed=seed,
                     save_dir="/tmp/ctl", fused_model_matmul_dtype=mmd)
    tr = Trainer(cfg, tc, channel="AWGN")
    if mode == "xla":
        tr._fused_model_spec = None
    else:
        assert tr._fused_model_spec is not None
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                    snrs=[0, 5, 10], frames_per_point=200000,
                    batch_frames=4000, log_fn=lambda *a: None)
    bers = {int(s): float(b) for s, b in zip(res.snr, res.ber)}
    log(f"{tag}: best_epoch={info['best_epoch']} "
        f"loss={info['best_loss']:.5f} ({time.time()-t0:.0f}s) "
        f"BER@0={bers[0]:.5f} BER@5={bers[5]:.6f} BER@10={bers[10]:.2e}")
    return {"bers": {str(k): v for k, v in bers.items()},
            "best_epoch": info["best_epoch"],
            "best_loss": info["best_loss"],
            "secs": round(time.time() - t0, 1)}


def main():
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    report = json.load(open(OUT)) if os.path.isfile(OUT) else {"arms": {}}
    for mode in ("xla", "fused_f32", "fused_bf16"):
        for seed in (1, 2):
            tag = f"{mode}_s{seed}"
            if tag in report["arms"]:
                log(f"skip {tag}")
                continue
            report["arms"][tag] = run(tag, mode, seed)
            with open(OUT, "w") as f:
                json.dump(report, f, indent=1)

    arms = report["arms"]

    def mean5(prefix):
        v = [a["bers"]["5"] for t, a in arms.items() if t.startswith(prefix)]
        return sum(v) / len(v) if v else None

    xla5 = mean5("xla")
    report["summary"] = {
        "mean_ber5": {p: mean5(p) for p in ("xla", "fused_f32",
                                            "fused_bf16")},
        # PASS: fused arm mean BER@5 within 25% relative of the XLA arms
        # (the p15 bf16-control tolerance; seed-to-seed spread at this
        # budget is ~10%)
        "fused_f32_verdict":
            "PASS" if mean5("fused_f32") <= xla5 * 1.25 else "FAIL",
        "fused_bf16_verdict":
            "PASS" if mean5("fused_bf16") <= xla5 * 1.25 else "FAIL",
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    log(f"summary: {report['summary']}")


if __name__ == "__main__":
    main()
