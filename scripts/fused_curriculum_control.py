"""Matched-seed control + throughput delta for the fused-curriculum
auto-enable (round-5 VERDICT #6).

The fused Pallas data plane was exonerated in round 4
(runs/p15_doppler_rootcause.json) but stayed default-off; the default is
now auto-on above FUSED_CURRICULUM_MIN_FRAMES frames/step
(train/equalizer_loop.py).  This script reruns a STATIC mixRayleigh equalizer arm
at a batch above the threshold on BOTH planes (fused vs jnp), two seeds
each (matched), compares tail validation BER, and measures the
steady-state curriculum step time on each plane.  (The MOBILE fused
variant is excluded: its mixRayleigh + in-kernel-H Mosaic compile is
deterministically SIGKILLed by this image's AOT compile helper — 787 KB
MLIR, reproduced 2/2, runs/experiments19.log — so mobile curricula keep
the jnp chain regardless of batch and the auto-enable is static-only.)

Writes runs/p19_fused_curriculum.json (resumable per arm).
Usage: python scripts/fused_curriculum_control.py   (chip must be free)

OUTCOME (p19b): never completed on this image — the STATIC fused
curriculum compile is ALSO SIGKILLed by the AOT helper (651 KB MLIR), at
every probed batch down to 512 frames/step
(scripts/fused_curriculum_compile_probe.py ->
runs/p19_fused_compile_probe.json).  `fused_curriculum` therefore
defaults OFF at every batch and stays an explicit opt-in; this control
remains runnable on an image whose toolchain can compile the variant.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
OUT = os.path.join(RUNS, "p19_fused_curriculum.json")

EPOCHS = 120
BATCH_SYMBOLS = 14336          # 2048 frames/step — above the threshold


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def _mk(seed, fused):
    import jax

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
    from dl_ofdm_tpu.train.loop import Trainer

    cfg = OFDMConfig(nbits=1)
    tc_base = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=120,
                          early_stop=60, token="p19fc_base",
                          save_dir="/tmp/p19fc", seed=seed)
    base = Trainer(cfg, tc_base, channel="AWGN")
    bstate, _ = base.fit(log_fn=lambda *a: None)
    tc = TrainConfig(snr=5.0, batch_size=BATCH_SYMBOLS,
                     max_epoch_num=EPOCHS, early_stop=EPOCHS,
                     token=f"p19fc_{fused}_{seed}", save_dir="/tmp/p19fc",
                     seed=seed, opt=12)
    eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=False,
                          pretrained_rx=bstate.params, freeze_rx=False)
    eq.fused_curriculum = fused
    return eq


def arm(tag, seed, fused):
    eq = _mk(seed, fused)
    assert eq.fused_curriculum == fused
    t0 = time.time()
    state, info = eq.fit(log_fn=lambda *a: None)
    hist = info["history"]
    tail = [h["val_ber"] for h in hist[-10:]]
    out = {"fused": fused, "seed": seed, "epochs": len(hist),
           "tail_mean_val_ber": sum(tail) / len(tail),
           "best_loss": info["best_loss"],
           "secs": round(time.time() - t0, 1)}
    log(f"{tag}: tail_val_ber={out['tail_mean_val_ber']:.5f} "
        f"({out['secs']}s)")
    return out


def throughput():
    import jax
    import jax.numpy as jnp

    from dl_ofdm_tpu.utils.timing import bench_steps, measure_fence_cost
    fence = measure_fence_cost()
    rows = {}
    for fused in (True, False):
        eq = _mk(1, fused)
        st = eq.init_state(jax.random.PRNGKey(0))
        keys = jax.random.split(jax.random.PRNGKey(5), 32)

        def step(i, _e=eq, _s=st, _k=keys):
            return _e.train_step_curriculum(_s, _k[i % 32])[1]["ce"]

        sec = bench_steps(step, iters=10, repeats=3, fence_cost=fence)
        rows["fused" if fused else "jnp"] = round(sec * 1e3, 3)
        log(f"curriculum step ({'fused' if fused else 'jnp'}): "
            f"{sec*1e3:.2f} ms @ {eq.batch_frames} frames")
    rows["speedup"] = round(rows["jnp"] / rows["fused"], 3)
    return rows


def main():
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    report = json.load(open(OUT)) if os.path.isfile(OUT) else {
        "batch_frames": BATCH_SYMBOLS // 7, "arms": {}}
    if "throughput" not in report:
        report["throughput"] = throughput()
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    for fused in (True, False):
        for seed in (1, 2):
            tag = f"{'fused' if fused else 'jnp'}_s{seed}"
            if tag in report["arms"]:
                log(f"skip {tag}")
                continue
            report["arms"][tag] = arm(tag, seed, fused)
            with open(OUT, "w") as f:
                json.dump(report, f, indent=1)

    arms = report["arms"]

    def mean(pfx):
        v = [a["tail_mean_val_ber"] for t, a in arms.items()
             if t.startswith(pfx)]
        return sum(v) / len(v) if v else None

    mf, mj = mean("fused"), mean("jnp")
    report["summary"] = {
        "mean_tail_val_ber": {"fused": mf, "jnp": mj},
        # same tolerance band as the round-4 root-cause control: the
        # 2-seed spread at this budget is the dominant term
        "verdict": "PASS" if mf <= mj * 1.5 else "FAIL",
        "throughput": report["throughput"],
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    log(f"summary: {report['summary']}")


if __name__ == "__main__":
    main()
