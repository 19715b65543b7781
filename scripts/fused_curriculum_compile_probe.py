"""Probe: at which batch does the fused-curriculum Mosaic compile survive
this image's AOT helper?

The p19b static control died at 2048 frames/step with the same
`tpu_compile_helper subprocess exit signal SIGKILL (9)` that killed the
mobile variant (651 KB vs 787 KB MLIR).  This probes ONE
`train_step_curriculum` compile per batch size (untrained params — only
the compile matters) on the static mixRayleigh fused plane and records
ok/SIGKILL per batch, so the auto-enable threshold can be set from
measurement instead of assumption.

Writes runs/p19_fused_compile_probe.json.  Chip must be free.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
OUT = os.path.join(RUNS, "p19_fused_compile_probe.json")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
    from dl_ofdm_tpu.train.loop import Trainer

    report = json.load(open(OUT)) if os.path.isfile(OUT) else {}
    cfg = OFDMConfig(nbits=1)
    tc_base = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=1,
                          token="p19fcp_base", save_dir="/tmp/p19fcp")
    base = Trainer(cfg, tc_base, channel="AWGN")
    bparams = base.init_state(jax.random.PRNGKey(0)).params

    for frames in (512, 1024, 2048):
        tag = str(frames)
        if tag in report:
            log(f"skip {tag}")
            continue
        tc = TrainConfig(snr=5.0, batch_size=frames * 7, max_epoch_num=1,
                         token=f"p19fcp_{frames}", save_dir="/tmp/p19fcp",
                         opt=12)
        eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=False,
                              pretrained_rx=bparams, freeze_rx=False)
        eq.fused_curriculum = True
        st = eq.init_state(jax.random.PRNGKey(1))
        t0 = time.time()
        try:
            out = eq.train_step_curriculum(st, jax.random.PRNGKey(2))
            ce = float(out[1]["ce"])
            report[tag] = {"ok": True, "ce": ce,
                           "compile_s": round(time.time() - t0, 1)}
            log(f"frames={frames}: compile OK ({report[tag]['compile_s']}s)")
        except Exception as e:  # JaxRuntimeError on helper SIGKILL
            report[tag] = {"ok": False, "error": str(e)[:300],
                           "secs": round(time.time() - t0, 1)}
            log(f"frames={frames}: FAIL {str(e)[:120]}")
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    log(f"done: { {k: v['ok'] for k, v in report.items()} }")


if __name__ == "__main__":
    main()
