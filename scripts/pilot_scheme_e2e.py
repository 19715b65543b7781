"""Non-LTE pilot schemes exercised end-to-end (round-5 VERDICT #7).

The scattered/block/comb subcarrier plans (`dev/py/ofdm.py:198-273`) were
built and unit-tested but no trained model ever used them — capability
parity was compile-level only.  This script trains a DCCN BPSK/AWGN
receiver on the 'scattered' plan and one on the 'block' plan (reference
recipe, 300 epochs) and sweeps each over the single-channel protocol
(-10..20 dB, 20k frames/point), committing the curves as
Test_DCCN_OFDM_Scattered_1mod_snr5_cpTrue_AWGN.csv (and _Block_).

Writes runs/p19_pilot_scheme.json (resumable per scheme).
Usage: python scripts/pilot_scheme_e2e.py    (chip must be free)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
OUT = os.path.join(RUNS, "p19_pilot_scheme.json")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def run(scheme: str):
    import jax
    import jax.numpy as jnp

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.train.loop import Trainer

    token = f"OFDM_{scheme.capitalize()}_1mod_snr5_cpTrue"
    csv = os.path.join(RUNS, f"Test_DCCN_{token}_AWGN.csv")
    cfg = OFDMConfig(nbits=1, pilot=scheme)
    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=300,
                     early_stop=100, token=token, save_dir=RUNS, seed=1)
    tr = Trainer(cfg, tc, channel="AWGN")
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                    snrs=range(-10, 21), frames_per_point=20000,
                    batch_frames=2000, log_fn=lambda *a: None)
    res.to_csv(csv)
    bers = {int(s): float(b) for s, b in zip(res.snr, res.ber)}
    log(f"{scheme}: best_epoch={info['best_epoch']} "
        f"loss={info['best_loss']:.5f} ({time.time()-t0:.0f}s) "
        f"BER@0={bers[0]:.4f} @5={bers[5]:.2e} @10={bers[10]:.2e}")
    return {"token": token, "csv": os.path.basename(csv),
            "frame_size": tr.plan.frame_size,
            "best_epoch": info["best_epoch"],
            "best_loss": info["best_loss"],
            "ber": {str(k): bers[k] for k in (0, 5, 10)},
            "secs": round(time.time() - t0, 1)}


def main():
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    report = json.load(open(OUT)) if os.path.isfile(OUT) else {}
    for scheme in ("scattered", "block"):
        if scheme in report:
            log(f"skip {scheme}")
            continue
        report[scheme] = run(scheme)
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    log("pilot_scheme_e2e complete")


if __name__ == "__main__":
    main()
