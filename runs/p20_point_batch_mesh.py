"""Demonstrate the claim-grade point_batch protocol under a dp mesh
(round-4 VERDICT weak #5) on a REAL committed arm.

The reference evaluates each BER point with one session.run over the whole
30k-frame batch (`dev/py/ofdmreceiver_np_mp.py:89`) — the normalization
window IS the protocol.  Since round 5 `ber_sweep(point_batch=True,
mesh=...)` preserves that window at any mesh width by psum'ing the batch
moments over 'dp' (`dl_ofdm_tpu/eval/sweep.py::_ber_sweep_point_batch`).
This script loads the committed QPSK joint-ZF arm from `runs/arms/` and
sweeps its EPA gate cells with the SAME protocol single-device and on an
8-device virtual CPU mesh; the two must agree statistically (exactness
against a bitwise control is `tests/test_parallel.py::
test_point_batch_sweep_under_mesh_matches_control`).

Usage:  python runs/p20_point_batch_mesh.py [--frames N]
Writes: runs/p20_point_batch_mesh.json (skips if present)
CPU-only — safe while the chip is busy.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(RUNS, "p20_point_batch_mesh.json")
ARM = "OFDM_Dense3_2mod_snr10_cpTrue_Equalizer12_mixRayleigh"


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--frames", type=int, default=6000)
    args = ap.parse_args()
    if os.path.isfile(OUT):
        print(f"{OUT} exists — skip")
        return

    # virtual 8-device CPU mesh (XLA_FLAGS is read at CPU-backend init,
    # after the sitecustomize jax import — same pattern as __graft_entry__)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.parallel.mesh import make_mesh
    from dl_ofdm_tpu.train.checkpoint import load_params_npz
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

    base_params = load_params_npz(
        os.path.join(RUNS, "arms", "OFDM_Dense3_2mod_snr10_cpTrue.npz"))
    params = load_params_npz(os.path.join(RUNS, "arms", ARM + ".npz"))
    cfg = OFDMConfig(nbits=2)
    tc = TrainConfig(snr=10.0, batch_size=512, token=ARM, save_dir=RUNS,
                     opt=12)
    eq = EqualizerTrainer(cfg, tc, channel="EPA", mobile=False,
                          pretrained_rx=base_params)
    mesh = make_mesh(jax.devices()[:8], dp=8, tp=1)

    report = {"arm": ARM, "channel": "EPA", "frames": args.frames,
              "protocol": "point_batch", "mesh": "dp=8 virtual CPU"}
    for label, m in (("single_device", None), ("mesh_dp8", mesh)):
        t0 = time.time()
        res = ber_sweep(eq, params, jax.random.PRNGKey(1919),
                        snrs=(20, 30), frames_per_point=args.frames,
                        batch_frames=min(args.frames, 3000),
                        log_fn=lambda *a: None, point_batch=True, mesh=m)
        report[label] = {int(s): float(b)
                         for s, b in zip(res.snr, res.ber)}
        print(f"[{time.strftime('%H:%M:%S')}] {label}: {report[label]} "
              f"({time.time() - t0:.1f}s)", flush=True)
    report["ratio_mesh_over_single"] = {
        k: (report["mesh_dp8"][k] / report["single_device"][k]
            if report["single_device"][k] else None)
        for k in report["single_device"]}
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
