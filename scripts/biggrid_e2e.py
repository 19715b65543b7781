"""Big-grid end-to-end evidence (round-5 VERDICT #4): train + BER-sweep an
nfft=512 AWGN BPSK receiver with bf16 activations on the real chip, and
measure the f32-vs-bf16 step economics at the wide-tile grid where bf16 is
claimed to pay (round-4 finding: byte-neutral at nfft=64 because tiles are
narrow; `runs/RESULTS.md` bf16 section).

Grid: LTE nfft=512 (7.68 Msps, 25 RB -> frame_size 2000, sps 640;
`dev/py/ofdm.py:173-194` grid family).  Stages (resumable by artifact):

  1. train  — DCCN nbits=1, compute_dtype=bfloat16, AWGN @5 dB, 300 epochs
              (reference recipe; the Pallas synth/model kernels gate
              themselves off at this grid — this is the XLA path, which is
              exactly the path big grids use)
  2. sweep  — SNR -10..20 dB, 20k frames/point (reference single-channel
              protocol, `dev/py/ofdmreceiver_np.py:69-89`) -> runs CSV
  3. bench  — ms/step + IQ/s for f32 vs bf16 activations at two batch sizes
  4. params — committed npz (runs/arms/OFDM_Big512_1mod.npz)
  5. tpcheck — re-exec on a virtual 8-device CPU mesh: tp=2-sharded grads
              on the TRAINED params == single-device grads at nfft=512

Writes runs/p19_biggrid_e2e.json + Test_DCCN_OFDM_Big512_1mod_snr5_cpTrue_AWGN.csv
Usage: python scripts/biggrid_e2e.py [tpcheck]   (chip must be free)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(ROOT, "runs")
OUT = os.path.join(RUNS, "p19_biggrid_e2e.json")
TOKEN = "OFDM_Big512_1mod_snr5_cpTrue"
NPZ = os.path.join(RUNS, "arms", "OFDM_Big512_1mod.npz")
CSV = os.path.join(RUNS, f"Test_DCCN_{TOKEN}_AWGN.csv")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def tpcheck():
    """Virtual-mesh tp=2 gradient equivalence on the trained params."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.parallel.mesh import make_mesh
    from dl_ofdm_tpu.train.checkpoint import load_params_npz
    from dl_ofdm_tpu.train.loop import Trainer

    cfg = OFDMConfig(nbits=1, nfft=512, nfilter=512)
    tc = TrainConfig(snr=5.0, batch_size=56)
    mesh = make_mesh(jax.devices(), dp=4, tp=2)
    tr = Trainer(cfg, tc, channel="AWGN", mesh=mesh)
    params_h = load_params_npz(NPZ)
    params_tp = tr._shard_state_params(
        jax.tree.map(jnp.asarray, params_h))
    snr = jnp.full((8,), 5.0, jnp.float32)
    bits, rx, _, _, _ = jax.jit(
        lambda k: tr.synthesize(k, 8, snr))(jax.random.PRNGKey(3))

    def gfn(p, b, x):
        return jax.grad(lambda q: tr._loss_fn(q, b, x)[0])(p)

    g_tp = jax.device_get(jax.jit(gfn)(params_tp, bits, rx))
    dev0 = jax.devices()[0]
    g_1d = jax.device_get(jax.jit(gfn)(
        jax.device_put(params_h, dev0),
        jax.device_put(jax.device_get(bits), dev0),
        jax.device_put(jax.device_get(rx), dev0)))
    n = 0
    for a, b in zip(jax.tree_util.tree_leaves(g_tp),
                    jax.tree_util.tree_leaves(g_1d)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
        n += 1
    print(f"tpcheck ok: nfft=512 tp=2 grads == single-device ({n} tensors)")
    return n


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "tpcheck":
        tpcheck()
        return
    import jax
    import jax.numpy as jnp

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.train.checkpoint import (export_params_npz,
                                              load_params_npz)
    from dl_ofdm_tpu.train.loop import Trainer
    from dl_ofdm_tpu.utils.cache import enable_persistent_cache
    from dl_ofdm_tpu.utils.timing import bench_steps, measure_fence_cost

    enable_persistent_cache()
    report = json.load(open(OUT)) if os.path.isfile(OUT) else {}
    # nfilter MUST scale with the grid: the fft_like stage is the learned
    # DFT replacement, so it needs >= nfft filters to represent the
    # transform (first attempt with the nfft=64 default nfilter=64 floored
    # at BER ~0.24 — an under-parameterized 512->64 projection, not a
    # training failure; same rule as the dryrun's nfft=1024/nfilter=1024)
    cfg = OFDMConfig(nbits=1, nfft=512, nfilter=512,
                     compute_dtype="bfloat16")
    tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=300,
                     early_stop=100, token=TOKEN, save_dir=RUNS, seed=1)
    tr = Trainer(cfg, tc, channel="AWGN")
    assert tr._fused_model_spec is None   # big grid = XLA path by design

    # 1. train (bf16 activations)
    if os.path.isfile(NPZ):
        log("train: restoring committed params")
        params = jax.tree.map(jnp.asarray, load_params_npz(NPZ))
    else:
        t0 = time.time()
        state, info = tr.fit(log_fn=lambda *a: None)
        report["train"] = {"best_epoch": info["best_epoch"],
                           "best_loss": info["best_loss"],
                           "secs": round(time.time() - t0, 1),
                           "compute_dtype": "bfloat16"}
        log(f"train: best_epoch={info['best_epoch']} "
            f"loss={info['best_loss']:.5f} ({report['train']['secs']}s)")
        params = state.params
        export_params_npz(NPZ, params)
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)

    # 2. sweep (reference protocol, truncated grid — the curve saturates)
    if not os.path.isfile(CSV):
        t0 = time.time()
        res = ber_sweep(tr, params, jax.random.PRNGKey(999),
                        snrs=range(-10, 21), frames_per_point=20000,
                        batch_frames=1000, log_fn=lambda *a: None)
        res.to_csv(CSV)
        bers = {int(s): float(b) for s, b in zip(res.snr, res.ber)}
        report["sweep"] = {"ber": {str(k): bers[k] for k in (0, 5, 10)},
                           "secs": round(time.time() - t0, 1)}
        log(f"sweep: BER@0={bers[0]:.4f} @5={bers[5]:.2e} "
            f"@10={bers[10]:.2e} -> {os.path.basename(CSV)}")
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)

    # 3. step economics f32 vs bf16 at the wide grid
    if "bench" not in report:
        fence = measure_fence_cost()
        rows = {}
        for dtype in (None, "bfloat16"):
            import dataclasses as dc
            cfg_d = dc.replace(cfg, compute_dtype=dtype)
            for frames in (512, 2048):
                tr_b = Trainer(cfg_d, TrainConfig(snr=5.0, batch_size=512),
                               channel="ETU")
                tr_b.batch_frames = frames
                st = tr_b.init_state(jax.random.PRNGKey(1))
                keys = jax.random.split(jax.random.PRNGKey(2), 32)
                snr_b = jnp.full((frames,), 5.0, jnp.float32)

                def step(i, _t=tr_b, _s=st, _k=keys, _n=snr_b):
                    return _t.train_step(_s, _k[i % 32], _n)[1]["ce"]

                sec = bench_steps(step, iters=10, repeats=3,
                                  fence_cost=fence)
                dk = "f32" if dtype is None else "bf16"
                rows[f"{dk}@{frames}"] = {
                    "ms_per_step": round(sec * 1e3, 3),
                    "g_iq_per_sec": round(
                        frames * 7 * 640 / sec / 1e9, 3)}
                log(f"bench {dk}@{frames}: {sec*1e3:.2f} ms "
                    f"({rows[f'{dk}@{frames}']['g_iq_per_sec']} G IQ/s)")
        report["bench"] = rows
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)

    # 5. tp=2 equivalence on the trained params (separate process: the axon
    # backend is latched in this one)
    if "tpcheck" not in report:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "tpcheck"],
            capture_output=True, text=True, timeout=1200)
        ok = p.returncode == 0 and "tpcheck ok" in p.stdout
        report["tpcheck"] = {"ok": ok,
                             "out": (p.stdout + p.stderr).strip()[-400:]}
        log(f"tpcheck: {'ok' if ok else 'FAIL'}")
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    log("biggrid_e2e complete")


if __name__ == "__main__":
    main()
